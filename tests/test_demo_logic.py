"""Demo state-machine tests (UI-independent Demo class, apps/demo.py)."""

import argparse

import jax
import numpy as np
import pytest

from deep_active_inference_mc_tpu.apps.demo import Demo, make_mask
from deep_active_inference_mc_tpu.config import Config
from deep_active_inference_mc_tpu.infer.agent import ActiveInferenceAgent


def demo_args(**over):
    base = dict(
        network="", mean=False, duration=100, method="habit", steps=2,
        temperature=1.0, jumps=2, C=1.0, repeats=3, threshold=0.5, depth=2,
        no_habit=False, headless=0, seed=0,
    )
    base.update(over)
    return argparse.Namespace(**base)


@pytest.fixture(scope="module")
def demo():
    cfg = Config()
    agent = ActiveInferenceAgent(s_dim=cfg.s_dim, pi_dim=cfg.pi_dim)
    params = agent.init(jax.random.key(0))
    return Demo(agent, params, cfg, demo_args())


def test_make_mask_matches_reference_turtle():
    """make_mask replicates test_demo.py:87-113 turtle arithmetic."""
    mask = make_mask([[0, 2]], pos_x=10, pos_y=5, jumps=2)
    # up: rows 11,12 at col 5; left: cols 6,7 at row 12.
    assert mask[11, 5] > 0 and mask[12, 5] > 0
    assert mask[12, 6] > 0 and mask[12, 7] > 0
    assert mask.max() == 1.0  # normalized
    # Empty paths -> zero mask, no NaN.
    z = make_mask([], 0, 0, 1)
    assert z.max() == 0.0


def test_habit_tick_fills_and_consumes_queue(demo):
    demo.method = "habit"
    demo.t = 1  # avoid the round boundary
    demo.executing_steps = []
    demo.tick()
    # habit enqueues `steps` actions and consumes one per tick.
    assert len(demo.executing_steps) in (demo.steps - 1, 0)


def test_manual_mode_and_keys(demo):
    demo.method = "no"
    demo.executing_steps = []
    y0 = int(demo.env.latents[0, 5])
    demo.on_key("s")  # up
    assert int(demo.env.latents[0, 5]) in (y0 + 1, 0, y0)  # up or respawn
    demo.on_key("2")
    assert demo.method == "ai"
    demo.on_key("3")
    assert demo.method == "habit"
    demo.on_key("p")
    assert demo.steps == 3
    demo.on_key("o")
    assert demo.steps == 2
    demo.on_key("9")
    assert demo.temperature == 6.0
    demo.on_key("8")
    assert demo.temperature == 1.0
    demo.on_key("r")
    assert demo.score == 0.0 and demo.t == 0


def test_frame_overlay(demo):
    f = demo.frame()
    assert f.shape == (64, 64)
    assert f[59, 31] == 1.0  # center marker
