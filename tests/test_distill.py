"""MCTS-visit distillation tests (train/distill.py).

The distiller is the round-4 teacher upgrade: collect planner root-visit
distributions with a jitted MCTS fleet, then train the habit net on the
reference's F_top contract (torchloss.py:18-26) with the visit targets in
place of the softmax(-G) generator prior.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deep_active_inference_mc_tpu.config import Config
from deep_active_inference_mc_tpu.envs import raster
from deep_active_inference_mc_tpu.infer.agent import ActiveInferenceAgent
from deep_active_inference_mc_tpu.train import loop as train_loop
from deep_active_inference_mc_tpu.train.distill import Distiller, visit_targets


@pytest.fixture(scope="module")
def cfg():
    return Config(
        batch=4,
        distill_every=1,
        distill_envs=4,
        distill_macro=3,
        distill_repeats=6,
        distill_expand_k=2,
        distill_batch=8,
        distill_passes=2,
    )


@pytest.fixture(scope="module")
def agent(cfg):
    return ActiveInferenceAgent(s_dim=cfg.s_dim, pi_dim=cfg.pi_dim)


@pytest.fixture(scope="module")
def lut():
    return raster.build_sprite_lut()


def test_visit_targets_normalize_and_temper():
    N = jnp.asarray([[10.0, 5.0, 3.0, 2.0], [1.0, 1.0, 1.0, 1.0]])
    t = visit_targets(N)
    np.testing.assert_allclose(np.asarray(t.sum(-1)), 1.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(t[0, 0]), 0.5, rtol=1e-6)
    # Sharpening: temp < 1 increases the max probability.
    sharp = visit_targets(N, temp=0.5)
    assert float(sharp[0, 0]) > float(t[0, 0])
    # Flattening: temp > 1 decreases it.
    flat = visit_targets(N, temp=2.0)
    assert float(flat[0, 0]) < float(t[0, 0])


@pytest.mark.slow
def test_distill_phase_updates_only_top(cfg, agent, lut):
    """One phase: runs end to end, changes top params, leaves mid/down and
    their optimizer states untouched, and reports finite metrics."""
    state = train_loop.create_train_state(cfg, agent, jax.random.key(0))
    distiller = Distiller(
        agent, cfg, lut, train_loop.make_optimizers(cfg)["top"]
    )
    new_state, metrics = distiller(state, jax.random.key(1))

    # mid/down untouched (bitwise), top changed.
    for layer in ("mid", "down"):
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)
            ),
            state.params[layer],
            new_state.params[layer],
        )
    top_deltas = jax.tree.leaves(
        jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()),
            state.params["top"],
            new_state.params["top"],
        )
    )
    assert max(top_deltas) > 0.0

    expected_steps = cfg.distill_passes * (
        cfg.distill_envs * cfg.distill_macro // cfg.distill_batch
    )
    assert metrics["distill_steps"] == expected_steps
    for k in ("distill_kl_first", "distill_kl_last",
              "distill_match_first", "distill_match_last",
              "distill_target_entropy"):
        assert np.isfinite(metrics[k]), k
    # Visit targets over 4 actions: entropy within [0, log 4].
    assert 0.0 <= metrics["distill_target_entropy"] <= np.log(4.0) + 1e-6


@pytest.mark.slow
def test_distill_converges_toward_targets(cfg, agent, lut):
    """Many passes over one small recorded set must drive F_top (the KL to
    the visit targets) down — distillation actually trains."""
    heavy = Config(**{
        **cfg.__dict__,
        "distill_passes": 30,
        "l_rate_top": 3e-3,
    })
    state = train_loop.create_train_state(heavy, agent, jax.random.key(2))
    distiller = Distiller(
        agent, heavy, lut, train_loop.make_optimizers(heavy)["top"]
    )
    _, metrics = distiller(state, jax.random.key(3))
    assert metrics["distill_kl_last"] < metrics["distill_kl_first"]
