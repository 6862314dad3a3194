"""Batched policy-sweep tests (BASELINE configs #2/#5) on the CPU mesh."""

import jax
import numpy as np
import pytest

from deep_active_inference_mc_tpu.config import Config
from deep_active_inference_mc_tpu.envs import raster
from deep_active_inference_mc_tpu.infer.agent import ActiveInferenceAgent
from deep_active_inference_mc_tpu.parallel import mesh as mesh_lib
from deep_active_inference_mc_tpu.plan.mcts import MCTSParams
from deep_active_inference_mc_tpu.train import sweep as sweep_lib


@pytest.fixture(scope="module")
def cfg():
    return Config()


@pytest.fixture(scope="module")
def agent(cfg):
    return ActiveInferenceAgent(s_dim=cfg.s_dim, pi_dim=cfg.pi_dim)


@pytest.fixture(scope="module")
def params(agent):
    return agent.init(jax.random.key(0))


@pytest.fixture(scope="module")
def lut():
    return raster.build_sprite_lut()


def test_expert_beats_random(cfg, agent, params, lut):
    out_rand = sweep_lib.run_sweep(
        agent, cfg, params, lut, jax.random.key(1), n_envs=128,
        method="random", n_macro_steps=60, jumps=5,
    )
    out_exp = sweep_lib.run_sweep(
        agent, cfg, params, lut, jax.random.key(1), n_envs=128,
        method="expert", n_macro_steps=60, jumps=5,
    )
    assert float(out_exp["score_mean"]) > float(out_rand["score_mean"]) + 0.5
    assert float(out_exp["score_mean"]) > 1.0
    assert int(out_exp["scoring_events"]) > int(out_rand["scoring_events"])


def test_model_methods_run(cfg, agent, params, lut):
    for method in ("ai", "habit"):
        out = sweep_lib.run_sweep(
            agent, cfg, params, lut, jax.random.key(2), n_envs=16,
            method=method, n_macro_steps=4, jumps=2, samples=1,
        )
        assert np.isfinite(float(out["score_mean"])), method
        assert out["scores"].shape == (16,)


def test_mcts_method_runs(cfg, agent, params, lut):
    out = sweep_lib.run_sweep(
        agent, cfg, params, lut, jax.random.key(3), n_envs=4,
        method="mcts", n_macro_steps=2, jumps=2,
        mcts_params=MCTSParams(repeats=3, simulation_depth=2, max_depth=8),
    )
    assert np.isfinite(float(out["score_mean"]))


def test_sweep_on_mesh(cfg, agent, params, lut):
    mesh = mesh_lib.make_mesh(8)
    out = sweep_lib.run_sweep(
        agent, cfg, params, lut, jax.random.key(4), n_envs=32,
        mesh=mesh, method="habit", n_macro_steps=3, jumps=2,
    )
    assert np.isfinite(float(out["score_mean"]))
