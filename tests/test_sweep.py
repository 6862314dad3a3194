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


@pytest.mark.slow
def test_mcts_method_runs(cfg, agent, params, lut):
    out = sweep_lib.run_sweep(
        agent, cfg, params, lut, jax.random.key(3), n_envs=4,
        method="mcts", n_macro_steps=2, jumps=2,
        mcts_params=MCTSParams(repeats=3, simulation_depth=2, max_depth=8),
    )
    assert np.isfinite(float(out["score_mean"]))


@pytest.mark.slow
def test_sweep_on_mesh(cfg, agent, params, lut):
    mesh = mesh_lib.make_mesh(8)
    out = sweep_lib.run_sweep(
        agent, cfg, params, lut, jax.random.key(4), n_envs=32,
        mesh=mesh, method="habit", n_macro_steps=3, jumps=2,
    )
    assert np.isfinite(float(out["score_mean"]))


@pytest.mark.slow
def test_env_chunked_sweep_matches_stats(cfg, agent, params, lut, monkeypatch):
    """env_chunk groups are exact (envs are independent): the merged stats
    must be self-consistent and the initial env population identical to the
    unchunked run at the same key (paired eval guarantee)."""
    from deep_active_inference_mc_tpu.envs import dsprites as env_lib

    # Capture the initial env of every chunk dispatch to verify pairing by
    # CONTENT, not shape (ADVICE r3 #1).
    captured = []
    orig = sweep_lib._run_macro_chunks

    def spy(sweeps, params_, k_run, env, lengths):
        captured.append(jax.device_get(env.latents))
        return orig(sweeps, params_, k_run, env, lengths)

    monkeypatch.setattr(sweep_lib, "_run_macro_chunks", spy)

    key = jax.random.key(7)
    out = sweep_lib.run_sweep(
        agent, cfg, params, lut, key, n_envs=32, method="expert",
        n_macro_steps=10, jumps=5, env_chunk=8,
    )
    scores = np.asarray(out["scores"])
    assert scores.shape == (32,)
    assert np.isclose(float(out["score_mean"]), scores.mean(), atol=1e-6)
    assert np.isclose(float(out["score_sem"]),
                      scores.std() / np.sqrt(32), atol=1e-6)
    # Expert scores regardless of chunking.
    assert float(out["score_mean"]) > 0.1
    assert int(out["scoring_events"]) >= (
        int(out["events_sq"]) + int(out["events_other"])) - 1
    # Paired eval guarantee: the concatenated chunk-initial latents ARE the
    # unchunked run's initial population at the same key.
    k_env, _ = jax.random.split(key)
    env0 = env_lib.randomize(k_env, env_lib.reset(k_env, 32))
    assert len(captured) == 4
    np.testing.assert_array_equal(
        np.concatenate(captured, axis=0), np.asarray(env0.latents)
    )


def test_env_chunk_must_be_positive(cfg, agent, params, lut):
    with pytest.raises(ValueError, match="positive"):
        sweep_lib.run_sweep(
            agent, cfg, params, lut, jax.random.key(8), n_envs=8,
            method="random", n_macro_steps=2, env_chunk=-1,
        )


def test_env_chunk_must_divide(cfg, agent, params, lut):
    with pytest.raises(ValueError, match="env_chunk"):
        sweep_lib.run_sweep(
            agent, cfg, params, lut, jax.random.key(8), n_envs=10,
            method="random", n_macro_steps=2, env_chunk=4,
        )


def test_score_trajectory_recording(cfg, agent, params, lut):
    """record_traj: per-macro-step fleet-mean score series — monotone x-grid
    for the reference-recording comparison (scripts/score_vs_reference.py).
    Chunked dispatches concatenate to the full length and the final
    trajectory point equals the final score_mean."""
    out = sweep_lib.run_sweep(
        agent, cfg, params, lut, jax.random.key(5), n_envs=32,
        method="random", n_macro_steps=12, chunk=5, jumps=5,
        record_traj=True,
    )
    traj = np.asarray(out["score_traj"])
    assert traj.shape == (12,)
    np.testing.assert_allclose(traj[-1], float(out["score_mean"]), rtol=1e-5)

    # env_chunk merge: group-mean trajectory, same length.
    out2 = sweep_lib.run_sweep(
        agent, cfg, params, lut, jax.random.key(5), n_envs=32,
        method="random", n_macro_steps=12, chunk=5, jumps=5,
        record_traj=True, env_chunk=16,
    )
    traj2 = np.asarray(out2["score_traj"])
    assert traj2.shape == (12,)
    np.testing.assert_allclose(traj2[-1], float(out2["score_mean"]), rtol=1e-5)
