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


@pytest.mark.slow
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


@pytest.mark.slow
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


# ---------------------------------------------------------------------------
# Reference plan-queue protocol (test_demo.py:161-204): the whole plan is
# enqueued, one entry (= jumps primitive repeats) executes per macro step,
# and a scoring event flushes the queue.
# ---------------------------------------------------------------------------


def test_plan_queue_executes_full_plan(cfg, agent, params, lut, monkeypatch):
    """Oracle test: stub the planner with a fixed 3-action plan and verify
    the executed env trajectory matches hand-stepped queue semantics,
    including flush-on-score."""
    import jax.numpy as jnp

    from deep_active_inference_mc_tpu.envs import dsprites as env_lib

    B, macros, jumps = 8, 7, 2
    plan_actions = [3, 3, 0]  # right, right, up (agent action space)

    def fake_plan(agent_, params_, key, o, *a, **kw):
        path = jnp.full((o.shape[0], 5), -1, jnp.int32)
        for i, act in enumerate(plan_actions):
            path = path.at[:, i].set(act)
        return path, jnp.full((o.shape[0],), len(plan_actions), jnp.int32)

    monkeypatch.setattr(sweep_lib, "_controller_plan", fake_plan)
    sw = sweep_lib.make_sweep(
        agent, cfg, lut, method="mcts", n_macro_steps=macros, jumps=jumps,
        mcts_params=MCTSParams(repeats=2, simulation_depth=1, max_depth=5),
        plan_queue=True,
    )
    key = jax.random.key(7)
    k_env, k_run = jax.random.split(key)
    env0 = env_lib.randomize(k_env, env_lib.reset(k_env, B))
    out = sw(params, k_run, env0)

    # Oracle: replay the same macro keys through explicit queue semantics.
    env = env0.replace(score=jnp.zeros_like(env0.score))
    qpos = np.zeros(B, np.int32)
    for k in jax.random.split(k_run, macros):
        _, k_step = jax.random.split(k)
        a = np.array([plan_actions[p] for p in qpos], np.int32)
        qpos += 1
        env, scored = env_lib.step_repeated(
            k_step, env, env_lib.to_env_actions(jnp.asarray(a), agent.pi_dim),
            repeats=jumps,
        )
        qpos = np.where(np.asarray(scored), 0, qpos % len(plan_actions))
    np.testing.assert_array_equal(
        np.asarray(out["env"].latents), np.asarray(env.latents)
    )
    np.testing.assert_allclose(
        np.asarray(out["env"].score), np.asarray(env.score), rtol=1e-6
    )
    # Queue invariants on the returned carry state.
    q, qlen, qp = out["qstate"]
    assert ((np.asarray(qp) >= 0) & (np.asarray(qp) <= np.asarray(qlen))).all()
    assert (np.asarray(qlen) == len(plan_actions)).all()


@pytest.mark.slow
def test_plan_queue_ai_repeats_action(cfg, agent, params, lut):
    """ai+queue with steps=s commits to each sampled action for s macro
    steps (the reference enqueues it steps x jumps primitives) — the sweep
    must run and leave a consistent queue carry."""
    out = sweep_lib.run_sweep(
        agent, cfg, params, lut, jax.random.key(5), n_envs=16,
        method="ai", n_macro_steps=6, chunk=3, jumps=2, steps=2,
        plan_queue=True,
    )
    assert np.isfinite(float(out["score_mean"]))
    q, qlen, qp = out["qstate"]
    assert q.shape == (16, 2)
    assert (np.asarray(qlen) == 2).all()


@pytest.mark.slow
def test_plan_queue_bucketed_runs(cfg, agent, params, lut):
    out = sweep_lib.run_sweep_bucketed(
        agent, cfg, params, lut, jax.random.key(6), n_envs=16,
        n_macro_steps=4, jumps=2,
        mcts_params=MCTSParams(repeats=3, simulation_depth=1, max_depth=8),
        check_every=2, min_bucket=8, plan_queue=True,
    )
    assert np.isfinite(float(out["score_mean"]))
    assert out["scores"].shape == (16,)


@pytest.mark.slow
def test_plan_queue_cap_bounds_commitment(cfg, agent, params, lut, monkeypatch):
    """queue_cap=1 must reduce the queue protocol to per-macro re-planning:
    identical trajectory to plan_queue=False under the same keys."""
    import jax.numpy as jnp

    from deep_active_inference_mc_tpu.envs import dsprites as env_lib

    B = 8
    mp = MCTSParams(repeats=2, simulation_depth=1, max_depth=5)

    def fake_plan(agent_, params_, key, o, *a, **kw):
        # Plan depends on the key so per-macro re-planning is observable.
        a0 = jax.random.randint(key, (o.shape[0],), 0, 4)
        path = jnp.stack([a0, (a0 + 1) % 4, (a0 + 2) % 4], axis=1)
        return path.astype(jnp.int32), jnp.full((o.shape[0],), 3, jnp.int32)

    def fake_actions(agent_, params_, key, o, env, *a, **kw):
        a0 = jax.random.randint(key, (o.shape[0],), 0, 4)
        return a0

    monkeypatch.setattr(sweep_lib, "_controller_plan", fake_plan)
    monkeypatch.setattr(sweep_lib, "_controller_actions", fake_actions)
    kw = dict(method="mcts", n_macro_steps=6, jumps=2, mcts_params=mp)
    sw_cap = sweep_lib.make_sweep(agent, cfg, lut, plan_queue=True,
                                  queue_cap=1, **kw)
    sw_plain = sweep_lib.make_sweep(agent, cfg, lut, plan_queue=False, **kw)
    key = jax.random.key(11)
    k_env, k_run = jax.random.split(key)
    env0 = env_lib.randomize(k_env, env_lib.reset(k_env, B))
    out_cap = sw_cap(params, k_run, env0)
    out_plain = sw_plain(params, k_run, env0)
    np.testing.assert_array_equal(
        np.asarray(out_cap["env"].latents), np.asarray(out_plain["env"].latents)
    )
    q, qlen, qp = out_cap["qstate"]
    assert q.shape == (B, 1)
    assert (np.asarray(qlen) == 1).all()
