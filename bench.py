"""Benchmark harness — the two BASELINE.json north-star metrics on one chip.

  1. batched env steps/sec (step + render, thousands of parallel envs)
  2. EFE MC rollouts/sec (one rollout = one single-step G estimate for one
     (state, action) pair, training configuration samples=1)

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} with the
headline metric (env steps/sec, vs the 1e5/chip target) plus secondary keys.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

from deep_active_inference_mc_tpu.envs import dsprites as env_lib
from deep_active_inference_mc_tpu.envs import raster
from deep_active_inference_mc_tpu.infer import efe
from deep_active_inference_mc_tpu.infer.agent import ActiveInferenceAgent

ENV_BATCH = 4096
ENV_ITERS = 256
EFE_BATCH = 1024
EFE_ITERS = 8

TARGET_ENV_STEPS = 1.0e5
TARGET_EFE_ROLLOUTS = 1.0e4


def bench_env_steps(lut):
    """step+render for ENV_BATCH envs, ENV_ITERS sequential steps."""
    state = env_lib.reset(jax.random.key(0), ENV_BATCH)

    @jax.jit
    def run(state, key):
        def body(carry, k):
            st = carry
            a = jax.random.randint(k, (ENV_BATCH,), 0, 4)
            st, _ = env_lib.step(k, st, a)
            o = env_lib.render(lut, st)
            return st, jnp.sum(o[:, 0, 0, 0])

        state, checks = jax.lax.scan(
            body, state, jax.random.split(key, ENV_ITERS)
        )
        return state, checks.sum()

    # warmup/compile
    state, chk = run(state, jax.random.key(1))
    jax.block_until_ready(chk)
    t0 = time.perf_counter()
    reps = 3
    for i in range(reps):
        state, chk = run(state, jax.random.key(2 + i))
    jax.block_until_ready(chk)
    dt = time.perf_counter() - t0
    return ENV_BATCH * ENV_ITERS * reps / dt


def bench_efe_rollouts(agent, params, lut):
    """Single-step G for EFE_BATCH states x 4 actions (training config:
    calc_mean=True, samples=1) — one rollout per (state, action) pair."""
    state = env_lib.reset(jax.random.key(0), EFE_BATCH)
    o = env_lib.render(lut, state)

    @jax.jit
    def run(key, o):
        def body(_, k):
            G, _, _ = efe.calculate_G_4_repeated(
                agent, params, k, o, steps=1, calc_mean=True, samples=1
            )
            return None, jnp.sum(G)

        _, out = jax.lax.scan(body, None, jax.random.split(key, EFE_ITERS))
        return out.sum()

    chk = run(jax.random.key(1), o)
    jax.block_until_ready(chk)
    t0 = time.perf_counter()
    reps = 3
    for i in range(reps):
        chk = run(jax.random.key(2 + i), o)
    jax.block_until_ready(chk)
    dt = time.perf_counter() - t0
    return EFE_BATCH * 4 * EFE_ITERS * reps / dt


def bench_mcts_plans(agent, params, lut):
    """Batched array-MCTS planning throughput: full 50-expansion searches
    with depth-3 habit simulations, 256 envs planning simultaneously."""
    from deep_active_inference_mc_tpu.plan import mcts as mcts_lib

    B = 256
    state = env_lib.reset(jax.random.key(0), B)
    o = env_lib.render(lut, state)
    p = mcts_lib.MCTSParams(repeats=50, simulation_depth=3, max_depth=16)
    planner = mcts_lib.make_jit_planner(agent, p)

    res = planner(params, jax.random.key(1), o)
    jax.block_until_ready(res.actions)
    t0 = time.perf_counter()
    reps = 3
    for i in range(reps):
        res = planner(params, jax.random.key(2 + i), o)
    jax.block_until_ready(res.actions)
    dt = time.perf_counter() - t0
    return B * reps / dt


def bench_train_round(lut):
    """The fused act->plan->step->train round (data gen + 3 staged Adam
    updates) at the flagship batch — env steps/sec INSIDE training."""
    from deep_active_inference_mc_tpu.config import Config
    from deep_active_inference_mc_tpu.train import loop as train_loop

    cfg = Config(batch=512)
    agent = ActiveInferenceAgent(s_dim=cfg.s_dim, pi_dim=cfg.pi_dim)
    state = train_loop.create_train_state(cfg, agent, jax.random.key(0))
    rounds = 16
    epoch_fn = train_loop.make_jit_epoch(agent, cfg, lut, rounds)

    state, metrics = epoch_fn(state, jax.random.key(1))
    jax.block_until_ready(metrics["F_down"])
    t0 = time.perf_counter()
    reps = 3
    for i in range(reps):
        state, metrics = epoch_fn(state, jax.random.key(2 + i))
    jax.block_until_ready(metrics["F_down"])
    dt = time.perf_counter() - t0
    return cfg.batch * cfg.repeats * rounds * reps / dt


def main():
    from deep_active_inference_mc_tpu.utils import compcache

    compcache.enable_persistent_cache()
    lut = raster.build_sprite_lut()
    agent = ActiveInferenceAgent(s_dim=10, pi_dim=4)
    params = agent.init(jax.random.key(0))

    env_sps = bench_env_steps(lut)
    efe_rps = bench_efe_rollouts(agent, params, lut)
    mcts_pps = bench_mcts_plans(agent, params, lut)
    train_sps = bench_train_round(lut)

    print(
        f"env_steps/s: {env_sps:.3e} (target {TARGET_ENV_STEPS:.0e}), "
        f"efe_rollouts/s: {efe_rps:.3e} (target {TARGET_EFE_ROLLOUTS:.0e}), "
        f"mcts_plans/s: {mcts_pps:.3e} (50 expansions, depth-3 sims), "
        f"train_env_steps/s: {train_sps:.3e} (batch-512 fused round)",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "env_steps_per_sec",
                "value": env_sps,
                "unit": "steps/s",
                "vs_baseline": env_sps / TARGET_ENV_STEPS,
                "efe_rollouts_per_sec": efe_rps,
                "efe_vs_baseline": efe_rps / TARGET_EFE_ROLLOUTS,
                "mcts_plans_per_sec": mcts_pps,
                "train_env_steps_per_sec": train_sps,
            }
        )
    )


if __name__ == "__main__":
    main()
