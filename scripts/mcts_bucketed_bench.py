"""Head-to-head: plain vs bucketed reference-budget MCTS with the trained
habit prior (the deployed planning configuration). Run with the TPU free.

Usage: python scripts/mcts_bucketed_bench.py [ckpt_dir]
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from deep_active_inference_mc_tpu.config import Config
from deep_active_inference_mc_tpu.envs import dsprites as env_lib
from deep_active_inference_mc_tpu.envs import raster
from deep_active_inference_mc_tpu.infer.agent import ActiveInferenceAgent
from deep_active_inference_mc_tpu.plan import mcts as mcts_lib
from deep_active_inference_mc_tpu.train import loop as train_loop
from deep_active_inference_mc_tpu.utils import checkpoint as ckpt
from deep_active_inference_mc_tpu.utils import compcache


def main():
    compcache.enable_persistent_cache()
    ckpt_dir = sys.argv[1] if len(sys.argv) > 1 else (
        "artifacts/run512/checkpoints"
    )
    cfg = Config()
    agent_f32 = ActiveInferenceAgent(s_dim=cfg.s_dim, pi_dim=cfg.pi_dim)
    agent = ActiveInferenceAgent(
        s_dim=cfg.s_dim, pi_dim=cfg.pi_dim, dtype=jnp.bfloat16
    )
    state = train_loop.create_train_state(cfg, agent_f32, jax.random.key(0))
    state, _, _ = ckpt.load_all(ckpt_dir, state)
    params = state.params
    print(f"loaded {ckpt_dir}")

    lut = raster.build_sprite_lut()
    B = 256
    env = env_lib.reset(jax.random.key(0), B)
    o = env_lib.render(lut, env)
    p = mcts_lib.MCTSParams(
        repeats=300, simulation_depth=3, max_depth=16, fused_eval=True
    )

    # plain (fused bf16, the round-3 fast path)
    planner = mcts_lib.make_jit_planner(agent, p)
    res = planner(params, jax.random.key(1), o)
    jax.device_get(res.actions[0, 0])
    t0 = time.perf_counter()
    reps = 3
    done = 0.0
    for i in range(reps):
        res = planner(params, jax.random.key(2 + i), o)
        done += float(jnp.sum(res.repeats_done))
    jax.device_get(res.actions[0, 0])
    dt = time.perf_counter() - t0
    print(
        f"plain   : {B * reps / dt:7.1f} plans/s  "
        f"(avg {done / (B * reps):.0f}/300 expansions)"
    )

    for check_every, min_bucket in ((8, 16), (16, 16), (16, 32), (32, 32)):
        plan = mcts_lib.make_bucketed_planner(
            agent, p, check_every=check_every, min_bucket=min_bucket
        )
        for k in (1, 101):  # warm the ladder (two keys: different traces)
            plan(params, jax.random.key(k), o)
        t0 = time.perf_counter()
        traces = []
        for i in range(reps):
            res = plan(params, jax.random.key(2 + i), o)
            traces.append(plan.bucket_trace)
        jax.device_get(res.actions[0, 0])
        dt = time.perf_counter() - t0
        print(
            f"bucketed(check={check_every:2d}, min={min_bucket:2d}): "
            f"{B * reps / dt:7.1f} plans/s  traces={traces}"
        )


if __name__ == "__main__":
    main()
