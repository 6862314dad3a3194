"""Root-cause probe for the bucketed-planner B=256 cross-round regression
(VERDICT r4 weak #2 / ask #4): BENCH_r03 read 89.1 plans/s, BENCH_r04 read
42.5 at the same point, while B=1024 improved.

Suspects named by the verdict:
  (a) the memoized compaction schedule (plan/mcts.py ``_sched``) learned on
      call 1 and reused for every later call — if the warmup key's searches
      decide slower/faster than the timed keys', later calls check the done
      mask only where the warmup compacted, which can disable compaction
      entirely (no recorded points -> one full-width chunk);
  (b) the distilled prior's flatter root visits delaying phase-B exits.

The memoized schedule was replaced by within-call adaptive deepening
(stateless across calls — see the cadence comment in
``make_bucketed_planner``). This probe measures, on the real chip with the
trained checkpoint, plain fused-bf16 vs adaptive bucketed at the same
budget, with per-rep wall times, bucket traces, and schedules printed.

Usage: python scripts/mcts_b256_probe.py [-n CKPT] [--reps 5] [--B 256]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", "--network", default="artifacts/run512/checkpoints")
    ap.add_argument("--B", type=int, default=256)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--repeats", type=int, default=300)
    ap.add_argument("--skip_plain", action="store_true")
    args = ap.parse_args()

    from deep_active_inference_mc_tpu.config import Config
    from deep_active_inference_mc_tpu.envs import dsprites as env_lib
    from deep_active_inference_mc_tpu.envs import raster
    from deep_active_inference_mc_tpu.infer.agent import ActiveInferenceAgent
    from deep_active_inference_mc_tpu.plan import mcts as mcts_lib
    from deep_active_inference_mc_tpu.train import loop as train_loop
    from deep_active_inference_mc_tpu.utils import checkpoint as ckpt
    from deep_active_inference_mc_tpu.utils import compcache

    compcache.enable_persistent_cache()
    cfg = Config()
    agent = ActiveInferenceAgent(
        s_dim=cfg.s_dim, pi_dim=cfg.pi_dim, dtype=jnp.bfloat16
    )
    state = train_loop.create_train_state(cfg, agent, jax.random.key(0))
    state, _, _ = ckpt.load_all(args.network, state)
    params = state.params
    lut = raster.build_sprite_lut()
    env = env_lib.reset(jax.random.key(0), args.B)
    o = env_lib.render(lut, env)
    p = mcts_lib.MCTSParams(
        repeats=args.repeats, simulation_depth=3, max_depth=16,
        fused_eval=True,
    )

    if not args.skip_plain:
        plan_plain = mcts_lib.make_jit_planner(agent, p)
        res = plan_plain(params, jax.random.key(1), o)
        jax.block_until_ready(res.actions)
        t0 = time.perf_counter()
        for i in range(args.reps):
            res = plan_plain(params, jax.random.key(2 + i), o)
        jax.block_until_ready(res.actions)
        dt = time.perf_counter() - t0
        print(f"plain   B={args.B}: {args.B * args.reps / dt:7.1f} plans/s "
              f"({dt / args.reps:.2f} s/rep)", flush=True)

    planner = mcts_lib.make_bucketed_planner(agent, p)
    for k in (1, 101):  # same warmup pattern as bench.py
        res = planner(params, jax.random.key(k), o)
    jax.block_until_ready(res.actions)
    print(f"bucketed warmup schedule={planner.schedule} "
          f"trace={planner.bucket_trace}", flush=True)
    times = []
    for i in range(args.reps):
        t0 = time.perf_counter()
        res = planner(params, jax.random.key(2 + i), o)
        jax.block_until_ready(res.actions)
        times.append(time.perf_counter() - t0)
        print(f"  rep {i}: {times[-1]:.2f}s trace={planner.bucket_trace} "
              f"sched={planner.schedule}", flush=True)
    dt = sum(times)
    print(f"bucketed[adaptive] B={args.B}: "
          f"{args.B * args.reps / dt:7.1f} plans/s "
          f"(reps: {', '.join(f'{t:.2f}' for t in times)})", flush=True)


if __name__ == "__main__":
    main()
