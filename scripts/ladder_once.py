"""Run several eval-ladder rows in ONE process (one checkpoint load).

The per-row cost on the axon tunnel is dominated by fixed startup
(state create ~150s + Orbax load ~300s remote); a fresh process per row
(scripts/final_eval.sh) pays it every time. This driver loads once and
runs the requested methods sequentially, printing the same
self-describing row format as apps/sweep.py so rows can be appended to
the same eval log.

Usage:
    python scripts/ladder_once.py -n CKPT --rows random,expert,habit \
        [--envs 4096] [--macro 200] [--seed 0]

Row spec mirrors final_eval.sh: names from {random, expert, habit, t1,
t12, ai, ai_crn, mcts, mcts_queue, mcts_c2, mcts_c2_queue}; mcts rows run
at --mcts_envs, EFE rows at --ai_envs with --env_chunk.
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main(argv=None):
    from deep_active_inference_mc_tpu.utils import compcache

    compcache.enable_persistent_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", "--network", required=True)
    ap.add_argument("--rows", required=True,
                    help="comma-separated row names (final_eval.sh set)")
    ap.add_argument("--envs", type=int, default=4096)
    ap.add_argument("--ai_envs", type=int, default=4096)
    ap.add_argument("--ai_chunk", type=int, default=1024)
    ap.add_argument("--mcts_envs", type=int, default=256)
    ap.add_argument("--mcts_repeats", type=int, default=300)
    ap.add_argument("--macro", type=int, default=200)
    ap.add_argument("--jumps", type=int, default=5)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--chunk", type=int, default=25)
    ap.add_argument("--mcts_chunk", type=int, default=8)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from deep_active_inference_mc_tpu.config import Config
    from deep_active_inference_mc_tpu.envs import raster
    from deep_active_inference_mc_tpu.infer.agent import ActiveInferenceAgent
    from deep_active_inference_mc_tpu.plan.mcts import MCTSParams
    from deep_active_inference_mc_tpu.train import loop as train_loop
    from deep_active_inference_mc_tpu.train import sweep as sweep_lib
    from deep_active_inference_mc_tpu.utils import checkpoint as ckpt

    cfg = Config()
    agent_f32 = ActiveInferenceAgent(s_dim=cfg.s_dim, pi_dim=cfg.pi_dim)
    agent_bf16 = ActiveInferenceAgent(
        s_dim=cfg.s_dim, pi_dim=cfg.pi_dim, dtype=jnp.bfloat16
    )
    lut = raster.build_sprite_lut()
    t0 = time.time()
    state = train_loop.create_train_state(cfg, agent_f32, jax.random.key(0))
    state, _, _ = ckpt.load_all(args.network, state)
    params = state.params
    print(f"# loaded {args.network} in {time.time() - t0:.0f}s",
          file=sys.stderr, flush=True)

    def mp(C=1.0):
        return MCTSParams(
            repeats=args.mcts_repeats, simulation_depth=3, max_depth=16,
            fused_eval=True, C=C,
        )

    ROWS = {
        "random": dict(method="random", n_envs=args.envs),
        "expert": dict(method="expert", n_envs=args.envs),
        "habit": dict(method="habit", n_envs=args.envs),
        "t1": dict(method="t1", steps=2, n_envs=args.ai_envs,
                   env_chunk=args.ai_chunk),
        "t12": dict(method="t12", steps=2, n_envs=args.ai_envs,
                    env_chunk=args.ai_chunk),
        "ai": dict(method="ai", steps=2, n_envs=args.ai_envs,
                   env_chunk=args.ai_chunk),
        "ai_crn": dict(method="ai", steps=2, crn=True, n_envs=args.ai_envs,
                       env_chunk=args.ai_chunk),
        "mcts": dict(method="mcts", n_envs=args.mcts_envs,
                     mcts_params=mp(), chunk=args.mcts_chunk, bf16=True),
        "mcts_queue": dict(method="mcts", n_envs=args.mcts_envs,
                           mcts_params=mp(), chunk=args.mcts_chunk,
                           bf16=True, plan_queue=True),
        "mcts_c2": dict(method="mcts", n_envs=args.mcts_envs,
                        mcts_params=mp(C=2.0), chunk=args.mcts_chunk,
                        bf16=True),
        "mcts_c2_queue": dict(method="mcts", n_envs=args.mcts_envs,
                              mcts_params=mp(C=2.0), chunk=args.mcts_chunk,
                              bf16=True, plan_queue=True),
        # The reference demo's DEFAULT eval mode: sampled estimator,
        # steps=10, samples=10 (test_demo.py:70-77) — ~100x the
        # per-decision FLOPs of the ai row, so a narrow fleet.
        "ai_ref": dict(method="ai", steps=10, samples=10, calc_mean=False,
                       n_envs=128),
        "mcts_bucketed": dict(method="mcts", bucketed=True,
                              n_envs=2 * args.mcts_envs,
                              mcts_params=mp(), bf16=True),
        "mcts_bucketed_queue": dict(method="mcts", bucketed=True,
                                    n_envs=2 * args.mcts_envs,
                                    mcts_params=mp(), bf16=True,
                                    plan_queue=True),
    }
    for row in args.rows.split(","):
        spec = dict(ROWS[row])
        n_envs = spec.pop("n_envs")
        bf16 = spec.pop("bf16", False)
        agent = agent_bf16 if bf16 else agent_f32
        queued = spec.get("plan_queue", False)
        bucketed = spec.pop("bucketed", False)
        base_method = spec.get("method", row)
        t0 = time.time()
        if bucketed:
            spec.pop("method")
            out = sweep_lib.run_sweep_bucketed(
                agent, cfg, params, lut, jax.random.key(args.seed),
                n_envs=n_envs, n_macro_steps=args.macro, jumps=args.jumps,
                **spec,
            )
            out.pop("bucket_traces", None)
        else:
            out = sweep_lib.run_sweep(
                agent, cfg, params, lut, jax.random.key(args.seed),
                n_envs=n_envs, n_macro_steps=args.macro, jumps=args.jumps,
                chunk=spec.pop("chunk", args.chunk), **spec,
            )
        out = jax.device_get(out)
        dt = time.time() - t0
        frames = n_envs * args.macro * args.jumps
        label = base_method + ("+queue" if queued else "")
        if row in ("mcts_c2", "mcts_c2_queue"):
            label = label.replace("mcts", "mcts_c2")
        if bucketed:
            label = label.replace("mcts", "mcts_bucketed")
        if row in ("ai_crn", "ai_ref"):
            label = row
        print(
            f"method={label} ckpt={args.network} "
            f"seed={args.seed} envs={n_envs} macro={args.macro} "
            f"score: {float(out['score_mean']):.3f} +- "
            f"{float(out['score_sem']):.3f} "
            f"(std {float(out['score_std']):.3f}, "
            f"min {float(out['score_min']):.2f}, "
            f"max {float(out['score_max']):.2f}) "
            f"scoring_events={int(out['scoring_events'])} "
            f"events_sq={int(out['events_sq'])} "
            f"events_other={int(out['events_other'])} "
            f"score_sq={float(out['score_sq']):.3f} "
            f"score_other={float(out['score_other']):.3f} "
            f"env_steps/s={frames / dt:.3e} wall={dt:.1f}s",
            flush=True,
        )


if __name__ == "__main__":
    main(sys.argv[1:])
