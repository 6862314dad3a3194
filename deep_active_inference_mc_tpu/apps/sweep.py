"""Batched agent-evaluation sweep CLI.

Scores any controller over thousands of vectorized environments, optionally
sharded over all available chips (BASELINE.json configs #2 and #5):

    python -m deep_active_inference_mc_tpu.apps.sweep \
        -n runs/figs_<sig>/checkpoints --method ai --envs 1024 --macro 200

Reports per-method score statistics (the demo's "ROUND SCORE" at fleet
scale, test_demo.py:120-124).
"""

from __future__ import annotations

import argparse
import sys
import time

import jax

from deep_active_inference_mc_tpu.config import Config
from deep_active_inference_mc_tpu.envs import raster
from deep_active_inference_mc_tpu.infer.agent import ActiveInferenceAgent
from deep_active_inference_mc_tpu.plan.mcts import MCTSParams
from deep_active_inference_mc_tpu.train import loop as train_loop
from deep_active_inference_mc_tpu.train import sweep as sweep_lib
from deep_active_inference_mc_tpu.utils import checkpoint as ckpt


def main(argv=None):
    from deep_active_inference_mc_tpu.utils import compcache

    compcache.enable_persistent_cache()
    parser = argparse.ArgumentParser(description="Batched agent sweep.")
    parser.add_argument("-n", "--network", type=str, default="",
                        help="Checkpoint dir to load (untrained if empty).")
    parser.add_argument("--method", type=str, default="ai",
                        choices=sweep_lib.METHODS,
                        help="Controller (or 'all' via repeated runs).")
    parser.add_argument("--envs", type=int, default=1024)
    parser.add_argument("--macro", type=int, default=100,
                        help="Macro-steps (plan->act cycles).")
    parser.add_argument("--steps", type=int, default=1)
    parser.add_argument("--samples", type=int, default=1)
    parser.add_argument("--jumps", type=int, default=5)
    parser.add_argument("--temp", type=float, default=1.0)
    parser.add_argument("--crn", action="store_true",
                        help="Common random numbers across the 4 candidate "
                        "actions for the ai/t1/t12 controllers "
                        "(efe.calculate_G_4_repeated_crn).")
    parser.add_argument("--sample_G", action="store_true",
                        help="Sample latents for G instead of means "
                        "(reference demo's default mode; pair with "
                        "--samples 10).")
    parser.add_argument("--mcts_repeats", type=int, default=50)
    parser.add_argument("--mcts_depth", type=int, default=3)
    parser.add_argument("--mcts_c", type=float, default=1.0,
                        help="Exploration constant C (reference "
                        "mcts.py:139 default 1.0).")
    parser.add_argument("--mcts_prior_explore", action="store_true",
                        help="Weight the selection bonus by the habit "
                        "prior Q(pi|s) — the reference's "
                        "using_prior_for_exploration mode "
                        "(mcts.py:43-44, default off there too). "
                        "Pays off once the habit net is distilled.")
    parser.add_argument("--mcts_habit", action="store_true",
                        help="Phase-A habit short-circuit (reference "
                        "use_habit, mcts.py:166-170): skip the search "
                        "when habit confidence exceeds --mcts_threshold.")
    parser.add_argument("--mcts_threshold", type=float, default=0.5,
                        help="Phase A/B decision confidence threshold "
                        "(reference mcts.py:140).")
    parser.add_argument("--mcts_crn", action="store_true",
                        help="Common random numbers across actions in node "
                        "expansions (unfused evaluator only).")
    parser.add_argument("--mcts_fused", action="store_true",
                        help="Mega-batched expand+simulate evaluator "
                        "(same estimators, ~1 dispatch per network per "
                        "iteration; plan/mcts.py:_fused_expand_sim).")
    parser.add_argument("--mcts_bucketed", action="store_true",
                        help="Host-driven batch-compaction planner: decided "
                        "envs retire at iteration checkpoints, stragglers "
                        "re-pack into smaller buckets "
                        "(plan/mcts.py:make_bucketed_planner). mcts only.")
    parser.add_argument("--mcts_check_every", type=int, default=16,
                        help="Bucketed planner: iterations between "
                        "retire/compaction checks.")
    parser.add_argument("--mcts_min_bucket", type=int, default=32,
                        help="Bucketed planner: smallest compaction bucket.")
    parser.add_argument("--plan_queue", action="store_true",
                        help="reference full-plan execution protocol "
                        "(test_demo.py:161-204): enqueue the whole MCTS "
                        "path / the EFE action x steps, execute one entry "
                        "per macro, flush on scoring. Default: re-plan "
                        "every macro (first path action only).")
    parser.add_argument("--queue_cap", type=int, default=0,
                        help="with --plan_queue: execute at most this many "
                        "plan entries before re-planning (0 = the whole "
                        "plan, the reference protocol; 1 = re-plan every "
                        "macro). Beyond-reference commitment knob.")
    parser.add_argument("--mesh", action="store_true",
                        help="Shard envs over all devices.")
    parser.add_argument("--bf16", action="store_true",
                        help="bfloat16 model forwards (G scoring stays "
                        "f32); the planner's fused+bf16 fast path.")
    parser.add_argument("--chunk", type=int, default=50,
                        help="Macro-steps per device dispatch. Multi-minute "
                        "dispatches crash the axon tunnel worker; drop to "
                        "~8 for reference-budget MCTS (300 repeats).")
    parser.add_argument("--env_chunk", type=int, default=0,
                        help="Env-batch width per dispatch (0 = full batch). "
                        "The HBM lever: 2-step EFE at 4096 envs needs "
                        "--env_chunk 1024 on one v5e; groups are exact "
                        "(envs are independent).")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    import jax.numpy as jnp

    cfg = Config()
    agent = ActiveInferenceAgent(
        s_dim=cfg.s_dim, pi_dim=cfg.pi_dim,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
    )
    lut = raster.build_sprite_lut()
    if args.network:
        state = train_loop.create_train_state(cfg, agent, jax.random.key(0))
        state, _, _ = ckpt.load_all(args.network, state)
        params = state.params
        print(f"Loaded checkpoint from {args.network}")
    else:
        params = agent.init(jax.random.key(0))
        print("Untrained weights (no -n).")

    mesh = None
    if args.mesh:
        from deep_active_inference_mc_tpu.parallel import mesh as mesh_lib

        mesh = mesh_lib.make_mesh()
        print(f"Mesh over {len(mesh.devices.flat)} devices")

    mcts_params = MCTSParams(
        repeats=args.mcts_repeats, simulation_depth=args.mcts_depth,
        max_depth=16, fused_eval=args.mcts_fused, crn=args.mcts_crn,
        C=args.mcts_c, threshold=args.mcts_threshold,
        using_prior_for_exploration=args.mcts_prior_explore,
        use_habit=args.mcts_habit,
    )
    t0 = time.time()
    if args.mcts_bucketed:
        if args.method != "mcts":
            raise SystemExit("--mcts_bucketed requires --method mcts")
        out = sweep_lib.run_sweep_bucketed(
            agent, cfg, params, lut, jax.random.key(args.seed),
            n_envs=args.envs, n_macro_steps=args.macro, jumps=args.jumps,
            mcts_params=mcts_params, check_every=args.mcts_check_every,
            min_bucket=args.mcts_min_bucket, plan_queue=args.plan_queue,
            queue_cap=args.queue_cap,
        )
        out.pop("bucket_traces", None)
    else:
        out = sweep_lib.run_sweep(
            agent, cfg, params, lut, jax.random.key(args.seed),
            n_envs=args.envs, mesh=mesh, method=args.method,
            n_macro_steps=args.macro, chunk=args.chunk,
            env_chunk=args.env_chunk or None,
            steps=args.steps, samples=args.samples,
            jumps=args.jumps, temperature=args.temp,
            calc_mean=not args.sample_G, crn=args.crn,
            mcts_params=mcts_params, plan_queue=args.plan_queue,
            queue_cap=args.queue_cap,
        )
    out = jax.device_get(out)
    dt = time.time() - t0
    frames = args.envs * args.macro * args.jumps
    # Self-describing eval rows (VERDICT r4 ask #2): every result line
    # quotes the checkpoint it evaluated, so committed eval logs are
    # reproducible without reverse-engineering per-class magnitudes.
    print(
        f"method={args.method}"
        f"{('+queue' + (f'cap{args.queue_cap}' if args.queue_cap else '')) if args.plan_queue else ''} "
        f"ckpt={args.network or 'untrained'} "
        f"seed={args.seed} envs={args.envs} macro={args.macro} "
        f"score: {float(out['score_mean']):.3f} +- {float(out['score_sem']):.3f} "
        f"(std {float(out['score_std']):.3f}, min {float(out['score_min']):.2f}, "
        f"max {float(out['score_max']):.2f}) "
        f"scoring_events={int(out['scoring_events'])} "
        f"events_sq={int(out['events_sq'])} events_other={int(out['events_other'])} "
        f"score_sq={float(out['score_sq']):.3f} score_other={float(out['score_other']):.3f} "
        f"env_steps/s={frames / dt:.3e} wall={dt:.1f}s",
        flush=True,
    )


if __name__ == "__main__":
    main(sys.argv[1:])
