"""Post-training MCTS-visit distillation stage (AlphaZero outer loop).

Iterates (collect planner root visits → train the habit net on them) with
the transition/VAE frozen — the clean version of the policy-improvement
loop `train/distill.py` provides. Inside the joint trainer a distill phase
competes with ~1000 soft-teacher top updates per epoch and is washed out;
here the visit distribution is the *only* policy target, so the habit net
actually converges to the planner's decisions, which in turn sharpens the
planner's own prior on the next collect iteration (its simulations and
phase-A short-circuit both consume the habit — /root/reference/src/mcts.py
uses Q(pi|s) the same two ways).

The reference has no analogue: its habit only ever distills softmax(-G)
(`/root/reference/train.py:112-113`); the NeurIPS paper's MCTS exists only
at eval time. This stage is what turns the planner's +2.2 behavioral score
into a teacher instead of a read-only controller.

Usage:
    python -m deep_active_inference_mc_tpu.apps.distill \
        -n runs/figs_<sig>/checkpoints -o runs/distilled \
        --iters 20 [--distill_envs 256 --distill_macro 40 ...]

Prints per-iteration distill metrics plus a paired-PRNG habit sweep score
(the behavioral readout) and saves the final state as a normal checkpoint
loadable by the sweep/demo/train apps.
"""

from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp

from deep_active_inference_mc_tpu.config import Config
from deep_active_inference_mc_tpu.envs import dsprites as env_lib
from deep_active_inference_mc_tpu.envs import raster
from deep_active_inference_mc_tpu.infer.agent import ActiveInferenceAgent
from deep_active_inference_mc_tpu.train import loop as train_loop
from deep_active_inference_mc_tpu.train import sweep as sweep_lib
from deep_active_inference_mc_tpu.train.distill import Distiller
from deep_active_inference_mc_tpu.utils import checkpoint as ckpt
from deep_active_inference_mc_tpu.utils import stats as stats_lib


def main(argv=None):
    from deep_active_inference_mc_tpu.utils import compcache

    compcache.enable_persistent_cache()
    parser = argparse.ArgumentParser(add_help=False)
    parser.add_argument("-n", "--network", type=str, required=True,
                        help="Checkpoint dir to start from.")
    parser.add_argument("-o", "--out", type=str, required=True,
                        help="Output checkpoint dir (never the input).")
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--sweep_every", type=int, default=1,
                        help="Habit-sweep readout cadence (iterations).")
    parser.add_argument("--patience", type=int, default=0,
                        help="Stop after this many sweep readouts without "
                        "a new best score (0 = run all --iters). The best-"
                        "scoring habit params are saved either way.")
    parser.add_argument("--keep_opt", action="store_true",
                        help="Keep the checkpoint's top Adam state instead "
                        "of re-initializing it. Default resets: a long "
                        "soft-teacher run inflates Adam's second moments "
                        "with gradient noise, which shrinks the effective "
                        "distill step to nothing (measured: a run from a "
                        "weight-only archive climbed +0.24->+0.55 over 20 "
                        "iters while the same run from the live checkpoint "
                        "sat flat at +0.265).")
    known, rest = parser.parse_known_args(argv)
    cfg = Config.from_args(rest)

    agent = ActiveInferenceAgent(
        s_dim=cfg.s_dim, pi_dim=cfg.pi_dim,
        colour_channels=cfg.colour_channels, resolution=cfg.resolution,
        # --bf16 keeps the collect fleet inside one v5e's HBM: 256-env
        # expand_k-fused search in f32 compiles to ~15.9G (OOM by ~140M).
        dtype=jnp.bfloat16 if cfg.bf16 else jnp.float32,
    )
    lut = raster.build_sprite_lut()
    state = train_loop.create_train_state(cfg, agent, jax.random.key(0))
    state, stats, key = ckpt.load_all(known.network, state)
    stats = stats_lib.pad_missing(stats)
    print(f"Loaded {known.network} (epoch {len(stats['F'])})", flush=True)

    top_opt = train_loop.make_optimizers(cfg)["top"]
    if not known.keep_opt:
        state = state.replace(opt_states={
            **state.opt_states,
            "top": top_opt.init(state.params["top"]),
        })
        print("Reset top optimizer state (pass --keep_opt to retain)",
              flush=True)

    distiller = Distiller(agent, cfg, lut, top_opt)
    # Paired behavioral readout: fixed PRNG + fixed initial envs, exactly
    # like the trainer's per-epoch series (apps/train.py) so scores are
    # comparable with the training log.
    k_sweep = jax.random.key(20260817)
    k_env2, k_sw = jax.random.split(k_sweep)
    sweep_env = env_lib.randomize(
        k_env2, env_lib.reset(k_env2, cfg.sweep_envs)
    )
    habit_fn = sweep_lib.make_sweep(
        agent, cfg, lut, method="habit", n_macro_steps=cfg.sweep_steps,
        jumps=cfg.repeats,
    )

    def habit_score():
        out = jax.device_get(
            habit_fn(state.params, jax.random.fold_in(k_sw, 1), sweep_env)
        )
        return float(out["score_mean"]), float(out["score_sem"])

    h0, sem0 = habit_score()
    print(f"iter 0: habit sweep {h0:+.3f}±{sem0:.3f} "
          f"({cfg.sweep_envs} envs x {cfg.sweep_steps} macro)", flush=True)

    # Keep the best habit by the paired sweep readout: the loop overshoots
    # its optimum (measured: a continuation run oscillated +0.93 -> +0.77
    # over 40 extra iterations as the net chased teacher noise), so the
    # saved checkpoint carries the peak-scoring top params, not the last.
    best_h, best_iter, best_top = h0, 0, jax.device_get(state.params["top"])
    stale = 0

    for i in range(1, known.iters + 1):
        t0 = time.time()
        key, k_d = jax.random.split(key)
        state, m = distiller(state, k_d)
        line = (
            f"iter {i}: kl {m['distill_kl_first']:.3f}->"
            f"{m['distill_kl_last']:.3f}, match {m['distill_match_first']:.2f}"
            f"->{m['distill_match_last']:.2f}, "
            f"target H {m['distill_target_entropy']:.3f}, "
            f"{m['distill_steps']:.0f} steps"
        )
        if i % known.sweep_every == 0 or i == known.iters:
            h, sem = habit_score()
            line += f", habit sweep {h:+.3f}±{sem:.3f}"
            if h > best_h:
                best_h, best_iter = h, i
                best_top = jax.device_get(state.params["top"])
                stale = 0
            else:
                stale += 1
        print(f"{line}, {time.time() - t0:.1f}s", flush=True)
        if known.patience and stale >= known.patience:
            print(f"Early stop: no sweep improvement in {stale} readouts "
                  f"(best {best_h:+.3f} at iter {best_iter})", flush=True)
            break

    if best_iter != known.iters:
        print(f"Restoring best habit (iter {best_iter}, sweep {best_h:+.3f})",
              flush=True)
        state = state.replace(params={
            **state.params,
            "top": jax.tree.map(jnp.asarray, best_top),
        })
    ckpt.save_all(known.out, state, stats, key, script_file=__file__)
    print(f"Saved distilled checkpoint to {known.out}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
