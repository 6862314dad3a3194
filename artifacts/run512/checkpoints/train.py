"""Training driver — rebuild of ``/root/reference/train.py``.

Usage:
    python -m deep_active_inference_mc_tpu.apps.train [--resume] [--batch N]
        [--epochs N] [--rounds N] [... any Config field ...]

Differences from the reference driver (all TPU-first, same capabilities):
  - the whole epoch (1000 rounds of data-gen + 3-stage update) is ONE jitted
    ``lax.scan`` running on-device; the host only orchestrates epochs,
    checkpoints, stats and plots;
  - checkpoint/resume via Orbax restores optimizer state correctly
    (the reference port silently dropped it — SURVEY.md §2.9.5);
  - precision scalars are checkpointed directly rather than recovered from
    the stats tail (torchmodel.py:202-207).
"""

from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from deep_active_inference_mc_tpu.config import Config
from deep_active_inference_mc_tpu.envs import raster
from deep_active_inference_mc_tpu.infer.agent import ActiveInferenceAgent
from deep_active_inference_mc_tpu.infer.precision import anneal_gamma
from deep_active_inference_mc_tpu.ops import math as m
from deep_active_inference_mc_tpu.parallel import mesh as mesh_lib
from deep_active_inference_mc_tpu.train import loop as train_loop
from deep_active_inference_mc_tpu.train import sweep as sweep_lib
from deep_active_inference_mc_tpu.train.evaluate import make_jit_eval
from deep_active_inference_mc_tpu.utils import checkpoint as ckpt
from deep_active_inference_mc_tpu.utils import profiling
from deep_active_inference_mc_tpu.utils import stats as stats_lib
from deep_active_inference_mc_tpu.viz.generate_traversals import generate_traversals
from deep_active_inference_mc_tpu.viz.reconstructions_plot import reconstructions_plot
from deep_active_inference_mc_tpu.viz.stats_plot import behavior_plot, stats_plot


def main(argv=None):
    import signal

    from deep_active_inference_mc_tpu.utils import compcache

    # Interrupt-safe shutdown must work however the trainer was spawned:
    # a non-interactive shell starts background jobs with SIGINT set to
    # SIG_IGN (so CPython never installs its own handler — watchdog-spawned
    # trainers were unstoppable by SIGINT), and supervisors send SIGTERM.
    # Route both to the KeyboardInterrupt path, which writes a resumable
    # checkpoint (below).
    def _interrupt(signum, frame):
        raise KeyboardInterrupt

    signal.signal(signal.SIGINT, _interrupt)
    signal.signal(signal.SIGTERM, _interrupt)

    compcache.enable_persistent_cache()
    parser = argparse.ArgumentParser(add_help=False)
    parser.add_argument("-r", "--resume", action="store_true")
    parser.add_argument("-b", "--batch", type=int, default=None)
    parser.add_argument("--profile_dir", type=str, default=None,
                        help="Write a jax.profiler trace of epoch 1 here.")
    # Multi-host (DCN) flags: a cross-host mesh is one flag set away
    # (SURVEY.md §2.10 stretch). Run the same command on every host with
    # its own --host_id; combine with --mesh_shape <total devices>.
    parser.add_argument("--coordinator", type=str, default=None,
                        help="host:port of host 0 (multi-host runs).")
    parser.add_argument("--num_hosts", type=int, default=1)
    parser.add_argument("--host_id", type=int, default=None)
    known, rest = parser.parse_known_args(argv)
    # Must run before any other JAX device API.
    mesh_lib.initialize_multihost(
        known.coordinator, known.num_hosts, known.host_id
    )
    primary = mesh_lib.is_primary()
    overrides = {"batch": known.batch} if known.batch else {}
    cfg = Config.from_args(rest, **overrides)

    folder = cfg.folder
    folder_chp = cfg.folder_chp
    if primary:
        folder.mkdir(parents=True, exist_ok=True)
        folder_chp.mkdir(parents=True, exist_ok=True)
        cfg.save(folder / "config.json")

    agent = ActiveInferenceAgent(
        s_dim=cfg.s_dim,
        pi_dim=cfg.pi_dim,
        colour_channels=cfg.colour_channels,
        resolution=cfg.resolution,
        dtype=jnp.bfloat16 if cfg.bf16 else jnp.float32,
    )
    lut = raster.build_sprite_lut()

    # Multi-chip parallelism: Config.mesh_shape > 1 pins env batches to the
    # mesh's 'data' axis and (with --tp N) Megatron-splits the Dense chains
    # over a 'model' axis; XLA inserts every collective over ICI from the
    # sharding annotations (SURVEY.md §2.10).
    mesh = None
    if cfg.mesh_shape is not None and cfg.mesh_shape > 1:
        mesh = mesh_lib.make_mesh(cfg.mesh_shape, cfg.tp)
        n_data = cfg.mesh_shape // cfg.tp
        if cfg.batch % n_data:
            raise ValueError(
                f"batch {cfg.batch} not divisible by data-axis size {n_data}"
            )

    key = jax.random.key(0)
    key, k_init = jax.random.split(key)
    state = train_loop.create_train_state(cfg, agent, k_init)
    stats = stats_lib.new_stats()
    start_epoch = 1

    if known.resume and ckpt.latest_exists(folder_chp):
        state, stats, key = ckpt.load_all(folder_chp, state)
        stats = stats_lib.pad_missing(stats)
        start_epoch = len(stats["F"]) + 1
        print(f"Resumed from {folder_chp} at epoch {start_epoch}")

    if mesh is not None:
        state = mesh_lib.shard_train_state(state, mesh, cfg)
        epoch_fn = mesh_lib.make_sharded_epoch(agent, cfg, lut, mesh, cfg.rounds)
    else:
        epoch_fn = train_loop.make_jit_epoch(agent, cfg, lut, cfg.rounds)
    eval_fn = make_jit_eval(agent, cfg, lut)
    # Per-epoch behavioral score: an EFE-agent sweep (fills the reference's
    # declared-but-never-appended train_scores_* series, train.py:71-73).
    # 512 envs x 100 macro-steps by default — large enough that the logged
    # series is a learning curve, not noise.
    score_fn = sweep_lib.make_sweep(
        agent, cfg, lut, method="ai", n_macro_steps=cfg.sweep_steps,
        steps=cfg.deepness, samples=cfg.samples, jumps=cfg.repeats,
    )
    habit_fn = sweep_lib.make_sweep(
        agent, cfg, lut, method="habit", n_macro_steps=cfg.sweep_steps,
        jumps=cfg.repeats,
    )
    decode_fn = jax.jit(lambda p, s: agent.decode(p, s))

    distiller = None
    if cfg.distill_every > 0:
        from deep_active_inference_mc_tpu.train.distill import Distiller

        distiller = Distiller(
            agent, cfg, lut, train_loop.make_optimizers(cfg)["top"]
        )

    # FIXED sweep PRNG + envs: the per-epoch score series is paired across
    # epochs (same initial envs, same noise stream — differences come from
    # params only), so learning is visible above sweep noise (VERDICT r2
    # weak #2). Constant expert/random baselines on the same PRNG give a
    # normalized scale.
    k_sweep = jax.random.key(20260817)
    k_env2, k_sw = jax.random.split(k_sweep)
    sweep_env = train_loop.env_lib.randomize(
        k_env2, train_loop.env_lib.reset(k_env2, cfg.sweep_envs)
    )
    sweep_base = {}
    for meth in ("random", "expert"):
        fn = sweep_lib.make_sweep(
            agent, cfg, lut, method=meth, n_macro_steps=cfg.sweep_steps,
            jumps=cfg.repeats,
        )
        b = jax.device_get(fn(state.params, k_sw, sweep_env))
        sweep_base[meth] = float(b["score_mean"])
    print(
        f"sweep baselines (fixed PRNG, {cfg.sweep_envs} envs x "
        f"{cfg.sweep_steps} macro): random {sweep_base['random']:+.3f}, "
        f"expert {sweep_base['expert']:+.3f}", flush=True,
    )

    start_time = time.time()
    saver = ckpt.AsyncSaver()
    try:
        for epoch in range(start_epoch, cfg.epochs + 1):
            # gamma annealing (train.py:101-102).
            state = state.replace(
                precision=anneal_gamma(
                    state.precision, epoch, cfg.gamma_delay, cfg.gamma_rate,
                    cfg.gamma_max,
                )
            )

            key, k_epoch, k_eval = jax.random.split(key, 3)
            epoch_t0 = time.time()
            with profiling.trace(known.profile_dir if epoch == start_epoch else None):
                state, train_metrics = epoch_fn(state, k_epoch)
                train_metrics = jax.tree.map(float, jax.device_get(train_metrics))
            env_sps = cfg.batch * cfg.repeats * cfg.rounds / (time.time() - epoch_t0)

            # MCTS-visit distillation phase (train/distill.py): sharpen the
            # habit net against planner root visits every distill_every
            # epochs. Runs before the checkpoint so distilled params persist.
            dmetrics = {}
            if distiller is not None and epoch % cfg.distill_every == 0:
                key, k_distill = jax.random.split(key)
                d_t0 = time.time()
                state, dmetrics = distiller(state, k_distill)
                print(
                    f"  distill@{epoch}: kl {dmetrics['distill_kl_first']:.3f}"
                    f"->{dmetrics['distill_kl_last']:.3f}, match "
                    f"{dmetrics['distill_match_first']:.2f}->"
                    f"{dmetrics['distill_match_last']:.2f}, target H "
                    f"{dmetrics['distill_target_entropy']:.3f}, "
                    f"{dmetrics['distill_steps']:.0f} steps, "
                    f"{time.time() - d_t0:.1f}s",
                    flush=True,
                )

            # Checkpoint/stat/viz writes are process-0-only on multi-host
            # meshes (every host computes identically; one writes).
            if primary and epoch % cfg.save_every == 0:
                saver.save(folder_chp, state, stats, key, script_file=__file__)
            if primary and epoch % cfg.archive_every == 0:
                saver.wait()  # the archive copies the checkpoint dir
                ckpt.archive(folder_chp, epoch)

            # ---- evaluation (train.py:136-146) --------------------------------
            ev = jax.device_get(eval_fn(state.params, state.precision, k_eval))

            stats["F"].append(float(ev["F"]))
            stats["F_top"].append(float(ev["F_top"]))
            stats["F_mid"].append(float(ev["F_mid"]))
            stats["F_down"].append(float(ev["F_down"]))
            stats["mse_o"].append(float(ev["mse_o"]))
            stats["mse_o_clean"].append(float(ev["mse_o_clean"]))
            stats["kl_div_s"].append(float(ev["kl_div_s"]))
            stats["kl_div_s_anal"].append(np.asarray(ev["kl_div_s_anal"]))
            stats["kl_div_s_naive"].append(float(ev["kl_div_s_naive"]))
            stats["kl_div_s_naive_anal"].append(np.asarray(ev["kl_div_s_naive_anal"]))
            stats["omega"].append(train_metrics["omega"])
            stats["omega_std"].append(train_metrics["omega_std"])
            stats["kl_div_pi_train"].append(train_metrics["kl_pi"])
            stats["kl_div_pi"].append(float(ev["kl_div_pi"]))
            stats["kl_div_pi_min"].append(float(ev["kl_div_pi_min"]))
            stats["kl_div_pi_max"].append(float(ev["kl_div_pi_max"]))
            stats["kl_div_pi_med"].append(float(ev["kl_div_pi_med"]))
            stats["kl_div_pi_std"].append(float(ev["kl_div_pi_std"]))
            stats["kl_div_pi_anal"].append(np.asarray(ev["kl_div_pi_anal"]))
            stats["var_beta_s"].append(float(state.precision.beta_s))
            stats["var_gamma"].append(float(state.precision.gamma))
            stats["var_beta_o"].append(float(state.precision.beta_o))
            stats["var_a"].append(cfg.var_a)
            stats["var_b"].append(cfg.var_b)
            stats["var_c"].append(cfg.var_c)
            stats["var_d"].append(cfg.var_d)
            stats["TC"].append(float(m.total_correlation(ev["qs1"])))
            stats["learning_rate"].append(cfg.l_rate_down)
            stats["current_lr"].append(cfg.l_rate_down)
            stats["mse_r"].append(float(ev["mse_r"]))
            stats["deep_mse_o"].append(float(ev["deep_mse_o"]))
            for k in ("gnorm_top", "gnorm_mid", "gnorm_down"):
                stats[k].append(train_metrics[k])
                stats[k + "_max"].append(train_metrics[k + "_max"])
            stats["F_down_round_max"].append(train_metrics["F_down_max"])
            for k in ("distill_kl_first", "distill_kl_last",
                      "distill_match_first", "distill_match_last",
                      "distill_target_entropy"):
                stats[k].append(float(dmetrics.get(k, 0.0)))

            sc = jax.device_get(score_fn(state.params, k_sw, sweep_env))
            sc_h = jax.device_get(
                habit_fn(state.params, jax.random.fold_in(k_sw, 1), sweep_env)
            )
            stats["score"].append(float(sc["score_mean"]))
            stats["train_scores_m"].append(float(sc["score_mean"]))
            stats["train_scores_std"].append(float(sc["score_std"]))
            stats["train_scores_sem"].append(float(sc["score_sem"]))
            stats["train_scores_min"].append(float(sc["score_min"]))
            stats["train_scores_max"].append(float(sc["score_max"]))
            stats["train_scores_habit_m"].append(float(sc_h["score_mean"]))
            stats["train_scores_habit_sem"].append(float(sc_h["score_sem"]))
            stats["train_events_sq"].append(float(sc["events_sq"]))
            stats["train_events_other"].append(float(sc["events_other"]))
            stats["train_scores_sq"].append(float(sc["score_sq"]))
            stats["train_scores_other"].append(float(sc["score_other"]))
            stats["train_scores_expert"].append(sweep_base["expert"])
            stats["train_scores_random"].append(sweep_base["random"])
            for k in ("edge_habit_correct", "edge_habit_wrong",
                      "edge_g_correct", "edge_g_wrong", "edge_g_gap_nats",
                      "edge_g_sq_gap_nats", "edge_g_oth_gap_nats"):
                stats[k].append(float(ev[k]))

            # ---- artifacts (train.py:177-186) ---------------------------------
            if primary and epoch % cfg.viz_every == 0:
                generate_traversals(
                    decode_fn=lambda s: decode_fn(state.params, s),
                    s_dim=cfg.s_dim,
                    s_sample=ev["s0"],
                    S_real=ev["S0_real"],
                    filenames=[folder / f"traversals_at_epoch_{epoch:04d}.png"],
                )
                reconstructions_plot(
                    ev["o0"], ev["o1"], ev["po1"],
                    filename=folder / f"imagination_{cfg.signature}_{epoch}.png",
                )
                # Reward-imagination strip (train.py:184): does the decoded
                # imagination of an "up" at the scoring edge paint the strip?
                reconstructions_plot(
                    ev["o0_probe"], ev["o1_probe"], ev["po1_probe"],
                    filename=folder
                    / f"reward_imagination_{cfg.signature}_{epoch}.png",
                )
                stats_plot(stats, folder / f"1_result_{cfg.signature}")
                behavior_plot(stats, folder / f"2_behavior_{cfg.signature}")

            print(
                f"{epoch}, F: {stats['F'][-1]:.2f}, MSEo: {stats['mse_o'][-1]:.3f} "
                f"(clean {stats['mse_o_clean'][-1]:.1f}), "
                f"KLs: {stats['kl_div_s'][-1]:.2f}, "
                f"omega: {stats['omega'][-1]:.2f}+-{stats['omega_std'][-1]:.2f}, "
                f"KLpi: {stats['kl_div_pi'][-1]:.2f}, TC: {stats['TC'][-1]:.2f}, "
                f"score: {stats['score'][-1]:.2f} "
                f"(h {stats['train_scores_habit_m'][-1]:.2f}, "
                f"sq {stats['train_scores_sq'][-1]:+.2f}/"
                f"oth {stats['train_scores_other'][-1]:+.2f}), "
                f"edge: h {stats['edge_habit_correct'][-1] - stats['edge_habit_wrong'][-1]:+.3f} "
                f"g {stats['edge_g_correct'][-1] - stats['edge_g_wrong'][-1]:+.3f}, "
                f"gn: {stats['gnorm_top'][-1]:.1f}/{stats['gnorm_mid'][-1]:.1f}/"
                f"{stats['gnorm_down'][-1]:.1f} "
                f"(max {stats['gnorm_top_max'][-1]:.0f}/{stats['gnorm_mid_max'][-1]:.0f}/"
                f"{stats['gnorm_down_max'][-1]:.0f}, Fd^ {stats['F_down_round_max'][-1]:.0f}), "
                f"env_steps/s: {env_sps:.2e}, "
                f"dur. {time.time() - start_time:.2f}s",
                flush=True,
            )
            start_time = time.time()


    except KeyboardInterrupt:
        # Failure recovery = checkpoint + --resume (SURVEY.md §5):
        # an interrupt saves a resumable checkpoint instead of
        # losing up to save_every epochs of work.
        print("Interrupted — saving checkpoint for --resume", flush=True)
        try:
            saver.wait()  # may re-raise a stored background-writer error
        except Exception as e:
            # Never let a failed *background* save skip the synchronous
            # final save below (ADVICE r2 #1).
            print(f"background save failed: {e!r}", flush=True)
        if primary:
            ckpt.save_all(folder_chp, state, stats, key, script_file=__file__)
        raise SystemExit(130)
    saver.wait()


if __name__ == "__main__":
    main(sys.argv[1:])
