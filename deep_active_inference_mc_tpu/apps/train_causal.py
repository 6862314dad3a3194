"""Causal-model training driver — working rebuild of
``/root/reference/train_causal.py`` (the reference scaffold does not run:
missing model import, undefined optimizer/batch builder — SURVEY.md §2.8).

Usage:
    python -m deep_active_inference_mc_tpu.apps.train_causal
        [--resume] [--batch N] [... any Config field ...]

Mirrors the reference's intended structure: single Adam over the whole
model, gamma annealing, every-2-epoch checkpoints with every-25 archives,
per-epoch eval + traversal/reconstruction artifacts.
"""

from __future__ import annotations

import argparse
import sys
import time

import jax

from deep_active_inference_mc_tpu.config import Config
from deep_active_inference_mc_tpu.envs import raster
from deep_active_inference_mc_tpu.infer.precision import anneal_gamma
from deep_active_inference_mc_tpu.models.causal import StructuralCausalModel
from deep_active_inference_mc_tpu.train import causal as causal_lib
from deep_active_inference_mc_tpu.utils import checkpoint as ckpt
from deep_active_inference_mc_tpu.utils import stats as stats_lib
from deep_active_inference_mc_tpu.viz.generate_traversals import generate_traversals
from deep_active_inference_mc_tpu.viz.reconstructions_plot import reconstructions_plot


def main(argv=None):
    from deep_active_inference_mc_tpu.utils import compcache

    compcache.enable_persistent_cache()
    parser = argparse.ArgumentParser(add_help=False)
    parser.add_argument("-r", "--resume", action="store_true")
    parser.add_argument("-b", "--batch", type=int, default=None)
    parser.add_argument("--l_rate", type=float, default=1e-4)
    known, rest = parser.parse_known_args(argv)
    overrides = {"batch": known.batch} if known.batch else {}
    cfg = Config.from_args(rest, prefix="causal_model_", **overrides)

    folder = cfg.folder
    folder_chp = cfg.folder_chp
    folder.mkdir(parents=True, exist_ok=True)
    folder_chp.mkdir(parents=True, exist_ok=True)
    cfg.save(folder / "config.json")

    model = StructuralCausalModel(
        s_dim=cfg.s_dim,
        colour_channels=cfg.colour_channels,
        resolution=cfg.resolution,
    )
    lut = raster.build_sprite_lut()

    key = jax.random.key(0)
    key, k_init = jax.random.split(key)
    state, opt = causal_lib.create_causal_state(cfg, model, k_init, known.l_rate)
    stats = stats_lib.new_stats()
    start_epoch = 1
    if known.resume and ckpt.latest_exists(folder_chp):
        state, stats, key = ckpt.load_all(folder_chp, state)
        stats = stats_lib.pad_missing(stats)
        start_epoch = len(stats["F"]) + 1
        print(f"Resumed from {folder_chp} at epoch {start_epoch}")

    epoch_fn = causal_lib.make_jit_causal_epoch(model, cfg, opt, lut, cfg.rounds)
    eval_fn = causal_lib.make_jit_causal_eval(model, cfg, lut)
    decode_fn = jax.jit(
        lambda p, s: model.apply(
            {"params": p}, s, method=StructuralCausalModel.decode
        )
    )

    start_time = time.time()
    try:
        for epoch in range(start_epoch, cfg.epochs + 1):
            state = state.replace(
                precision=anneal_gamma(
                    state.precision, epoch, cfg.gamma_delay, cfg.gamma_rate,
                    cfg.gamma_max,
                )
            )
            key, k_epoch = jax.random.split(key)
            state, train_metrics = epoch_fn(state, k_epoch)

            if epoch % cfg.save_every == 0:
                ckpt.save_all(folder_chp, state, stats, key, script_file=__file__)
            if epoch % cfg.archive_every == 0:
                ckpt.archive(folder_chp, epoch)

            key, k_eval = jax.random.split(key)
            ev = jax.device_get(eval_fn(state.params, state.precision, k_eval))

            stats["F"].append(float(ev["F"]))
            stats["mse_o"].append(float(ev["mse_o"]))
            stats["kl_div_s"].append(float(ev["kl_div_s"]))
            stats["omega"].append(float(ev["omega"]))
            stats["omega_std"].append(0.0)
            stats["var_beta_s"].append(float(state.precision.beta_s))
            stats["var_gamma"].append(float(state.precision.gamma))
            stats["var_beta_o"].append(float(state.precision.beta_o))
            stats["var_a"].append(cfg.var_a)
            stats["var_b"].append(cfg.var_b)
            stats["var_c"].append(cfg.var_c)
            stats["var_d"].append(cfg.var_d)
            stats["learning_rate"].append(known.l_rate)
            stats["current_lr"].append(known.l_rate)

            generate_traversals(
                decode_fn=lambda s: decode_fn(state.params, s),
                s_dim=cfg.s_dim,
                s_sample=ev["s"],
                S_real=ev["S0_real"],
                filenames=[folder / f"traversals_at_epoch_{epoch:04d}.png"],
            )
            reconstructions_plot(
                ev["o0"], ev["o1"], ev["x_recon"],
                filename=folder / f"imagination_{cfg.signature}_{epoch}.png",
            )

            print(
                f"{epoch}, F: {stats['F'][-1]:.4f}, MSEo: {stats['mse_o'][-1]:.4f}, "
                f"KLs: {stats['kl_div_s'][-1]:.2f}, "
                f"omega: {stats['omega'][-1]:.2f}, "
                f"cf_effect: {float(ev['cf_effect']):.4f}, "
                f"dur. {time.time() - start_time:.2f}s",
                flush=True,
            )
            start_time = time.time()


    except KeyboardInterrupt:
        # Failure recovery = checkpoint + --resume (SURVEY.md §5):
        # an interrupt saves a resumable checkpoint instead of
        # losing up to save_every epochs of work.
        print("Interrupted — saving checkpoint for --resume", flush=True)
        ckpt.save_all(folder_chp, state, stats, key, script_file=__file__)
        raise SystemExit(130)


if __name__ == "__main__":
    main(sys.argv[1:])
