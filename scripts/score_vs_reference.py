"""Score-trajectory comparison: this rebuild's controllers vs the reference
agent's own recorded run.

The reference ships exactly one ground-truth behavioral trace: the score
overlay in ``/root/reference/dsprites.gif`` (1001 frames of its trained
agent under the MCTS demo, ``test_demo.py:219-231``), decoded by
``scripts/gif_score.py`` into ``tests/data/gif_scores.npz`` (+11.6875 by
frame 1000). This script runs the rebuild's controller ladder over the same
1000-env-step horizon with per-macro-step fleet-mean score recording
(``train.sweep make_sweep(record_traj=True)``) and renders both on one axis.

Honest-comparison caveats, stated on the figure: the reference trace is a
SINGLE rollout (high variance — it contains a ~400-frame stall); ours are
fleet means over >=256 paired envs. The reference curve is the anchor, not
a statistical baseline.

Chart conventions: one axis; fixed categorical hue order (Okabe-Ito CVD-safe
palette — the palette validator is a node script and node isn't in this
image, so the published validated set is used verbatim); the reference
anchor wears neutral dark gray + dash so identity is never color-alone;
direct labels at line ends plus a legend; recessive grid.

Usage:
    python scripts/score_vs_reference.py -n <ckpt> [--envs 512]
        [--mcts_envs 256] [--mcts_repeats 300] [--skip_mcts]
        [--out artifacts/score_vs_reference]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from deep_active_inference_mc_tpu.config import Config
from deep_active_inference_mc_tpu.envs import raster
from deep_active_inference_mc_tpu.infer.agent import ActiveInferenceAgent
from deep_active_inference_mc_tpu.plan.mcts import MCTSParams
from deep_active_inference_mc_tpu.train import loop as train_loop
from deep_active_inference_mc_tpu.train import sweep as sweep_lib
from deep_active_inference_mc_tpu.utils import checkpoint as ckpt

# Okabe-Ito (validated CVD-safe), fixed assignment by entity.
COLORS = {
    "mcts": "#0072B2",    # blue
    "ai": "#E69F00",      # orange
    "habit": "#009E73",   # green
    "expert": "#CC79A7",  # pink
    "random": "#999999",  # muted gray
    "reference": "#333333",
}
LABELS = {
    "mcts": "MCTS (ref budget)",
    "ai": "2-step EFE",
    "habit": "habit net",
    "expert": "oracle expert",
    "random": "random",
    "reference": "reference agent (its own recording, 1 rollout)",
}


def main(argv=None):
    from deep_active_inference_mc_tpu.utils import compcache

    compcache.enable_persistent_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", "--network", required=True)
    ap.add_argument("--envs", type=int, default=512)
    ap.add_argument("--mcts_envs", type=int, default=256)
    ap.add_argument("--mcts_repeats", type=int, default=300)
    ap.add_argument("--macro", type=int, default=200)
    ap.add_argument("--jumps", type=int, default=5)
    ap.add_argument("--skip_mcts", action="store_true")
    ap.add_argument("--out", default="artifacts/score_vs_reference")
    args = ap.parse_args(argv)

    gif = np.load(Path(__file__).parent.parent / "tests/data/gif_scores.npz")
    ref_scores = gif["scores"]  # (1001,) piecewise-constant running score
    # The recording's tail resets the round score to 0 (test_demo round end);
    # that reset isn't behavior — trim trailing frames after the last
    # nonzero score so the anchor endpoint is the final achieved score.
    nz = np.nonzero(ref_scores)[0]
    if len(nz):
        ref_scores = ref_scores[: nz[-1] + 1]

    cfg = Config()
    agent = ActiveInferenceAgent(s_dim=cfg.s_dim, pi_dim=cfg.pi_dim)
    agent_bf16 = ActiveInferenceAgent(
        s_dim=cfg.s_dim, pi_dim=cfg.pi_dim, dtype=jnp.bfloat16
    )
    lut = raster.build_sprite_lut()
    state = train_loop.create_train_state(cfg, agent, jax.random.key(0))
    state, _, _ = ckpt.load_all(args.network, state)
    params = state.params
    print(f"loaded {args.network}", flush=True)

    trajs = {}
    runs = [
        ("random", dict(method="random", n_envs=args.envs)),
        ("expert", dict(method="expert", n_envs=args.envs)),
        ("habit", dict(method="habit", n_envs=args.envs)),
        ("ai", dict(method="ai", steps=2, n_envs=args.envs)),
    ]
    if not args.skip_mcts:
        runs.append((
            "mcts",
            dict(
                method="mcts", n_envs=args.mcts_envs, chunk=8,
                mcts_params=MCTSParams(
                    repeats=args.mcts_repeats, max_depth=16, fused_eval=True
                ),
            ),
        ))
    for name, kw in runs:
        t0 = time.time()
        n_envs = kw.pop("n_envs")
        ag = agent_bf16 if name == "mcts" else agent
        out = sweep_lib.run_sweep(
            ag, cfg, params, lut, jax.random.key(0), n_envs=n_envs,
            n_macro_steps=args.macro, jumps=args.jumps, record_traj=True,
            **kw,
        )
        trajs[name] = np.asarray(jax.device_get(out["score_traj"]))
        print(
            f"{name}: final {trajs[name][-1]:+.3f} "
            f"(mean {float(out['score_mean']):+.3f} ± "
            f"{float(out['score_sem']):.3f}, {n_envs} envs, "
            f"{time.time() - t0:.0f}s)",
            flush=True,
        )

    out_base = Path(args.out)
    out_base.parent.mkdir(parents=True, exist_ok=True)
    np.savez(
        out_base.with_suffix(".npz"), ref=ref_scores,
        **{k: v for k, v in trajs.items()},
    )

    fig, ax = plt.subplots(figsize=(9, 5.5), dpi=150)
    x_ref = np.arange(len(ref_scores))
    ax.plot(
        x_ref, ref_scores, color=COLORS["reference"], ls="--", lw=2,
        label=LABELS["reference"],
    )
    order = [k for k in ("expert", "mcts", "ai", "habit", "random")
             if k in trajs]
    for name in order:
        y = trajs[name]
        x = (np.arange(len(y)) + 1) * args.jumps
        ax.plot(x, y, color=COLORS[name], lw=2, label=LABELS[name])
        ax.annotate(
            f"{LABELS[name].split(' (')[0]} {y[-1]:+.2f}",
            (x[-1], y[-1]), xytext=(6, 0), textcoords="offset points",
            color="#333333", fontsize=8, va="center",
        )
    ax.annotate(
        f"reference {ref_scores[-1]:+.2f}",
        (x_ref[-1], ref_scores[-1]), xytext=(6, 0),
        textcoords="offset points", color="#333333", fontsize=8,
        va="center",
    )
    ax.set_xlabel("environment steps")
    ax.set_ylabel("cumulative score")
    ax.set_title(
        "Task score over one demo horizon: rebuild controllers (fleet "
        "means) vs the reference's recorded rollout"
    )
    ax.grid(True, color="#e6e6e6", lw=0.6)
    ax.set_axisbelow(True)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    ax.legend(loc="upper left", fontsize=8, frameon=False)
    ax.set_xlim(0, len(ref_scores) * 1.18)  # room for end labels
    fig.tight_layout()
    fig.savefig(out_base.with_suffix(".png"))
    print(f"wrote {out_base.with_suffix('.png')}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
