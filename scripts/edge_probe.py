"""High-precision scoring-edge discrimination probe for a checkpoint.

Answers THE round-3 behavioral diagnosis question: does the trained EFE
estimate (and the habit net) prefer pushing 'up' on the CORRECT side per
object class (squares left / ellipses+hearts right), or has the agent merely
learned a side-agnostic "push right" heuristic that exploits the 2:1 class
ratio? Averages the MC-noisy G estimator over many keys so per-class gaps
resolve (the per-epoch trainer probe uses one key and is ±7 nats noisy).

Usage: python scripts/edge_probe.py <checkpoint_dir> [--keys 32]
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt", type=str)
    ap.add_argument("--keys", type=int, default=32)
    args = ap.parse_args()

    from deep_active_inference_mc_tpu.config import Config
    from deep_active_inference_mc_tpu.envs import dsprites as env_lib
    from deep_active_inference_mc_tpu.envs import raster
    from deep_active_inference_mc_tpu.infer import efe
    from deep_active_inference_mc_tpu.infer.agent import ActiveInferenceAgent
    from deep_active_inference_mc_tpu.train import loop as train_loop
    from deep_active_inference_mc_tpu.utils import checkpoint as ckpt
    from deep_active_inference_mc_tpu.utils import compcache

    compcache.enable_persistent_cache()
    cfg = Config()
    agent = ActiveInferenceAgent(s_dim=cfg.s_dim, pi_dim=cfg.pi_dim)
    state = train_loop.create_train_state(cfg, agent, jax.random.key(0))
    state, _, _ = ckpt.load_all(args.ckpt, state)
    params = state.params
    lut = raster.build_sprite_lut()

    # Every (shape, scale, posX) at the scoring edge posY=31.
    posx = jnp.arange(32, dtype=jnp.int32)
    shp = jnp.asarray([0, 1, 2], jnp.int32)
    scl = jnp.asarray([1, 3, 5], jnp.int32)
    SH, SC, PX = jnp.meshgrid(shp, scl, posx, indexing="ij")
    lat = jnp.stack(
        [jnp.zeros_like(SH), SH, SC, jnp.zeros_like(SH), PX,
         jnp.full_like(SH, 31)], axis=-1,
    ).reshape(-1, 6)
    n = lat.shape[0]
    env = env_lib.EnvState(
        latents=lat, score=jnp.zeros((n,)), last_r=jnp.zeros((n,))
    )
    o = env_lib.render_obs(lut, env, cfg.resolution)

    @jax.jit
    def g_up(key):
        G, _, _ = efe.calculate_G_4_repeated(
            agent, params, key, o, steps=1, calc_mean=True, samples=1
        )
        return G  # (n, 4)

    Gs = np.stack(
        [np.asarray(g_up(jax.random.key(1000 + i))) for i in range(args.keys)]
    )  # (keys, n, 4)
    G = Gs.mean(0).reshape(3, 3, 32, 4)
    G_sem = (Gs.std(0) / np.sqrt(args.keys)).reshape(3, 3, 32, 4)
    Gup = G[..., 0]  # (shape, scale, posX)

    sq_gap = Gup[0, :, 16:].mean() - Gup[0, :, :16].mean()
    oth_gap = Gup[1:, :, :16].mean() - Gup[1:, :, 16:].mean()
    sem = G_sem[..., 0].mean() / np.sqrt(16 * 3)
    print(f"G(up) per class/side, {args.keys} keys, sem/cell ~{sem:.2f} nats:")
    for si, name in enumerate(["square", "ellipse", "heart"]):
        left = Gup[si, :, :16].mean()
        right = Gup[si, :, 16:].mean()
        print(f"  {name:8s}: G_up left {left:8.2f}  right {right:8.2f}  "
              f"(prefers {'LEFT' if left < right else 'RIGHT'})")
    print(f"square gap (right-left, >0 = correct): {sq_gap:+.2f} nats")
    print(f"ellipse/heart gap (left-right, >0 = correct): {oth_gap:+.2f} nats")
    both = sq_gap > 0 and oth_gap > 0
    print("verdict:", "SHAPE->SIDE DISCRIMINATION" if both else
          "side-agnostic bias (no shape conditioning)" if oth_gap * sq_gap < 0
          else "no edge preference")

    # Habit net at the same states.
    q_pi = np.asarray(agent.habitual_net(params, o)).reshape(3, 3, 32, 4)
    pu = q_pi[..., 0]
    print(f"habit P(up): square left {pu[0, :, :16].mean():.3f} right "
          f"{pu[0, :, 16:].mean():.3f}; oth left {pu[1:, :, :16].mean():.3f} "
          f"right {pu[1:, :, 16:].mean():.3f}")


if __name__ == "__main__":
    main()
