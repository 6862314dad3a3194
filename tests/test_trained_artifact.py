"""Regression guard on the committed trained checkpoints.

The behavioral deliverable (a trained agent that sorts squares LEFT and
ellipses/hearts RIGHT — reference README.md:1-5) lives in
``artifacts/run512/checkpoints`` (joint trainer, epoch 1199) and
``artifacts/run512/checkpoints_distilled`` (the round-4 MCTS-visit-distilled
habit on the same mid/down weights — apps/distill.py; paired habit sweep
+0.80 vs +0.36 for the joint-trainer habit, per-class both positive:
sq +0.205 / other +0.633 at 1024 envs x 100 macro, eval_log_round4.txt).
This test loads each and asserts the habit net's scoring-edge policy
encodes the task rule, so a broken snapshot (truncated write,
params/serialization drift, accidental overwrite with an untrained run)
fails CI instead of silently shipping a lobotomized agent.

The two artifacts express the rule differently, so the contract is split:

- joint trainer: the softmax(-G, T=10) teacher makes the edge policy
  near-deterministic — assert absolute commitment, P(up|correct side)
  high and a wide side gap.
- distilled: the teacher is the planner's root visit distribution
  (target entropy ~0.95 of max — MCTS spreads root mass over several
  good continuations), so absolute edge P(up) is small; the rule lives
  in the left/right CONTRAST per class (measured: squares P(up)
  left 0.01-0.03 vs right 0.000; ellipse/heart right 0.01-0.21 vs
  left 0.000) — assert the contrast, not commitment.

Skipped when an artifact is absent (fresh clones before a training run).
"""

from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

RUN = Path(__file__).parent.parent / "artifacts" / "run512"


def _edge_policy(artifact):
    """P(up) per (class, scale, side) at the scoring edge (posY=31)."""
    from deep_active_inference_mc_tpu.config import Config
    from deep_active_inference_mc_tpu.envs import dsprites as env_lib
    from deep_active_inference_mc_tpu.envs import raster
    from deep_active_inference_mc_tpu.infer.agent import ActiveInferenceAgent
    from deep_active_inference_mc_tpu.train import loop as train_loop
    from deep_active_inference_mc_tpu.utils import checkpoint as ckpt

    cfg = Config()
    agent = ActiveInferenceAgent(s_dim=cfg.s_dim, pi_dim=cfg.pi_dim)
    state = train_loop.create_train_state(cfg, agent, jax.random.key(0))
    state, _, _ = ckpt.load_all(artifact, state)
    lut = raster.build_sprite_lut()

    # Objects of every class x scale on both sides of the scoring edge:
    # deep on each half (posX 4/6/8 vs 23/25/27).
    posx = jnp.asarray([4, 6, 8, 23, 25, 27], jnp.int32)
    shp = jnp.asarray([0, 1, 2], jnp.int32)
    scl = jnp.arange(6, dtype=jnp.int32)
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
    q_pi = np.asarray(agent.habitual_net(state.params, o)).reshape(3, 6, 6, 4)
    p_up = q_pi[..., 0]
    # per class: mean over scales x left/right positions
    return p_up[:, :, :3].mean((1, 2)), p_up[:, :, 3:].mean((1, 2))


@pytest.mark.skipif(
    not (RUN / "checkpoints").exists(), reason="no committed checkpoint"
)
def test_habit_edge_policy_encodes_sorting_rule():
    left, right = _edge_policy(RUN / "checkpoints")
    # Trained anchor (epoch 1086+, docs/STATUS.md): P(up|correct side)=1.00,
    # P(up|wrong)~0.19 at mid scale — generous margins so fine-tunes don't
    # flake (scale-averaged commitment is lower than the mid-scale peak).
    assert left[0] > 0.3, f"square left-edge P(up)={left[0]:.3f}"
    assert left[0] - right[0] > 0.15, (
        f"square side gap {left[0]:.3f} vs {right[0]:.3f}"
    )
    for c in (1, 2):  # ellipse, heart
        assert right[c] > 0.3, f"class {c} right-edge P(up)={right[c]:.3f}"
        assert right[c] - left[c] > 0.15, (
            f"class {c} side gap {right[c]:.3f} vs {left[c]:.3f}"
        )


@pytest.mark.skipif(
    not (RUN / "checkpoints_distilled").exists(),
    reason="no committed distilled checkpoint",
)
def test_distilled_habit_edge_contrast_encodes_sorting_rule():
    left, right = _edge_policy(RUN / "checkpoints_distilled")
    # Contrast contract (see module docstring): correct side strictly
    # preferred per class, wrong side near zero.
    assert left[0] > 2.0 * right[0] + 1e-3, (
        f"square contrast {left[0]:.4f} !> 2x {right[0]:.4f}"
    )
    assert right[0] < 0.05, f"square wrong-side P(up)={right[0]:.4f}"
    for c in (1, 2):  # ellipse, heart
        assert right[c] > 2.0 * left[c] + 1e-3, (
            f"class {c} contrast {right[c]:.4f} !> 2x {left[c]:.4f}"
        )
        assert left[c] < 0.05, f"class {c} wrong-side P(up)={left[c]:.4f}"
