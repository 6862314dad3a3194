"""Regression guard on the committed trained checkpoints.

The behavioral deliverable (a trained agent that sorts squares LEFT and
ellipses/hearts RIGHT — reference README.md:1-5) lives in
``artifacts/run512/checkpoints`` (the FLAGSHIP: phase-3 epoch-1299
snapshot — round-5 measured best under both eval protocols, see
docs/STATUS.md round-5 matrix) and
``artifacts/run512/checkpoints_distilled`` (the round-4 MCTS-visit-distilled
habit — apps/distill.py; paired habit sweep +0.80 vs +0.36 for the
joint-trainer habit it replaced, per-class both positive: sq +0.205 /
other +0.633 at 1024 envs x 100 macro, eval_log_round4.txt). This test
loads each and asserts the habit net's scoring-edge policy encodes the
task rule, so a broken snapshot (truncated write, params/serialization
drift, accidental overwrite with an untrained run) fails CI instead of
silently shipping a lobotomized agent.

Both artifacts now carry planner-distilled habits, whose teacher is the
planner's root visit distribution (target entropy ~0.95 of max — MCTS
spreads root mass over several good continuations), so absolute edge
P(up) is small; the rule lives in the left/right CONTRAST per class
(measured: squares P(up) left 0.01-0.05 vs right 0.000; ellipse/heart
right 0.02-0.13 vs left 0.000) — the contract asserts the contrast, not
commitment. (The pre-round-4 joint-trainer habit expressed the rule as
near-deterministic edge commitment instead; that contract retired with
the artifact it guarded when the snapshot cadence replaced the epoch-1199
checkpoint.)

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
    # Contrast contract (module docstring): correct side strictly
    # preferred per class, wrong side near zero. Slightly looser than the
    # distilled artifact's (this one is a mid-training hourly snapshot).
    assert left[0] > 2.0 * right[0] + 1e-3, (
        f"square contrast {left[0]:.4f} !> 2x {right[0]:.4f}"
    )
    assert right[0] < 0.08, f"square wrong-side P(up)={right[0]:.4f}"
    for c in (1, 2):  # ellipse, heart
        assert right[c] > 2.0 * left[c] + 1e-3, (
            f"class {c} contrast {right[c]:.4f} !> 2x {left[c]:.4f}"
        )
        assert left[c] < 0.08, f"class {c} wrong-side P(up)={left[c]:.4f}"


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
