"""Regression guard on the committed trained checkpoint.

The behavioral deliverable (a trained agent that sorts squares LEFT and
ellipses/hearts RIGHT — reference README.md:1-5) lives in
``artifacts/run512/checkpoints``. This test loads it and asserts the habit
net's scoring-edge policy encodes the task rule, so a broken snapshot
(truncated write, params/serialization drift, accidental overwrite with an
untrained run) fails CI instead of silently shipping a lobotomized agent.

Skipped when the artifact is absent (fresh clones before a training run).
"""

from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

RUN = Path(__file__).parent.parent / "artifacts" / "run512"
ARTIFACT = RUN / "checkpoints"

# ``checkpoints_distilled`` is the round-4 MCTS-visit-distilled habit
# (apps/distill.py) on the same mid/down weights — the best amortized
# policy artifact (habit sweep +0.9 vs +0.26 for the joint-trainer habit).
# Both snapshots must encode the task rule; each is skipped when absent.
CKPTS = [p for p in (ARTIFACT, RUN / "checkpoints_distilled") if p.exists()]


@pytest.mark.skipif(not CKPTS, reason="no committed checkpoint")
@pytest.mark.parametrize(
    "artifact", CKPTS, ids=[p.name for p in CKPTS]
)
def test_habit_edge_policy_encodes_sorting_rule(artifact):
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
    params = state.params
    lut = raster.build_sprite_lut()

    # Objects of every class on both sides of the scoring edge (posY=31):
    # deep on each half (posX 4/6/8 vs 23/25/27), mid scale.
    posx = jnp.asarray([4, 6, 8, 23, 25, 27], jnp.int32)
    shp = jnp.asarray([0, 1, 2], jnp.int32)
    SH, PX = jnp.meshgrid(shp, posx, indexing="ij")
    lat = jnp.stack(
        [jnp.zeros_like(SH), SH, jnp.full_like(SH, 3), jnp.zeros_like(SH),
         PX, jnp.full_like(SH, 31)], axis=-1,
    ).reshape(-1, 6)
    n = lat.shape[0]
    env = env_lib.EnvState(
        latents=lat, score=jnp.zeros((n,)), last_r=jnp.zeros((n,))
    )
    o = env_lib.render_obs(lut, env, cfg.resolution)

    q_pi = np.asarray(agent.habitual_net(params, o)).reshape(3, 6, 4)
    p_up = q_pi[..., 0]
    p_up_left = p_up[:, :3].mean(-1)   # per class, left-half positions
    p_up_right = p_up[:, 3:].mean(-1)  # per class, right-half positions

    # Task rule (game_environment.py:119-134): squares score positive on
    # the LEFT half, ellipses/hearts on the RIGHT. Trained anchor (epoch
    # 1086, docs/STATUS.md): P(up|correct side)=1.00, P(up|wrong)~0.19 —
    # assert with generous margins so later fine-tunes don't flake.
    assert p_up_left[0] > 0.6, f"square left-edge P(up)={p_up_left[0]:.3f}"
    assert p_up_left[0] - p_up_right[0] > 0.25, (
        f"square side gap {p_up_left[0]:.3f} vs {p_up_right[0]:.3f}"
    )
    for c in (1, 2):  # ellipse, heart
        assert p_up_right[c] > 0.6, f"class {c} right-edge P(up)={p_up_right[c]:.3f}"
        assert p_up_right[c] - p_up_left[c] > 0.25, (
            f"class {c} side gap {p_up_right[c]:.3f} vs {p_up_left[c]:.3f}"
        )
