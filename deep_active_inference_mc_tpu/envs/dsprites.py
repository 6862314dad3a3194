"""Dynamic-dSprites sorting environment as pure jit/vmap-able functions.

TPU-native rebuild of the reference ``Game`` class
(``/root/reference/src/game_environment.py``). State is a pytree of batched
arrays living in HBM; every transition rule from the reference is encoded as
branchless array arithmetic so thousands of environments step in lockstep
under one ``jax.jit``:

  - actions: 0=up (posY+1), 1=down (posY-1, floor 0), 2=left (posX+1, cap 31),
    3=right (posX-1, floor 0) — note the reference's intentionally swapped
    left/right axis naming (game_environment.py:144-152).
  - every action decays last_r *= 0.95 (game_environment.py:113-117).
  - crossing the top edge (posY reaching 32) scores the object
    (game_environment.py:119-137): squares earn (16-posX)/16 on the left half
    and (15-posX)/16 (negative) on the right; ellipses/hearts the mirror
    image. The reward accumulates into the score, becomes last_r, and a fresh
    random object spawns keeping the score.
  - action-repeat aborts after a scoring step (game_environment.py:154-169),
    expressed here as a masked lax.scan.

The task: sort squares to the top-left, ellipses/hearts to the top-right.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from deep_active_inference_mc_tpu.envs import raster

LATENT_SIZES = (1, 3, 6, 40, 32, 32)  # color, shape, scale, orient, posX, posY
NUM_ACTIONS = 4
REWARD_DECAY = 0.95


@struct.dataclass
class EnvState:
    """Batched environment state (all leaves have leading batch dim B)."""

    latents: jax.Array  # (B, 6) int32 — dSprites latent indices
    score: jax.Array  # (B,) float32 — cumulative score (current_s slot 6)
    last_r: jax.Array  # (B,) float32 — last reward, painted into the frame

    @property
    def batch(self) -> int:
        return self.latents.shape[0]


def sample_latents(key: jax.Array, batch: int) -> jax.Array:
    """Uniform latents over the dSprites grid (game_environment.py:27-37)."""
    keys = jax.random.split(key, 6)
    cols = [
        jax.random.randint(keys[i], (batch,), 0, LATENT_SIZES[i], jnp.int32)
        for i in range(6)
    ]
    return jnp.stack(cols, axis=-1)


def reset(key: jax.Array, batch: int) -> EnvState:
    """Fresh envs with zero score and zero last reward
    (game_environment.py:21,83-88: new_image_all at construction)."""
    return EnvState(
        latents=sample_latents(key, batch),
        score=jnp.zeros((batch,), jnp.float32),
        last_r=jnp.zeros((batch,), jnp.float32),
    )


def randomize(key: jax.Array, state: EnvState) -> EnvState:
    """Randomize latents, score ~ U(-10,10) and last_r ~ U(-1,1)
    (game_environment.py:68-76). Reward randomization forces the VAE to
    encode the reward strip as a latent dimension."""
    k1, k2, k3 = jax.random.split(key, 3)
    batch = state.batch
    return EnvState(
        latents=sample_latents(k1, batch),
        score=jax.random.uniform(k2, (batch,), jnp.float32, -10.0, 10.0),
        last_r=jax.random.uniform(k3, (batch,), jnp.float32, -1.0, 1.0),
    )


def _respawn_latents(key: jax.Array, latents: jax.Array) -> jax.Array:
    """new_image: fresh random object (game_environment.py:78-81)."""
    return sample_latents(key, latents.shape[0])


def _scoring_reward(shape_idx: jax.Array, pos_x: jax.Array) -> jax.Array:
    """Reward when an object crosses the top edge (game_environment.py:122-134).

    Squares: +(16-posX)/16 for posX<=15, (15-posX)/16 (negative) for posX>15.
    Ellipses/hearts: the exact mirror (sign flipped).
    """
    px = pos_x.astype(jnp.float32)
    square_r = jnp.where(px > 15.0, (15.0 - px) / 16.0, (16.0 - px) / 16.0)
    return jnp.where(shape_idx == 0, square_r, -square_r)


def step(
    key: jax.Array, state: EnvState, action: jax.Array
) -> Tuple[EnvState, jax.Array]:
    """One environment step for every env in the batch.

    Args:
      key: PRNG key (consumed for object respawn on scoring).
      state: batched EnvState.
      action: (B,) int32 in [0, 4).
    Returns:
      (new_state, scored) where scored is a (B,) bool mask of envs whose
      object crossed the top edge this step.
    """
    latents = state.latents
    pos_x = latents[..., 4]
    pos_y = latents[..., 5]
    shape_idx = latents[..., 1]

    is_up = action == 0
    is_down = action == 1
    is_left = action == 2
    is_right = action == 3

    # tick: every action decays the displayed reward.
    last_r = state.last_r * REWARD_DECAY

    scored = is_up & (pos_y + 1 >= raster.N_POSY)
    reward = _scoring_reward(shape_idx, pos_x)

    new_pos_y = jnp.where(is_up & ~scored, pos_y + 1, pos_y)
    new_pos_y = jnp.where(is_down, jnp.maximum(pos_y - 1, 0), new_pos_y)
    new_pos_x = jnp.where(
        is_left, jnp.minimum(pos_x + 1, raster.N_POSX - 1), pos_x
    )
    new_pos_x = jnp.where(is_right, jnp.maximum(pos_x - 1, 0), new_pos_x)

    moved = latents.at[..., 4].set(new_pos_x).at[..., 5].set(new_pos_y)
    respawned = _respawn_latents(key, latents)
    new_latents = jnp.where(scored[..., None], respawned, moved)

    new_last_r = jnp.where(scored, reward, last_r)
    new_score = jnp.where(scored, state.score + reward, state.score)

    return (
        EnvState(latents=new_latents, score=new_score, last_r=new_last_r),
        scored,
    )


def step_repeated(
    key: jax.Array, state: EnvState, action: jax.Array, repeats: int
) -> Tuple[EnvState, jax.Array]:
    """pi_to_action with action-repeat: repeat ``repeats`` times per env but
    freeze an env once it scores (game_environment.py:154-169 returns early
    after a round change)."""

    def body(carry, sub_key):
        st, done = carry
        new_st, scored = step(sub_key, st, action)
        # Envs that already scored keep their state frozen this repeat-loop.
        keep = done
        st = jax.tree.map(
            lambda old, new: jnp.where(
                keep.reshape((-1,) + (1,) * (new.ndim - 1)), old, new
            ),
            st,
            new_st,
        )
        done = done | scored
        return (st, done), None

    done0 = jnp.zeros((state.batch,), bool)
    (state, done), _ = jax.lax.scan(
        body, (state, done0), jax.random.split(key, repeats)
    )
    return state, done


def _pallas_render_eligible(batch: int) -> bool:
    """Use the fused Pallas kernel on TPU with block-aligned batches; the
    XLA shift-matrix path covers CPU. Multi-device meshes are handled by the
    kernel's custom_partitioning rule (each device renders its batch shard;
    ops/pallas/render.py). DAIF_NO_PALLAS=1 forces the XLA path — an
    operational escape hatch for isolating suspected kernel faults."""
    import os

    from deep_active_inference_mc_tpu.ops.pallas import render as prender

    if os.environ.get("DAIF_NO_PALLAS"):
        return False
    return jax.default_backend() == "tpu" and batch % prender.BLK == 0


def render(lut: jax.Array, state: EnvState) -> jax.Array:
    """(B, 64, 64, 1) float32 frames: sprite + reward strip
    (game_environment.py:44-66). Dispatches to the fused Pallas kernel
    where eligible (bit-identical outputs; tests/test_pallas_render.py)."""
    if _pallas_render_eligible(state.latents.shape[0]):
        from deep_active_inference_mc_tpu.ops.pallas import render as prender

        return prender.render_frames(state.latents, state.last_r)
    frames = raster.render_sprites(lut, state.latents)
    return raster.paint_reward_strip(frames, state.last_r)


# 3-action (Animal-AI-style) variant: agent action space {0, 1, 2} maps to
# env moves {up, left, right} — 'down' is dropped, and (1, 2) are the
# opposite pair, matching the reference's pi_dim=3 trim rule
# (/root/reference/src/mcts.py:119-124) and pi_one_hot_3
# (torchmodel.py:164-165).
ACTIONS_3 = (0, 2, 3)


def to_env_actions(actions: jax.Array, pi_dim: int = 4) -> jax.Array:
    """Map agent-space action indices to env moves for variant action sets."""
    if pi_dim == 4:
        return actions
    if pi_dim == 3:
        return jnp.asarray(ACTIONS_3, jnp.int32)[actions]
    raise ValueError(f"Unknown pi_dim {pi_dim}")


def render_obs(
    lut: jax.Array, state: EnvState, resolution: int = 64, channels: int = 1
) -> jax.Array:
    """Render observations at the configured resolution.

    64: the reference dSprites frame (``render``). 32: the Animal-AI-style
    variant (torchmodel.py:77-82) — 2x2 max-pool of the binary sprite frame
    (keeps it binary), reward strip painted at 32-res.

    channels=3 broadcasts the grayscale frame to RGB — the observation
    carrier for the reference's colour model configuration
    (torchmodel.py:77-82, colour_channels=3 for Animal-AI inputs; the
    dSprites env itself is monochrome)."""
    if resolution == 64:
        o = render(lut, state)
    elif resolution == 32:
        frames = raster.render_sprites(lut, state.latents)
        B = frames.shape[0]
        pooled = frames.reshape(B, 32, 2, 32, 2, 1).max(axis=(2, 4))
        o = raster.paint_reward_strip(pooled, state.last_r)
    else:
        raise ValueError(f"Unknown resolution {resolution}")
    if channels == 1:
        return o
    return jnp.broadcast_to(o, o.shape[:-1] + (channels,))


def ground_truth_factors(state: EnvState) -> jax.Array:
    """(B, 6) [shape, scale, orientation, posX, posY, last_r] — the eval
    ground truth used for disentanglement metrics (util.py:14-17: S_real is
    current_s[1:] with last_r substituted into the final slot)."""
    return jnp.concatenate(
        [
            state.latents[..., 1:6].astype(jnp.float32),
            state.last_r[..., None],
        ],
        axis=-1,
    )


def expert_policy(state: EnvState, randomness: float = 0.4) -> jax.Array:
    """Ground-truth expert action distribution (game_environment.py:94-104):
    squares want up+right, ellipses/hearts want up+left."""
    right = 0.5 * (1.0 - randomness / 2.0)
    wrong = 0.5 * randomness / 2.0
    square = jnp.asarray([right, wrong, wrong, right], jnp.float32)
    other = jnp.asarray([right, wrong, right, wrong], jnp.float32)
    is_square = (state.latents[..., 1] == 0)[..., None]
    return jnp.where(is_square, square, other)


def auto_play(
    key: jax.Array, state: EnvState, randomness: float = 0.4
) -> Tuple[EnvState, jax.Array]:
    """Sample actions from the expert policy and step once
    (game_environment.py:107-111)."""
    k_pi, k_step = jax.random.split(key)
    ppi = expert_policy(state, randomness)
    actions = jax.random.categorical(k_pi, jnp.log(ppi + 1e-20), axis=-1)
    new_state, _ = step(k_step, state, actions)
    return new_state, actions
