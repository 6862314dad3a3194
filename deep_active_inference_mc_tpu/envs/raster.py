"""On-device procedural rasterizer for the dynamic-dSprites environment.

The reference renders frames by table lookup into the 737,280-image dSprites
npz (``/root/reference/src/game_environment.py:10,44-45``). That dataset is a
dense grid over (shape, scale, orientation, posX, posY) where position only
*translates* the sprite by whole pixels (centers span pixels 16..47 of the
64x64 canvas — cf. the demo's visit-density mask being drawn into
``frame[16:48, 16:48]``, ``/root/reference/test_demo.py:210``).

TPU-native design: instead of shipping a 3 GB dataset to HBM we rasterize the
720 unique sprites (3 shapes x 6 scales x 40 orientations) once on device
into a (720, 96, 96) look-up table centered at (48, 48), then render any
frame as a single dynamic-slice per environment. Rendering a batch of
thousands of envs is one gather + slice — no host round-trips, no dataset.

Supersampled inside-tests (4x4 per pixel, thresholded at 0.5) give clean
binary sprites matching dSprites' binary imgs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# dSprites latent grid (reference: game_environment.py:15 metadata
# latents_sizes = [1, 3, 6, 40, 32, 32]).
N_COLOR, N_SHAPE, N_SCALE, N_ORIENT, N_POSX, N_POSY = 1, 3, 6, 40, 32, 32
N_SPRITES = N_SHAPE * N_SCALE * N_ORIENT  # 720 unique (untranslated) sprites

CANVAS = 96  # LUT canvas; sprite centered at (48, 48)
CENTER = 48
RES = 64  # frame resolution
POS_OFFSET = 16  # sprite centers span pixels [16, 48) of the frame

# Shape geometry: absolute pixel units at scale value 1.0. Calibrated against
# REAL dSprites sprites recovered from the reference's demo recording
# (``/root/reference/dsprites.gif`` — genuine dataset frames upscaled
# losslessly 64->500; see scripts/gif_parity.py). Measured laws from 219
# clean recovered sprites:
#   square:  side = 19.2 * scale  (empirical side clusters 11.55/13.49/
#            15.43/17.32/19.19 vs 19.2*linspace(.5,1,6) = 11.52..19.2)
#   ellipse: sqrt(a*b) = 9.64 * scale, aspect b/a = 0.572 (covariance
#            eigenvalues) -> semi-axes (12.74, 7.29) * scale
#   heart:   sqrt(area) = 15.1 * scale; best-fit construction is a 45deg
#            diamond with two circular lobes (shallow notch, round point),
#            beating the classic implicit cubic curve 0.89 vs 0.86 mean IoU
# Per-shape mean IoU vs the recovered sprites: see tests/test_dataset_parity.py.
_SCALE_VALUES = np.linspace(0.5, 1.0, N_SCALE)  # dSprites: 6 values in [0.5,1]
_ORIENT_VALUES = np.linspace(0.0, 2.0 * np.pi, N_ORIENT)  # 40 values in [0,2pi]

_SS = 4  # supersampling factor per axis

_SQUARE_HALF = 9.6
_ELLIPSE_A, _ELLIPSE_B = 12.74, 7.29
_HEART_D, _HEART_YLOBE, _HEART_R = 8.7, 0.4, 0.6


def _inside_square(x, y):
    return jnp.maximum(jnp.abs(x), jnp.abs(y)) <= _SQUARE_HALF


def _inside_ellipse(x, y):
    return (
        jnp.square(x / _ELLIPSE_A) + jnp.square(y / _ELLIPSE_B) <= 1.0
    )


def _inside_heart(x, y):
    # 45deg diamond + two circular lobes (point faces -y in image coords).
    d = _HEART_D
    yy = -y
    diamond = jnp.abs(x) + jnp.abs(yy) <= d
    r2 = (_HEART_R * d) ** 2
    c1 = jnp.square(x - d / 2) + jnp.square(yy - _HEART_YLOBE * d) <= r2
    c2 = jnp.square(x + d / 2) + jnp.square(yy - _HEART_YLOBE * d) <= r2
    return diamond | c1 | c2


def _rasterize_sprite(shape_idx, scale_value, orient):
    """Rasterize one sprite onto the 96x96 canvas. All-traced, jit-friendly."""
    # Supersampled pixel-center offsets from the canvas center.
    n = CANVAS * _SS
    coords = (jnp.arange(n, dtype=jnp.float32) + 0.5) / _SS - 0.5 - CENTER
    ys = coords[:, None]  # rows
    xs = coords[None, :]  # cols
    # Rotate into the sprite frame; shapes are defined in absolute pixel
    # units at scale 1, so dividing by the scale value applies the size law.
    c, s = jnp.cos(orient), jnp.sin(orient)
    xr = (c * xs + s * ys) / scale_value
    yr = (-s * xs + c * ys) / scale_value
    inside = jax.lax.switch(
        shape_idx,
        [
            lambda a, b: _inside_square(a, b),
            lambda a, b: _inside_ellipse(a, b),
            lambda a, b: _inside_heart(a, b),
        ],
        xr,
        yr,
    )
    # Box-filter the supersamples and threshold to binary (dSprites imgs are
    # binary uint8).
    frac = jnp.mean(
        inside.astype(jnp.float32).reshape(CANVAS, _SS, CANVAS, _SS),
        axis=(1, 3),
    )
    return (frac >= 0.5).astype(jnp.float32)


@functools.cache
def build_sprite_lut() -> jax.Array:
    """(720, 96, 96) float32 sprite table, computed once on device.

    Index layout matches the dSprites mixed-radix order restricted to the
    (shape, scale, orientation) sub-grid: idx = shape*240 + scale*40 + orient.
    """
    shape_idx = jnp.arange(N_SPRITES, dtype=jnp.int32) // (N_SCALE * N_ORIENT)
    scale_idx = (jnp.arange(N_SPRITES, dtype=jnp.int32) // N_ORIENT) % N_SCALE
    orient_idx = jnp.arange(N_SPRITES, dtype=jnp.int32) % N_ORIENT
    scale_vals = jnp.asarray(_SCALE_VALUES, dtype=jnp.float32)[scale_idx]
    orient_vals = jnp.asarray(_ORIENT_VALUES, dtype=jnp.float32)[orient_idx]

    @jax.jit
    def _build(shape_idx, scale_vals, orient_vals):
        return jax.lax.map(
            lambda args: _rasterize_sprite(*args),
            (shape_idx, scale_vals, orient_vals),
            batch_size=48,
        )

    lut = _build(shape_idx, scale_vals, orient_vals)
    return jax.block_until_ready(lut)


def sprite_index(latents: jax.Array) -> jax.Array:
    """(shape, scale, orient) latents -> LUT row. ``latents``: (..., 6) int32
    in dSprites order [color, shape, scale, orientation, posX, posY].
    """
    return (
        latents[..., 1] * (N_SCALE * N_ORIENT)
        + latents[..., 2] * N_ORIENT
        + latents[..., 3]
    )


@functools.cache
def _shift_selectors():
    """Shifted identity matrices for window extraction on the MXU.

    Extracting the 64x64 frame window at a per-env offset from the 96x96
    canvas is an *unaligned dynamic slice* — the worst access pattern for
    the TPU's lane-oriented memory (measured ~9 ms per 4096-env render).
    Expressed instead as two batched matmuls with one-hot shift matrices
    (frame = R[r0] @ canvas @ C[c0]) the same extraction runs on the MXU at
    ~0.35 ms — 6.4x faster, bit-exact. 33 possible shifts (offsets 0..32).
    """
    # numpy (not jnp): this is called inside jit traces, and caching traced
    # arrays would leak tracers across traces.
    shifts = np.arange(33)
    rows = np.zeros((33, RES, CANVAS), np.float32)
    cols = np.zeros((33, CANVAS, RES), np.float32)
    for s in shifts:
        for i in range(RES):
            if s + i < CANVAS:
                rows[s, i, s + i] = 1.0
                cols[s, s + i, i] = 1.0
    return rows, cols


def render_sprites(lut: jax.Array, latents: jax.Array) -> jax.Array:
    """Render sprite frames (no reward strip). latents: (B, 6) int32.

    Returns (B, 64, 64, 1) float32 binary frames. Sprite center lands at
    frame pixel (16 + posY, 16 + posX), matching the reference dataset's
    geometry (test_demo.py:87-113 mask arithmetic). Window extraction runs
    as shift-matrix matmuls on the MXU (see _shift_selectors).
    """
    idx = sprite_index(latents)
    row0 = (CENTER - POS_OFFSET) - latents[..., 5]  # 32 - posY
    col0 = (CENTER - POS_OFFSET) - latents[..., 4]  # 32 - posX
    return render_sprites_from_index(lut, idx, row0, col0)


def render_sprites_from_index(
    lut: jax.Array, idx: jax.Array, row0: jax.Array, col0: jax.Array
) -> jax.Array:
    """Shift-matrix render from a precomputed sprite index + window offsets
    (the form the Pallas kernel's SPMD fallback already holds)."""
    base = lut[idx]  # (B, 96, 96) row gather
    r_sel_np, c_sel_np = _shift_selectors()
    r_sel = jnp.asarray(r_sel_np)
    c_sel = jnp.asarray(c_sel_np)
    rows = jnp.einsum(
        "bik,bkl->bil", r_sel[row0], base,
        preferred_element_type=jnp.float32,
    )
    frames = jnp.einsum(
        "bil,blj->bij", rows, c_sel[col0],
        preferred_element_type=jnp.float32,
    )
    return frames[..., None]


def render_sprites_slice(lut: jax.Array, latents: jax.Array) -> jax.Array:
    """Reference-style gather + per-env dynamic slice (slow on TPU; kept as
    the independent oracle for render parity tests)."""
    idx = sprite_index(latents)
    base = lut[idx]
    row0 = (CENTER - POS_OFFSET) - latents[..., 5]
    col0 = (CENTER - POS_OFFSET) - latents[..., 4]

    def slice_one(img, r, c):
        return jax.lax.dynamic_slice(img, (r, c), (RES, RES))

    frames = jax.vmap(slice_one)(base, row0, col0)
    return frames[..., None]


def paint_reward_strip(frames: jax.Array, last_r: jax.Array) -> jax.Array:
    """Overwrite the 3-row reward strip (reference: game_environment.py:48-53).

    If last_r in [0, 1]: rows 0-2, left half := last_r (right half keeps the
    sprite). If last_r in [-1, 0): rows 0-2, right half := -last_r. Works at
    any frame resolution (the 32-res Animal-AI-style variant paints the same
    3-row strip over 16-column halves — torchutils' calc_reward_animalai
    semantics, torchmodel.py:214).
    """
    B, H, W = frames.shape[0], frames.shape[1], frames.shape[2]
    r = last_r.reshape(B, 1, 1, 1)
    rows = jnp.arange(H).reshape(1, H, 1, 1)
    cols = jnp.arange(W).reshape(1, 1, W, 1)
    strip = rows < 3
    left = strip & (cols < W // 2)
    right = strip & (cols >= W // 2)
    frames = jnp.where(left & (r >= 0.0), r, frames)
    frames = jnp.where(right & (r < 0.0), -r, frames)
    return frames
