"""Rasterizer parity against REAL dSprites sprites.

The reference renders by lookup into the actual dSprites npz
(``/root/reference/src/game_environment.py:10,44-45``). That dataset is not
present in the snapshot and there is no network egress, but the reference
ships ``dsprites.gif`` — a 1001-frame recording of the original demo, i.e.
genuine dataset sprites upscaled 64->500 (losslessly recoverable: both
nearest and bilinear upscales round-trip bit-exactly through pixel-center
sampling + thresholding; measured in round 2).

``tests/data/gif_sprites.npz`` holds 219 clean recovered sprites (demo
overlay rows masked, frames with MCTS path overlays or truncated sprites
dropped) plus the best-matching latents under the calibrated geometry
(scripts/gif_parity.py). This test re-renders those latents with the
production renderer and asserts the measured agreement:

  mean IoU 0.909 (square 0.914 / ellipse 0.925 / heart 0.895),
  mean pixel agreement 99.54% over the unmasked frame rows.

Residual (documented, cannot be closed from the GIF alone): the exact
generator geometry of dSprites is not published; the calibrated shape laws
(square side 19.2*scale; ellipse semi-axes (12.74, 7.29)*scale; heart =
45-degree diamond + two circular lobes) reproduce real sprites to a ~1-pixel
boundary shell. Boundary-shell differences move <0.5% of pixels and no
reward/dynamics bit (reward is painted rows 0-2; dynamics never read
pixels), so they cannot change environment behavior — only the VAE's target
statistics, which the NLL anchors absorb.
"""

from pathlib import Path

import jax
import numpy as np
import pytest

from deep_active_inference_mc_tpu.envs import raster

DATA = Path(__file__).parent / "data" / "gif_sprites.npz"


@pytest.fixture(scope="module")
def gif_set():
    d = np.load(DATA)
    sprites = np.unpackbits(d["sprites"], axis=-1).astype(np.float32)
    return sprites, d["latents"], int(d["row_lo"]), int(d["row_hi"])


def test_render_matches_real_dsprites(gif_set):
    sprites, latents, row_lo, row_hi = gif_set
    lut = raster.build_sprite_lut()
    frames = np.array(
        jax.device_get(raster.render_sprites(lut, latents))
    )[..., 0]
    # Mask the demo-overlay rows exactly as in the recovery.
    frames[:, :row_lo] = 0
    frames[:, row_hi:] = 0
    ref = sprites.copy()
    ref[:, :row_lo] = 0
    ref[:, row_hi:] = 0

    inter = (frames * ref).sum((1, 2))
    union = frames.sum((1, 2)) + ref.sum((1, 2)) - inter
    iou = inter / np.maximum(union, 1.0)
    agree = (frames == ref)[:, row_lo:row_hi].mean(axis=(1, 2))

    shape_of = latents[:, 1]
    means = {s: iou[shape_of == s].mean() for s in (0, 1, 2)}
    assert iou.mean() >= 0.89, (iou.mean(), means)
    assert means[0] >= 0.89 and means[1] >= 0.90 and means[2] >= 0.87, means
    assert agree.mean() >= 0.99, agree.mean()
    assert agree.min() >= 0.985, agree.min()


def test_size_laws(gif_set):
    """The calibrated size laws hold on the rendered LUT itself."""
    lut = np.asarray(jax.device_get(raster.build_sprite_lut()))
    scales = np.linspace(0.5, 1.0, 6)
    # square sides (area is rotation-invariant)
    for si, sv in enumerate(scales):
        side = np.sqrt(lut[0 * 240 + si * 40 + 7].sum())
        assert abs(side - 19.2 * sv) < 0.6, (si, side)
    # ellipse geometric-mean diameter
    for si, sv in enumerate(scales):
        gm = np.sqrt(lut[1 * 240 + si * 40 + 0].sum() / np.pi)
        assert abs(gm - 9.64 * sv) < 0.5, (si, gm)
    # heart area law
    for si, sv in enumerate(scales):
        sa = np.sqrt(lut[2 * 240 + si * 40 + 0].sum())
        assert abs(sa - 15.1 * sv) < 0.8, (si, sa)
