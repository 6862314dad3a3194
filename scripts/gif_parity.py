"""Measure pixel parity between the procedural rasterizer and REAL dSprites
sprites, recovered from the reference's demo recording.

The actual dSprites npz (737,280 binary 64x64 images,
``/root/reference/src/game_environment.py:10-11``) is not present in the
reference snapshot and this environment has no network egress — but the
reference ships ``dsprites.gif``: a 1001-frame 500x500 recording of the
original OpenCV demo, i.e. genuine dataset sprites upscaled from 64x64
(500/64 = 7.8125). This script:

  1. recovers each 64x64 binary frame by sampling the upscaled image at
     pixel centers and thresholding at 128;
  2. masks the demo overlays (reward strip rows 0-2, score text rows 3-5,
     score marker rows >= 58), keeps the largest connected component, and
     DROPS frames where thin structures (the MCTS visit-path overlay or the
     score marker) are attached to the sprite (binary opening leaves residue)
     or where the sprite is truncated by the row mask;
  3. exhaustively matches the sprite against all 720 procedural LUT sprites
     x 33x33 positions (FFT cross-correlation, same row masking applied to
     candidates) and records the best IoU + latents;
  4. writes the recovered frames + matched latents to
     ``tests/data/gif_sprites.npz`` for the committed regression test
     (tests/test_dataset_parity.py) and prints the agreement statistics.

Usage: python scripts/gif_parity.py [--frames-step 5] [--out PATH]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

GIF = Path("/root/reference/dsprites.gif")
RES = 64
CANVAS = 96
# Demo overlays to mask out (frame rows): reward strip 0-2
# (game_environment.py:48-53), score text ~rows 3-5, score marker >= 58.
ROW_LO, ROW_HI = 6, 58


def recover_frames(step: int) -> np.ndarray:
    from PIL import Image

    im = Image.open(GIF)
    n = im.n_frames
    idx = np.floor((np.arange(RES) + 0.5) * im.size[0] / RES).astype(int)
    frames = []
    for i in range(0, n, step):
        im.seek(i)
        a = np.asarray(im.convert("L"))
        frames.append((a[np.ix_(idx, idx)] >= 128).astype(np.uint8))
    return np.stack(frames)


def largest_component(mask: np.ndarray) -> np.ndarray:
    from scipy import ndimage

    lab, n = ndimage.label(mask, structure=np.ones((3, 3), int))
    if n == 0:
        return np.zeros_like(mask)
    areas = ndimage.sum_labels(mask, lab, index=np.arange(1, n + 1))
    return (lab == (1 + int(np.argmax(areas)))).astype(np.uint8)


def clean_sprite(frame: np.ndarray):
    """Extract the sprite from a recovered frame, or None if contaminated.

    Drops frames where a thin overlay (MCTS visit path, score marker) is
    fused to the sprite — a 3x3 binary opening removes <=2 px structures,
    so any residue outside the dilated opening marks contamination — and
    frames whose sprite touches the masked rows (truncated geometry)."""
    from scipy import ndimage

    st3 = np.ones((3, 3), int)
    masked = frame.copy()
    masked[:ROW_LO] = 0
    masked[ROW_HI:] = 0
    spr = largest_component(masked)
    if spr.sum() < 20:
        return None
    opened = ndimage.binary_opening(spr, structure=st3)
    extra = spr & ~ndimage.binary_dilation(opened, structure=st3)
    if extra.sum() > 2:
        return None
    ys, _ = np.nonzero(spr)
    if ys.min() <= ROW_LO or ys.max() >= ROW_HI - 1:
        return None
    return spr


def match_all(frames: np.ndarray):
    """Best (IoU, latents) per frame over 720 sprites x 33x33 positions."""
    import jax

    jax.config.update("jax_platforms", "cpu")  # keep the TPU tunnel free
    from deep_active_inference_mc_tpu.envs import raster

    lut = np.asarray(jax.device_get(raster.build_sprite_lut()), np.float32)

    F = 128  # FFT size >= 96 + 33
    lut_f = np.fft.rfft2(lut, s=(F, F))  # (720, F, F//2+1)
    # Valid-row area per candidate row offset r0: canvas rows
    # [r0+ROW_LO, r0+ROW_HI) land in unmasked frame rows.
    row_cum = np.concatenate(
        [np.zeros((lut.shape[0], 1), np.float32), np.cumsum(lut.sum(2), 1)], 1
    )  # (720, 97)
    r0s = np.arange(33)
    area_valid = (
        row_cum[:, np.clip(r0s + ROW_HI, 0, CANVAS)]
        - row_cum[:, np.clip(r0s + ROW_LO, 0, CANVAS)]
    )  # (720, 33)

    results = []
    for f in frames:
        sprite = clean_sprite(f)
        if sprite is None:
            results.append(None)
            continue
        a_f = float(sprite.sum())
        ff = np.fft.rfft2(sprite.astype(np.float32), s=(F, F)).conj()
        # corr[s, r0, c0] = sum_{fr,fc} sprite[fr, fc] * lut[s, fr+r0, fc+c0]
        corr = np.fft.irfft2(lut_f * ff[None], s=(F, F))[:, :33, :33]
        inter = np.maximum(corr, 0.0)
        union = a_f + area_valid[:, :, None] - inter
        iou = inter / np.maximum(union, 1.0)
        s, r0, c0 = np.unravel_index(np.argmax(iou), iou.shape)
        # row0 = 32 - posY, col0 = 32 - posX (raster.render_sprites).
        posy, posx = 32 - int(r0), 32 - int(c0)
        if not (0 <= posx < 32 and 0 <= posy < 32):
            results.append(None)
            continue
        lat = np.array(
            [0, s // 240, (s // 40) % 6, s % 40, posx, posy], np.int32
        )
        results.append((float(iou[s, r0, c0]), lat, sprite))
    return results


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--frames-step", type=int, default=5)
    p.add_argument(
        "--out", type=Path, default=Path("tests/data/gif_sprites.npz")
    )
    p.add_argument("--min-iou", type=float, default=0.0,
                   help="Keep matches above this for the regression set "
                        "(default: keep every clean sprite).")
    args = p.parse_args(argv)

    frames = recover_frames(args.frames_step)
    print(f"{len(frames)} frames recovered from {GIF}")
    results = match_all(frames)
    ious = np.array([r[0] for r in results if r is not None])
    print(
        f"matched {len(ious)}/{len(results)}  "
        f"IoU mean={ious.mean():.4f} median={np.median(ious):.4f} "
        f"p10={np.percentile(ious, 10):.4f} min={ious.min():.4f}  "
        f">=0.9: {(ious >= 0.9).mean():.1%}  >=0.95: {(ious >= 0.95).mean():.1%}"
    )
    keep = [r for r in results if r is not None and r[0] >= args.min_iou]
    sprites = np.stack([r[2] for r in keep])
    latents = np.stack([r[1] for r in keep])
    iou_kept = np.array([r[0] for r in keep], np.float32)
    args.out.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(
        args.out,
        sprites=np.packbits(sprites, axis=-1),
        latents=latents,
        iou=iou_kept,
        row_lo=ROW_LO,
        row_hi=ROW_HI,
    )
    print(f"wrote {len(keep)} frames (IoU >= {args.min_iou}) to {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
