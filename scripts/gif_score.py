"""Read the reference agent's ACTUAL score trajectory out of its demo
recording — the only ground-truth behavioral anchor in this offline sandbox.

The reference ships ``/root/reference/dsprites.gif``: 1001 frames of its
trained agent playing, recorded from the interactive demo, with the running
round score rendered into every frame (``test_demo.py:219-231``:
``plt.text(15, 25, f"score: {game.get_reward(0)} (...)")``; the score itself
is the graded crossing reward, +-(distance from center)/16 per scoring event
— ``game_environment.py:118-140``).  ``scripts/gif_parity.py`` masks those
rows out to recover sprites; this script decodes them instead.

Method (all exact, no fuzzy OCR):
  1. crop the score-text band (500-res rows 24:48), threshold at 220 — the
     reward-strip gray is 186, text/sprites are 255;
  2. isolate the first number: columns from the first ink after the fixed
     "score: " prefix (x >= 88) up to the first >=12-column gap (the gap to
     the "(rate)" group; intra-number gaps are <= 8, after the narrow "1");
  3. reject frames where the sprite walked into the band: digits have no
     descenders, so any ink below band row 18 inside the number's columns is
     contamination (33/1001 frames);
  4. split the number into glyphs at blank columns and match each against
     the embedded templates.  Matplotlib's text rendering in the recording
     is pixel-deterministic: every character renders IDENTICALLY in all
     1001 frames (verified: exactly one bitmap variant per character), so
     matching is exact equality;
  5. fill rejected frames by neighbor consensus (score is piecewise
     constant; a gap whose two clean ends agree takes that value).

The glyph templates below were bootstrapped from the recording itself: the
16 distinct clean number bitmaps were segmented and labeled once by eye,
then every character occurrence was verified bit-identical.

Usage: python scripts/gif_score.py [--out tests/data/gif_scores.npz]
"""

from __future__ import annotations

import argparse
import base64
import io
import sys
from pathlib import Path

import numpy as np

GIF = Path("/root/reference/dsprites.gif")

# np.savez_compressed of {"c_<ord>": uint8 bitmap} — one 24-row template per
# character in "0123456789." (see module docstring for provenance).
_TEMPLATES_B64 = """\
UEsDBC0AAAAIAAAAIQBuOoix//////////8IABQAY180OC5ucHkBABAAuAEAAAAAAAB2AAAAAAAA
AJvsF+obEMnIUMZQrZ6SWpxcpG6loF5Taqiuo6Cell9UUpSYF59flJIKEndLzClOBYoXZyQWpAL5
GkYmOgqGxpo6CrUKZAIuBhBgZGRkYICxwACZDeZBKAgPWQFCL14OIyOaFYQ4+I1mQHYBqkNRvADj
MlAdAABQSwMELQAAAAgAAAAhAMWyQwv//////////wgAFABjXzQ2Lm5weQEAEAD4AAAAAAAAAFQA
AAAAAAAAm+wX6hsQychQxlCtnpJanFykbqWgXlNqqK6joJ6WX1RSlJgXn1+UkgoSd0vMKU4Fihdn
JBakAvkaRiY6CqaaOgq1CuQCLgbqAEZGRhCGkmAufgAAUEsDBC0AAAAIAAAAIQDr3uD8////////
//8IABQAY181NC5ucHkBABAAuAEAAAAAAAB9AAAAAAAAAJvsF+obEMnIUMZQrZ6SWpxcpG6loF5T
aqiuo6Cell9UUpSYF59flJIKEndLzClOBYoXZyQWpAL5GkYmOgqGxpo6CrUKZAIuBhBgZGRkgAJG
KEBmM8LYEApGgmhUzajaMfXDuMiCDMjKkQxD5jGiceAuQDgHi01ILmKgOgAAUEsDBC0AAAAIAAAA
IQBmFWIs//////////8IABQAY181Ni5ucHkBABAAuAEAAAAAAAB7AAAAAAAAAJvsF+obEMnIUMZQ
rZ6SWpxcpG6loF5Taqiuo6Cell9UUpSYF59flJIKEndLzClOBYoXZyQWpAL5GkYmOgqGxpo6CrUK
ZAIuBiBgBAIGCGCEAWQ2I5QNUwpXDuUwwjkoelA5DNjYGAYgG43hLAZMKZgBaC5FUYDQSUUAAFBL
AwQtAAAACAAAACEARS9/rf//////////CAAUAGNfNTUubnB5AQAQALgBAAAAAAAAXwAAAAAAAACb
7BfqGxDJyFDGUK2eklqcXKRupaBeU2qorqOgnpZfVFKUmBefX5SSChJ3S8wpTgWKF2ckFqQC+RpG
JjoKhsaaOgq1CmQCLgZGBEBmo/EYYACNPXAS6KqwSwB5DDQBAFBLAwQtAAAACAAAACEATnfK5v//
////////CAAUAGNfNTMubnB5AQAQALgBAAAAAAAAewAAAAAAAACb7BfqGxDJyFDGUK2eklqcXKRu
paBeU2qorqOgnpZfVFKUmBefX5SSChJ3S8wpTgWKF2ckFqQC+RpGJjoKhsaaOgq1CmQCLgYGRihg
YECwwTxGNBkGOEDnMMIF0PXAeciGAklcBqHagaQMxQoGZBuQrIFbhFCOrJOaAABQSwMELQAAAAgA
AAAhAJu5PLP//////////wgAFABjXzQ5Lm5weQEAEAAQAQAAAAAAAFsAAAAAAAAAm+wX6hsQychQ
xlCtnpJanFykbqWgXlNqqK6joJ6WX1RSlJgXn1+UkgoSd0vMKU4FihdnJBakAvkaRiY6CmaaOgq1
CuQCLgYgYAQTjIxgAgUApcDiVCAhthAEAFBLAwQtAAAACAAAACEA7AumV///////////CAAUAGNf
NTAubnB5AQAQALgBAAAAAAAAdQAAAAAAAACb7BfqGxDJyFDGUK2eklqcXKRupaBeU2qorqOgnpZf
VFKUmBefX5SSChJ3S8wpTgWKF2ckFqQC+RpGJjoKhsaaOgq1CmQCLgYgYAQBBgY4E8pjZETiIVNw
5VAOXCuQQBjDAANobEZcbEZK2DCXMuLiMVAXAABQSwMELQAAAAgAAAAhAK/j9OH//////////wgA
FABjXzUxLm5weQEAEAC4AQAAAAAAAHcAAAAAAAAAm+wX6hsQychQxlCtnpJanFykbqWgXlNqqK6j
oJ6WX1RSlJgXn1+UkgoSd0vMKU4FihdnJBakAvkaRiY6CobGmjoKtQpkAi4GBkYYYEBio/EYoACZ
zYDGxqkITQpJkgGdgybFiKKNEUkCymOEcRAORXM0uo3UAgBQSwMELQAAAAgAAAAhADq87nf/////
/////wgAFABjXzUyLm5weQEAEAC4AQAAAAAAAHUAAAAAAAAAm+wX6hsQychQxlCtnpJanFykbqWg
XlNqqK6joJ6WX1RSlJgXn1+UkgoSd0vMKU4FihdnJBakAvkaRiY6CobGmjoKtQpkAi4GKGBkQABG
RkZkNnYOIxKHEYnDiMaBmwamoRxGdA5MFyMjDh42txHLQfEclQAAUEsDBC0AAAAIAAAAIQCvzBhP
//////////8IABQAY181Ny5ucHkBABAAoAEAAAAAAAB6AAAAAAAAAJvsF+obEMnIUMZQrZ6SWpxc
pG6loF5Taqiuo6Cell9UUpSYF59flJIKEndLzClOBYoXZyQWpAL5GkYmOgqGRpo6CrUKZAIuBhBg
ZGRggDIgAIkJ5KCTUJUMUCYDQhOcg8FGGAETRGYzILNh6uHuQrIXTSuGThQzqAEAUEsBAi0DLQAA
AAgAAAAhAG46iLF2AAAAuAEAAAgAAAAAAAAAAAAAAIABAAAAAGNfNDgubnB5UEsBAi0DLQAAAAgA
AAAhAMWyQwtUAAAA+AAAAAgAAAAAAAAAAAAAAIABsAAAAGNfNDYubnB5UEsBAi0DLQAAAAgAAAAh
AOve4Px9AAAAuAEAAAgAAAAAAAAAAAAAAIABPgEAAGNfNTQubnB5UEsBAi0DLQAAAAgAAAAhAGYV
Yix7AAAAuAEAAAgAAAAAAAAAAAAAAIAB9QEAAGNfNTYubnB5UEsBAi0DLQAAAAgAAAAhAEUvf61f
AAAAuAEAAAgAAAAAAAAAAAAAAIABqgIAAGNfNTUubnB5UEsBAi0DLQAAAAgAAAAhAE53yuZ7AAAA
uAEAAAgAAAAAAAAAAAAAAIABQwMAAGNfNTMubnB5UEsBAi0DLQAAAAgAAAAhAJu5PLNbAAAAEAEA
AAgAAAAAAAAAAAAAAIAB+AMAAGNfNDkubnB5UEsBAi0DLQAAAAgAAAAhAOwLpld1AAAAuAEAAAgA
AAAAAAAAAAAAAIABjQQAAGNfNTAubnB5UEsBAi0DLQAAAAgAAAAhAK/j9OF3AAAAuAEAAAgAAAAA
AAAAAAAAAIABPAUAAGNfNTEubnB5UEsBAi0DLQAAAAgAAAAhADq87nd1AAAAuAEAAAgAAAAAAAAA
AAAAAIAB7QUAAGNfNTIubnB5UEsBAi0DLQAAAAgAAAAhAK/MGE96AAAAoAEAAAgAAAAAAAAAAAAA
AIABnAYAAGNfNTcubnB5UEsFBgAAAAALAAsAUgIAAFAHAAAAAA=="""


def load_templates() -> dict:
    raw = base64.b64decode(_TEMPLATES_B64)
    npz = np.load(io.BytesIO(raw))
    return {chr(int(k[2:])): npz[k] for k in npz.files}


def first_number_bitmap(frame_l: np.ndarray):
    """(bitmap, clean) for the first score number of one 500x500 L frame."""
    band = (frame_l[24:48, 88:400] >= 220).astype(np.uint8)
    cols = band.sum(0)
    nz = np.nonzero(cols)[0]
    if not len(nz):
        return None, False
    x0 = int(nz[0])
    end = None
    run = 0
    for x in range(x0, band.shape[1]):
        if cols[x] == 0:
            run += 1
            if run >= 12:
                end = x - run + 1
                break
        else:
            run = 0
    bm = band[:, x0:end]
    clean = bm[19:].sum() == 0 and bm.shape[1] <= 120
    return bm, bool(clean)


def decode_number(bm: np.ndarray, templates: dict):
    """Exact glyph-by-glyph decode of a clean number bitmap, or None."""
    cols = bm.sum(0)
    nzc = np.nonzero(cols)[0]
    if not len(nzc):
        return None
    segs = np.split(nzc, np.where(np.diff(nzc) > 1)[0] + 1)
    out = []
    for seg in segs:
        g = bm[:, seg[0]:seg[-1] + 1]
        for ch, t in templates.items():
            if g.shape == t.shape and (g == t).all():
                out.append(ch)
                break
        else:
            return None
    try:
        return float("".join(out))
    except ValueError:
        return None


def load_pixel_templates() -> dict:
    """Templates for THIS rebuild's ``--record_ref`` recordings: the demo
    paints its score overlay with the deterministic pixel font in
    ``viz/scoretext.py`` (this freetype's matplotlib glyphs split/merge
    under the 220 threshold, so the reference's template set cannot apply
    to locally rendered text). Renderer and decoder share one font table,
    and a recording's decode is verifiable against the exact score trace
    the demo saves alongside (``<gif>.scores.npz``)."""
    sys.path.insert(0, str(Path(__file__).parent.parent))
    from deep_active_inference_mc_tpu.viz import scoretext

    return {ch: t.astype(np.uint8) for ch, t in scoretext.templates().items()}


def decode_gif(gif: Path = GIF, templates: dict | None = None):
    """Per-frame score array (NaN where undecodable) + clean mask."""
    from PIL import Image

    if templates is None:
        templates = load_templates()
    im = Image.open(gif)
    scores = np.full(im.n_frames, np.nan)
    clean = np.zeros(im.n_frames, bool)
    for i in range(im.n_frames):
        im.seek(i)
        bm, ok = first_number_bitmap(np.asarray(im.convert("L")))
        if ok:
            v = decode_number(bm, templates)
            if v is not None:
                scores[i] = v
                clean[i] = True
    # Neighbor-consensus fill: the score is piecewise constant, so a
    # contaminated gap whose clean endpoints agree takes their value.
    idx = np.nonzero(clean)[0]
    for a, b in zip(idx[:-1], idx[1:]):
        if b - a > 1 and scores[a] == scores[b]:
            scores[a + 1:b] = scores[a]
    return scores, clean


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", type=Path, default=Path("tests/data/gif_scores.npz"))
    p.add_argument("--gif", type=Path, default=GIF,
                   help="Recording to decode (default: the reference's "
                   "dsprites.gif). Pass a demo --record_ref artifact to "
                   "score this rebuild by the same decoder.")
    p.add_argument("--pixel_font", action="store_true",
                   help="Match against the rebuild's pixel-font templates "
                   "(viz/scoretext.py) instead of the reference recording's "
                   "matplotlib glyph set. Use for --record_ref gifs.")
    args = p.parse_args(argv)

    templates = load_pixel_templates() if args.pixel_font else None
    scores, clean = decode_gif(args.gif, templates)
    n = len(scores)
    known = ~np.isnan(scores)
    print(f"{n} frames: {clean.sum()} decoded exactly, "
          f"{known.sum() - clean.sum()} filled by consensus, "
          f"{n - known.sum()} unresolved (score changed inside a "
          f"contaminated gap)")

    ks = scores[known]
    changes = np.nonzero(np.diff(ks))[0]
    print("score trajectory (value @ first frame):")
    frames_known = np.nonzero(known)[0]
    print(f"  {ks[0]:+.4f} @ frame {frames_known[0]}")
    for c in changes:
        d = ks[c + 1] - ks[c]
        print(f"  {ks[c + 1]:+.4f} @ frame {frames_known[c + 1]} "
              f"(event {d:+.4f} = {round(d * 16):+d}/16)")
    # The recording ends with a manual scoring reset ('r',
    # test_demo.py:255-258: current_s[0, 6] = 0) — the run's score is the
    # last value BEFORE a terminal reset-to-zero, not the literal last frame.
    final = ks[-1]
    end_frame = frames_known[-1]
    if len(changes) and ks[-1] == 0.0 and ks[changes[-1]] > 1.0:
        final = ks[changes[-1]]
        end_frame = frames_known[changes[-1]]
        print(f"(terminal frame shows a manual scoring reset to 0.0 — "
              f"run score taken at frame {end_frame})")
    print(f"run score: {final} over {end_frame + 1} frames  ->  "
          f"{final / end_frame * 1000:.3f} per 1000 env steps")

    args.out.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(args.out, scores=scores, clean=clean)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
