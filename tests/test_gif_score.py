"""Regression test for the reference-recording score decode
(scripts/gif_score.py): the reference's own trained agent, in its shipped
1001-frame demo recording (/root/reference/dsprites.gif with the score text
overlay from test_demo.py:219-231), scores +11.6875 in ~1000 env steps.
That number is the framework's ground-truth behavioral anchor (BASELINE.md).
"""

from pathlib import Path

import numpy as np
import pytest

GIF = Path("/root/reference/dsprites.gif")
NPZ = Path(__file__).parent / "data" / "gif_scores.npz"

pytestmark = pytest.mark.smoke


def test_committed_scores_shape_and_anchor():
    d = np.load(NPZ)
    scores, clean = d["scores"], d["clean"]
    assert len(scores) == 1001
    assert clean.sum() >= 950              # 968 exact decodes
    assert not np.isnan(scores).any()      # every gap resolved by consensus
    # The anchor: peak/run score +11.6875 (= 187/16), reached at frame 931,
    # held until the terminal manual reset on the last frame.
    assert np.nanmax(scores) == pytest.approx(11.6875)
    assert scores[931] == pytest.approx(11.6875)
    assert scores[998] == pytest.approx(11.6875)
    assert scores[0] == 0.0
    # Graded +-k/16 crossing rewards (game_environment.py:118-140): every
    # value lies on the 1/16 grid.
    assert np.allclose(scores * 16, np.round(scores * 16))
    # Score is piecewise constant with few events: 16 changes in 1001 frames.
    n_changes = int((np.diff(scores) != 0).sum())
    assert 10 <= n_changes <= 25


@pytest.mark.skipif(not GIF.exists(), reason="reference gif not available")
def test_fresh_decode_matches_committed():
    import sys

    sys.path.insert(0, str(Path(__file__).parent.parent / "scripts"))
    import gif_score

    scores, clean = gif_score.decode_gif(GIF)
    d = np.load(NPZ)
    np.testing.assert_array_equal(clean, d["clean"])
    np.testing.assert_allclose(scores, d["scores"])


def test_pixel_font_paint_decode_roundtrip():
    """The rebuild's --record_ref overlay (viz/scoretext.py) must decode
    EXACTLY under the same algorithm that decodes the reference recording
    (band crop, gap cut, cleanliness, exact glyph match) — this is what
    makes the reference-vs-rebuild gif comparison same-decoder."""
    import sys

    sys.path.insert(0, str(Path(__file__).parent.parent / "scripts"))
    import gif_score

    from deep_active_inference_mc_tpu.viz import scoretext

    tmpl = {ch: t.astype(np.uint8) for ch, t in scoretext.templates().items()}
    vals = [0.0, 11.6875, -3.25, 0.0625, 12.3125, -0.5625, 9.9375, 5.5]
    for v in vals:
        frame = np.zeros((500, 500), np.uint8)
        scoretext.paint_score(frame, v, rate=abs(v) / 3.7)
        bm, clean = gif_score.first_number_bitmap(frame)
        assert clean, f"{v}: frame not clean"
        assert gif_score.decode_number(bm, tmpl) == pytest.approx(v)


def test_pixel_font_contaminated_frame_rejected():
    """Sprite ink inside the number's columns below band row 18 must flag
    the frame dirty (the decoder's no-descender contamination check), so a
    sprite walking through the text band can never corrupt a decode."""
    import sys

    sys.path.insert(0, str(Path(__file__).parent.parent / "scripts"))
    import gif_score

    from deep_active_inference_mc_tpu.viz import scoretext

    frame = np.zeros((500, 500), np.uint8)
    scoretext.paint_score(frame, 7.875)
    frame[44:47, 95:110] = 255  # fake sprite ink under the digits
    _, clean = gif_score.first_number_bitmap(frame)
    assert not clean
