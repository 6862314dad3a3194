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
