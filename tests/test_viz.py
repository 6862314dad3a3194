"""Smoke tests: the three plot artifacts render to files (graphs/ parity)."""

import numpy as np
import pytest

from deep_active_inference_mc_tpu.utils import stats as stats_lib
from deep_active_inference_mc_tpu.viz.generate_traversals import generate_traversals
from deep_active_inference_mc_tpu.viz.reconstructions_plot import reconstructions_plot
from deep_active_inference_mc_tpu.viz.stats_plot import stats_plot


def test_reconstructions_plot(tmp_path):
    rng = np.random.RandomState(0)
    o = rng.rand(8, 64, 64, 1).astype(np.float32)
    out = tmp_path / "recon.png"
    reconstructions_plot(o, o, o, filename=out)
    assert out.exists() and out.stat().st_size > 1000


def test_stats_plot(tmp_path):
    stats = stats_lib.new_stats()
    rng = np.random.RandomState(1)
    for _ in range(5):
        for k in stats_lib.STATS_KEYS:
            if k.endswith("_anal"):
                stats[k].append(np.abs(rng.rand(10 if "s" in k else 4)) + 0.1)
            elif k.startswith("train_scores") or k == "deep_mse_o":
                continue  # legitimately empty series
            else:
                stats[k].append(float(np.abs(rng.rand())) + 0.1)
    # kl_div_pi_anal is 4-wide
    stats["kl_div_pi_anal"] = [np.abs(rng.rand(4)) + 0.1 for _ in range(5)]
    out = tmp_path / "stats"
    stats_plot(stats, out)
    assert (tmp_path / "stats.png").exists()
    assert (tmp_path / "stats.svg").exists()


def test_generate_traversals(tmp_path):
    rng = np.random.RandomState(2)
    s_dim = 4  # small for speed (MI regression is the slow part)
    s_sample = rng.randn(60, s_dim).astype(np.float32)
    S_real = rng.randn(60, 6).astype(np.float32)

    def decode_fn(s):
        return np.tile(
            np.abs(s[:, :1, None, None]) % 1.0, (1, 16, 16, 1)
        ).astype(np.float32)

    out = tmp_path / "trav.png"
    generate_traversals(
        decode_fn, s_dim, s_sample, S_real, filenames=[out]
    )
    assert out.exists() and out.stat().st_size > 1000
