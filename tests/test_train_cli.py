"""Flagship-CLI tests: the mesh/bf16 flags are actually reachable from
``apps.train.main`` and produce the full artifact set (VERDICT r1 #4/#6)."""

import pytest

import json

import numpy as np

from deep_active_inference_mc_tpu.apps import train as train_app
from deep_active_inference_mc_tpu.config import Config


def test_from_args_parses_mesh_and_bf16():
    cfg = Config.from_args(
        ["--mesh_shape", "4", "--bf16", "--sweep_envs", "16",
         "--sweep_steps", "3", "--viz_every", "2"]
    )
    assert cfg.mesh_shape == 4
    assert cfg.bf16 is True
    assert cfg.sweep_envs == 16
    assert cfg.sweep_steps == 3
    assert cfg.viz_every == 2


@pytest.mark.slow
def test_train_cli_mesh_bf16_end_to_end(tmp_path):
    """One epoch through main() on a 4-device (2 dp x 2 tp) mesh with bf16
    compute: trains, evaluates, sweeps, and writes every per-epoch
    artifact."""
    argv = [
        "--batch", "8", "--rounds", "2", "--test_size", "8",
        "--epochs", "2", "--samples", "1",
        "--mesh_shape", "4", "--tp", "2", "--bf16",
        "--sweep_envs", "8", "--sweep_steps", "2",
        "--out_root", str(tmp_path),
    ]
    train_app.main(argv)

    runs = list(tmp_path.glob("figs_*"))
    assert len(runs) == 1
    folder = runs[0]
    cfg = json.loads((folder / "config.json").read_text())
    assert cfg["mesh_shape"] == 4 and cfg["bf16"] is True
    assert cfg["tp"] == 2

    assert list(folder.glob("traversals_at_epoch_0001.png"))
    assert list(folder.glob("imagination_*_1.png"))
    # The reward-imagination probe strip (reference train.py:184).
    assert list(folder.glob("reward_imagination_*_1.png"))
    assert list(folder.glob("1_result_*.png"))

    import pickle

    # save_every=2 fires at epoch 2, before that epoch's stats append —
    # the checkpoint carries epoch 1's series (reference save-order parity,
    # train.py:128-129 vs :148-175).
    stats = pickle.loads(
        (folder / "checkpoints" / "stats.pkl").read_bytes()
    )
    assert len(stats["F"]) == 1
    assert np.isfinite(stats["F"][0])
    assert np.isfinite(stats["train_scores_m"][0])
