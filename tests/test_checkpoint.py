"""Checkpoint / resume / archive round-trip tests (SURVEY.md §3.5)."""

import numpy as np
import pytest

import jax

from deep_active_inference_mc_tpu.config import Config
from deep_active_inference_mc_tpu.infer.agent import ActiveInferenceAgent
from deep_active_inference_mc_tpu.train import loop as train_loop
from deep_active_inference_mc_tpu.utils import checkpoint as ckpt
from deep_active_inference_mc_tpu.utils import stats as stats_lib

pytestmark = pytest.mark.smoke  # pre-commit tier: `pytest -m smoke`


@pytest.fixture(scope="module")
def cfg():
    return Config(batch=4, test_size=4)


@pytest.fixture(scope="module")
def agent(cfg):
    return ActiveInferenceAgent(s_dim=cfg.s_dim, pi_dim=cfg.pi_dim)


def test_save_load_roundtrip(tmp_path, cfg, agent):
    state = train_loop.create_train_state(cfg, agent, jax.random.key(0))
    stats = stats_lib.new_stats()
    stats["F"].append(1.25)
    stats["mse_o"].append(99.0)
    key = jax.random.key(42)

    folder = tmp_path / "checkpoints"
    ckpt.save_all(folder, state, stats, key, script_file="")
    assert ckpt.latest_exists(folder)
    assert (folder / "stats.pkl").exists()
    assert (folder / "networks.py").exists()  # source snapshot

    template = train_loop.create_train_state(cfg, agent, jax.random.key(7))
    restored, stats2, key2 = ckpt.load_all(folder, template)
    assert stats2["F"] == [1.25]
    # Params restored exactly (template had different init).
    a = jax.tree.leaves(state.params["mid"])[0]
    b = jax.tree.leaves(restored.params["mid"])[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Optimizer state restored (the reference port dropped it, §2.9.5).
    oa = jax.tree.leaves(state.opt_states["down"])[0]
    ob = jax.tree.leaves(restored.opt_states["down"])[0]
    np.testing.assert_array_equal(np.asarray(oa), np.asarray(ob))
    # PRNG key restored.
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(key)),
        np.asarray(jax.random.key_data(key2)),
    )
    # Precision scalars restored.
    assert float(restored.precision.gamma) == float(state.precision.gamma)


def test_archive_drops_optimizer(tmp_path, cfg, agent):
    state = train_loop.create_train_state(cfg, agent, jax.random.key(0))
    folder = tmp_path / "checkpoints"
    ckpt.save_all(folder, state, stats_lib.new_stats(), jax.random.key(1))
    ckpt.archive(folder, epoch=25)
    arch = tmp_path / "checkpoints_epoch_25"
    assert arch.exists()
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as c:
        payload = c.restore(arch / "state")
    assert "opt_states" not in payload["state"]
    assert "params" in payload["state"]
    # Original checkpoint still has the optimizer state.
    with ocp.StandardCheckpointer() as c:
        payload = c.restore(folder / "state")
    assert "opt_states" in payload["state"]


def test_load_all_from_weight_only_archive(tmp_path, cfg, agent):
    """load_all on an immutable archive (no opt_states) grafts the saved
    weights onto the template and leaves the optimizer at template values —
    sweeps/probes evaluate archived epochs directly."""
    state = train_loop.create_train_state(cfg, agent, jax.random.key(0))
    folder = tmp_path / "checkpoints"
    ckpt.save_all(folder, state, stats_lib.new_stats(), jax.random.key(1))
    ckpt.archive(folder, epoch=25)
    arch = tmp_path / "checkpoints_epoch_25"

    template = train_loop.create_train_state(cfg, agent, jax.random.key(7))
    restored, _, _ = ckpt.load_all(arch, template)
    # Params come from the archive, NOT the (differently-seeded) template.
    got = [np.asarray(x) for x in jax.tree.leaves(restored.params)]
    saved = [np.asarray(x) for x in jax.tree.leaves(state.params)]
    tpl = [np.asarray(x) for x in jax.tree.leaves(template.params)]
    for g, s in zip(got, saved):
        np.testing.assert_allclose(g, s)
    # Some leaves (zero-init biases) match under any seed; the weight
    # matrices must NOT have fallen back to template values.
    assert any(not np.allclose(g, t) for g, t in zip(got, tpl))


def test_load_all_refuses_missing_params(tmp_path, cfg, agent):
    """The weight-only fallback must NOT paper over missing *params* leaves
    with template (random-init) values: a template whose params tree has a
    key the archive lacks raises instead of silently evaluating an
    untrained subtree."""
    state = train_loop.create_train_state(cfg, agent, jax.random.key(0))
    folder = tmp_path / "checkpoints"
    ckpt.save_all(folder, state, stats_lib.new_stats(), jax.random.key(1))
    ckpt.archive(folder, epoch=25)
    arch = tmp_path / "checkpoints_epoch_25"

    template = train_loop.create_train_state(cfg, agent, jax.random.key(7))
    template.params["phantom_layer"] = {
        "w": np.zeros((2, 2), np.float32)
    }
    with pytest.raises(Exception, match="params|phantom"):
        ckpt.load_all(arch, template)


def test_pad_missing_stats():
    stats = {"F": [1.0, 2.0], "mse_o": [3.0]}
    stats = stats_lib.pad_missing(stats)
    assert len(stats["mse_o"]) == 2
    assert all(len(v) in (0, 2) for v in stats.values())
    assert set(stats_lib.STATS_KEYS) <= set(stats.keys())


def test_crash_between_swap_renames_recovers(tmp_path, cfg, agent):
    """If a kill lands between the two swap renames in _write_payload
    (``state`` renamed away, ``state.tmp`` not yet renamed in), the loader
    must fall back to the complete ``state.old`` checkpoint."""
    state = train_loop.create_train_state(cfg, agent, jax.random.key(0))
    stats = stats_lib.new_stats()
    stats["F"].append(2.5)
    key = jax.random.key(7)
    folder = tmp_path / "checkpoints"
    ckpt.save_all(folder, state, stats, key)
    ckpt.save_all(folder, state, stats, key)  # exercise the swap path

    # Simulate the crash window: state -> state.old, no live state dir.
    (folder / "state").rename(folder / "state.old")
    assert ckpt.latest_exists(folder)
    template = train_loop.create_train_state(cfg, agent, jax.random.key(1))
    restored, got_stats, got_key = ckpt.load_all(folder, template)
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(restored.params)[0]),
        np.asarray(jax.tree.leaves(state.params)[0]),
    )
    assert got_stats["F"] == [2.5]


def test_async_saver_surfaces_writer_errors(tmp_path, cfg, agent):
    state = train_loop.create_train_state(cfg, agent, jax.random.key(0))
    saver = ckpt.AsyncSaver()
    # Unwritable destination: a path under a regular file.
    blocker = tmp_path / "blocker"
    blocker.write_text("x")
    saver.save(blocker / "sub", state, stats_lib.new_stats(), jax.random.key(0))
    with pytest.raises(OSError):
        saver.wait()
    # The error is cleared after being raised once.
    saver.wait()
