"""Persistent-compilation-cache helper: config wiring + idempotence."""

import jax

from deep_active_inference_mc_tpu.utils import compcache


def test_enable_persistent_cache(tmp_path):
    d = str(tmp_path / "xla_cache")
    got = compcache.enable_persistent_cache(d)
    assert got == d
    assert jax.config.jax_compilation_cache_dir == d
    assert jax.config.jax_enable_compilation_cache is True
    assert jax.config.jax_raise_persistent_cache_errors is False
    # idempotent
    assert compcache.enable_persistent_cache(d) == d


def test_enable_persistent_cache_unwritable(tmp_path):
    blocker = tmp_path / "file"
    blocker.write_text("x")
    # A path *under a file* cannot be created: must degrade, not raise.
    assert compcache.enable_persistent_cache(str(blocker / "sub")) == ""
