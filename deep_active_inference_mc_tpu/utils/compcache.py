"""Persistent XLA compilation cache.

Every fresh process pays the full XLA compile for the jitted train round /
sweep / bench graphs (~1-5 min on the v5e tunnel). The reference has no
equivalent concern (PyTorch eager), but for this framework's CLI surface —
train, sweep, demo, bench are separate processes — a persistent on-disk
cache turns every compile after the first into a sub-second load.

Call :func:`enable_persistent_cache` at app startup, before the first jit
execution. Safe to call when the cache dir is unwritable (errors are
swallowed by JAX with ``jax_raise_persistent_cache_errors=False``).
"""

from __future__ import annotations

import os

import jax

DEFAULT_DIR = os.path.expanduser("~/.cache/daif_tpu_xla")


def enable_persistent_cache(path: str | None = None) -> str:
    """Enable the on-disk compilation cache (idempotent). Returns the dir,
    or "" when the location is unwritable (the app runs uncached)."""
    cache_dir = path or os.environ.get("DAIF_COMP_CACHE", DEFAULT_DIR)
    try:
        os.makedirs(cache_dir, exist_ok=True)
    except OSError as e:
        print(f"compilation cache disabled ({cache_dir}: {e})")
        return ""
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_enable_compilation_cache", True)
    # Cache everything that took meaningful compile time; don't crash the
    # app if the cache is unwritable or corrupt.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_raise_persistent_cache_errors", False)
    return cache_dir
