"""Test configuration: run the suite on a virtual 8-device CPU mesh.

This is the TPU-native answer to "test distributed without a cluster"
(SURVEY.md §4): 8 virtual CPU devices so sharding/collective paths compile
and execute in CI, and the real TPU tunnel stays free for benchmarks.

Note: this environment's sitecustomize force-registers the ``axon`` TPU
platform and presets JAX_PLATFORMS=axon, so the usual env-var spoofing
(``JAX_PLATFORMS=cpu`` + ``--xla_force_host_platform_device_count``) is
overridden. ``jax.config.update`` after import wins.
"""

import os

if os.environ.get("DAIF_TPU_TESTS"):
    # Escape hatch for hardware-gated tests (e.g. compiled-Pallas parity,
    # tests/test_pallas_render.py): keep the real TPU platform. Run these
    # only with the TPU tunnel free (one process at a time).
    import jax

    jax.config.update("jax_threefry_partitionable", True)
else:
    os.environ["JAX_PLATFORMS"] = "cpu"  # best effort; config below is binding

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
    jax.config.update("jax_threefry_partitionable", True)
