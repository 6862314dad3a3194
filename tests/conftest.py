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

os.environ["JAX_PLATFORMS"] = "cpu"  # best effort; config below is binding

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_threefry_partitionable", True)
