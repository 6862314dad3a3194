"""Test configuration: run the suite on a virtual 8-device CPU mesh.

This is the TPU-native answer to "test distributed without a cluster"
(SURVEY.md §4): XLA's host-platform device-count spoofing gives us 8 CPU
devices so sharding/collective paths compile and execute in CI.

Must run before the first ``import jax`` anywhere in the test process.
"""

import os

# Force CPU: the session env presets JAX_PLATFORMS=axon (the TPU tunnel),
# which must stay free for benchmarking and would serialize tests.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_threefry_partitionable", True)
