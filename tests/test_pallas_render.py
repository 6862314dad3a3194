"""Pallas render kernel: interpret-mode parity on CPU against both XLA
render paths (the TPU-compiled kernel is exercised by bench.py on hardware).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from deep_active_inference_mc_tpu.envs import dsprites as env_lib
from deep_active_inference_mc_tpu.envs import raster
from deep_active_inference_mc_tpu.ops.pallas import render as prender


@pytest.fixture(scope="module")
def lut():
    return raster.build_sprite_lut()


def test_render_paths_agree(lut):
    state = env_lib.randomize(
        jax.random.key(1), env_lib.reset(jax.random.key(0), prender.BLK * 2)
    )
    mm = raster.paint_reward_strip(
        raster.render_sprites(lut, state.latents), state.last_r
    )
    sl = raster.paint_reward_strip(
        raster.render_sprites_slice(lut, state.latents), state.last_r
    )
    np.testing.assert_array_equal(np.asarray(mm), np.asarray(sl))
    with prender.interpret_mode():
        pk = prender.render_frames(state.latents, state.last_r)
    np.testing.assert_array_equal(np.asarray(mm), np.asarray(pk))


@pytest.mark.skipif(
    jax.default_backend() == "tpu",
    reason="CPU-dispatch test; on TPU the kernel is eligible by design",
)
def test_dispatcher_cpu_fallback(lut):
    """On CPU the dispatcher must take the XLA path and still render."""
    assert not env_lib._pallas_render_eligible(prender.BLK)
    state = env_lib.reset(jax.random.key(0), 8)
    o = env_lib.render(lut, state)
    assert o.shape == (8, 64, 64, 1)


@pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="compiled-kernel parity needs real TPU hardware "
    "(run: JAX_PLATFORMS='' pytest tests/test_pallas_render.py -k compiled)",
)
def test_compiled_kernel_matches_xla_on_tpu(lut):
    """The COMPILED Pallas kernel (not interpret mode) must match the XLA
    shift-matrix render bit-for-bit on hardware — the exact configuration
    the env dispatcher selects (_pallas_render_eligible)."""
    state = env_lib.randomize(
        jax.random.key(7), env_lib.reset(jax.random.key(6), prender.BLK * 4)
    )
    assert env_lib._pallas_render_eligible(state.batch)
    xla = raster.paint_reward_strip(
        raster.render_sprites(lut, state.latents), state.last_r
    )
    pk = prender.render_frames(state.latents, state.last_r)
    np.testing.assert_array_equal(np.asarray(xla), np.asarray(pk))
    # and the dispatcher actually routes to the kernel on this config
    via_dispatch = env_lib.render(lut, state)
    np.testing.assert_array_equal(np.asarray(pk), np.asarray(via_dispatch))


def test_spmd_sharded_render_matches_xla(lut):
    """custom_partitioning rule: batch-sharded inputs over the 8-device mesh
    render shard-locally (no gather), stay sharded on the batch axis, and
    match the XLA render bit-for-bit — including when the mesh splits a
    BLK-aligned global batch into non-BLK-aligned local shards."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    for global_batch in (prender.BLK * 8, prender.BLK):  # local 32 and 4
        state = env_lib.randomize(
            jax.random.key(global_batch),
            env_lib.reset(jax.random.key(0), global_batch),
        )
        ref = raster.paint_reward_strip(
            raster.render_sprites(lut, state.latents), state.last_r
        )
        lat = jax.device_put(
            state.latents, NamedSharding(mesh, P("data", None))
        )
        lr = jax.device_put(state.last_r, NamedSharding(mesh, P("data")))
        out = jax.jit(prender.render_frames)(lat, lr)
        assert out.sharding.spec == P("data")
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))
