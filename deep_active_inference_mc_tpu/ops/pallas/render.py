"""Pallas TPU kernel: fused dSprites frame render.

One kernel replaces the XLA three-pass render (sprite-row gather ->
shift-matrix window matmuls -> reward-strip paint, envs/raster.py), which
moves ~300 MB of HBM intermediates per 4096-env step. Here each env's 64x96
sprite window is DMA'd from the HBM LUT directly into VMEM (double-buffered
across the envs of a block), the 64-wide column window is cut in VMEM, the
reward strip is painted in-register, and only the final (64, 64) frame is
written back — the speed-of-light memory traffic for this op.

Measured (TPU v5e, 4096 envs, BLK=32): 4.7e6 env step+renders/s vs 2.9e6 for
the XLA matmul render — at the DMA throughput ceiling for 24 KB windows.

SPMD: a bare pallas_call has no partitioning rule, so under a multi-device
mesh XLA would force-gather the batch. ``render_frames`` is wrapped in
``custom_partitioning`` with a batch-factor sharding rule: each device runs
the kernel on its local batch shard (falling back to the XLA shift-matrix
render for shards not BLK-aligned), so sharded fleets keep the fused path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.custom_partitioning import custom_partitioning
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import NamedSharding
from jax.sharding import PartitionSpec as P

from deep_active_inference_mc_tpu.envs import raster

BLK = 32  # envs per program; DMAs for a block are all in flight together
LANES = 128  # LUT padded from 96 to the TPU lane width
RES = raster.RES


@functools.cache
def _padded_lut_np() -> np.ndarray:
    """(720, 96, 128) float32 LUT, lane-padded. Cached as numpy — this is
    reached inside jit traces, where caching a traced array would leak
    tracers; the jnp conversion below is a free constant per trace."""
    lut = np.asarray(raster.build_sprite_lut())
    return np.pad(lut, ((0, 0), (0, 0), (0, LANES - raster.CANVAS)))


def _kernel(idx_ref, r0_ref, c0_ref, lastr_ref, lut_ref, out_ref,
            scratch, sems):
    blk = pl.program_id(0)

    def dma(e):
        g = blk * BLK + e
        return pltpu.make_async_copy(
            lut_ref.at[idx_ref[g], pl.ds(r0_ref[g], RES), :],
            scratch.at[e],
            sems.at[e],
        )

    for e in range(BLK):
        dma(e).start()

    rows = jax.lax.broadcasted_iota(jnp.int32, (RES, RES), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (RES, RES), 1)
    strip = rows < 3
    left = strip & (cols < RES // 2)
    right = strip & (cols >= RES // 2)

    for e in range(BLK):
        g = blk * BLK + e
        dma(e).wait()
        # Unaligned lane slices are rejected by Mosaic; rotate the lanes
        # left by c0 (dynamic rotate) and take the aligned low half.
        rolled = pltpu.roll(scratch[e], shift=LANES - c0_ref[g], axis=1)
        window = rolled[:, :RES]
        r = lastr_ref[g]
        # Reward strip (game_environment.py:48-53): positive rewards
        # overwrite the left half, negative the right.
        window = jnp.where(left & (r >= 0.0), r, window)
        window = jnp.where(right & (r < 0.0), -r, window)
        out_ref[e] = window


# Explicit interpret-mode toggle (ADVICE r2 #3: no private-config sniffing
# inside jit; the flag is a *static* jit argument so interpret and compiled
# executables never share a cache entry). Tests use ``interpret_mode()``.
_INTERPRET = False


import contextlib


@contextlib.contextmanager
def interpret_mode():
    """Run the kernel under the Pallas TPU interpreter (CPU tests). The
    interpreter lowers pallas_call to an effectful io_callback, which
    custom_partitioning cannot lower — interpret runs bypass the cp wrapper."""
    global _INTERPRET
    old = _INTERPRET
    _INTERPRET = True
    try:
        with pltpu.force_tpu_interpret_mode():
            yield
    finally:
        _INTERPRET = old


def _render_local(idx, r0, c0, last_r, lut, interpret=False):
    """Per-device render: the Pallas kernel for BLK-aligned local batches on
    TPU (or under the interpreter), an XLA slice render otherwise (CPU
    shards inside the cp rule, or a mesh splitting a BLK-aligned global
    batch into unaligned shards). Must stay **const-free**: this is the
    custom_partitioning call body, which may not close over array constants
    (hence iota/dynamic_slice instead of the numpy shift-selector render)."""
    B = idx.shape[0]
    use_pallas = B % BLK == 0 and (
        jax.default_backend() == "tpu" or interpret
    )
    if not use_pallas:
        base = lut[idx, :, : raster.CANVAS]  # (B, 96, 96)

        def slice_one(img, r, c):
            return jax.lax.dynamic_slice(img, (r, c), (RES, RES))

        window = jax.vmap(slice_one)(base, r0, c0)
        rows = jax.lax.broadcasted_iota(jnp.int32, (RES, RES), 0)[None]
        cols = jax.lax.broadcasted_iota(jnp.int32, (RES, RES), 1)[None]
        r = last_r[:, None, None]
        left = (rows < 3) & (cols < RES // 2)
        right = (rows < 3) & (cols >= RES // 2)
        window = jnp.where(left & (r >= 0.0), r, window)
        window = jnp.where(right & (r < 0.0), -r, window)
        return window
    return _pallas_render(idx, r0, c0, last_r, lut)


@custom_partitioning
def _render_cp(idx, r0, c0, last_r, lut):
    return _render_local(idx, r0, c0, last_r, lut)


def _batch_spec(sharding) -> P:
    spec = getattr(sharding, "spec", None)
    return spec[0] if spec is not None and len(spec) else None


def _infer_sharding(mesh, arg_infos, result_infos):
    b = _batch_spec(arg_infos[0].sharding)
    return NamedSharding(mesh, P(b, None, None))


def _partition(mesh, arg_infos, result_infos):
    b = _batch_spec(arg_infos[0].sharding)
    arg_shardings = (
        NamedSharding(mesh, P(b)),
        NamedSharding(mesh, P(b)),
        NamedSharding(mesh, P(b)),
        NamedSharding(mesh, P(b)),
        NamedSharding(mesh, P(None, None, None)),  # LUT replicated
    )
    out_sharding = NamedSharding(mesh, P(b, None, None))
    return mesh, _render_local, out_sharding, arg_shardings


_render_cp.def_partition(
    partition=_partition,
    infer_sharding_from_operands=_infer_sharding,
    # shardy factor rule: batch rides through; frame dims are fresh.
    sharding_rule="b, b, b, b, u v w -> b i j",
)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _render_frames_impl(latents, last_r, interpret=False):
    lut = jnp.asarray(_padded_lut_np())
    idx = raster.sprite_index(latents).astype(jnp.int32)
    r0 = (raster.CENTER - raster.POS_OFFSET) - latents[..., 5]
    c0 = (raster.CENTER - raster.POS_OFFSET) - latents[..., 4]
    args = (
        idx,
        r0.astype(jnp.int32),
        c0.astype(jnp.int32),
        last_r.astype(jnp.float32),
        lut,
    )
    if interpret:
        return _render_local(*args, interpret=True)[..., None]
    return _render_cp(*args)[..., None]


def render_frames(latents: jax.Array, last_r: jax.Array) -> jax.Array:
    """(B, 64, 64, 1) frames with reward strip, fully fused.

    Requires global B % BLK == 0 (use ``envs.dsprites.render`` for odd
    sizes). Batch-sharded inputs stay sharded: each device renders its own
    shard (custom_partitioning rule above)."""
    assert latents.shape[0] % BLK == 0, latents.shape[0]
    return _render_frames_impl(latents, last_r, interpret=_INTERPRET)


def _pallas_render(idx, r0, c0, last_r, lut):
    B = idx.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(B // BLK,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],  # LUT stays in HBM
        out_specs=pl.BlockSpec(
            (BLK, RES, RES), lambda i, *_: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((BLK, RES, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((BLK,)),
        ],
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, RES, RES), jnp.float32),
    )(idx, r0, c0, last_r, lut)
