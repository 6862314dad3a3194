"""Multi-chip execution: data-parallel sharding over a device mesh.

The reference is strictly single-process/single-device (SURVEY.md §2.10 —
no torch.distributed, no collectives anywhere). The TPU-native equivalent:
one ``jax.sharding.Mesh`` with a ``data`` axis over ICI; environment state,
frames, rollouts and every per-sample loss term shard along it, parameters
and optimizer states are replicated, and XLA inserts the psum for the
batch-mean gradients automatically. DCN would only enter for multi-host
sweeps (mesh spanning hosts via ``jax.distributed.initialize``).

Works identically on real TPU meshes and on the virtual CPU mesh used by
tests (``--xla_force_host_platform_device_count``).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from deep_active_inference_mc_tpu.config import Config
from deep_active_inference_mc_tpu.infer.agent import ActiveInferenceAgent
from deep_active_inference_mc_tpu.infer.precision import OmegaParams
from deep_active_inference_mc_tpu.train import loop as train_loop


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    """A 1-D ``data`` mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(devices, ("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch/env) sharding."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_train_state(
    state: train_loop.TrainState, mesh: Mesh
) -> train_loop.TrainState:
    """Place a TrainState on the mesh: envs sharded over 'data', params /
    optimizer states / precision replicated."""
    batch = batch_sharding(mesh)
    repl = replicated(mesh)
    return train_loop.TrainState(
        params=jax.device_put(state.params, repl),
        opt_states=jax.device_put(state.opt_states, repl),
        precision=jax.device_put(state.precision, repl),
        env=jax.device_put(state.env, batch),
    )


def make_sharded_train_round(
    agent: ActiveInferenceAgent, cfg: Config, lut: jax.Array, mesh: Mesh
):
    """The fused train round jitted over the mesh. Input/output shardings
    pin envs to the data axis and learnable state to full replication; the
    gradient all-reduce over ICI is inserted by XLA from the sharding
    propagation (no hand-written collectives needed for pure DP)."""
    opts = train_loop.make_optimizers(cfg)
    omega_params = OmegaParams(cfg.var_a, cfg.var_b, cfg.var_c, cfg.var_d)
    fn = functools.partial(
        train_loop.train_round, agent, cfg, opts, omega_params
    )
    batch = batch_sharding(mesh)
    repl = replicated(mesh)
    state_shardings = train_loop.TrainState(
        params=repl, opt_states=repl, precision=repl, env=batch
    )
    lut_repl = jax.device_put(lut, repl)

    @functools.partial(
        jax.jit,
        in_shardings=(state_shardings, repl),
        out_shardings=(state_shardings, repl),
        donate_argnums=(0,),
    )
    def step(state, key):
        return fn(state, key, lut_repl)

    return step


def make_sharded_epoch(
    agent: ActiveInferenceAgent,
    cfg: Config,
    lut: jax.Array,
    mesh: Mesh,
    rounds: int,
):
    """Mesh-sharded version of ``train_loop.make_jit_epoch``: the whole epoch
    (``rounds`` fused train rounds) as one jitted ``lax.scan`` with envs
    pinned to the ``data`` axis and learnable state replicated. Used by the
    flagship trainer when ``Config.mesh_shape`` is set."""
    opts = train_loop.make_optimizers(cfg)
    omega_params = OmegaParams(cfg.var_a, cfg.var_b, cfg.var_c, cfg.var_d)
    batch = batch_sharding(mesh)
    repl = replicated(mesh)
    state_shardings = train_loop.TrainState(
        params=repl, opt_states=repl, precision=repl, env=batch
    )
    lut_repl = jax.device_put(lut, repl)

    @functools.partial(
        jax.jit,
        in_shardings=(state_shardings, repl),
        out_shardings=(state_shardings, repl),
        donate_argnums=(0,),
    )
    def epoch(state, key):
        def body(st, k):
            return train_loop.train_round(
                agent, cfg, opts, omega_params, st, k, lut_repl
            )

        state, metrics = jax.lax.scan(
            body, state, jax.random.split(key, rounds)
        )
        return state, jax.tree.map(lambda x: x[-1], metrics)

    return epoch
