"""Multi-chip execution: data- and tensor-parallel sharding over a mesh.

The reference is strictly single-process/single-device (SURVEY.md §2.10 —
no torch.distributed, no collectives anywhere). The TPU-native equivalent:
one ``jax.sharding.Mesh`` with a ``data`` axis (and optionally a ``model``
axis) over ICI. Environment state, frames, rollouts and every per-sample
loss term shard along ``data``; with a ``model`` axis the Dense chains of
the three networks shard Megatron-style (alternating column/row splits, so
each pair of layers costs one psum), and XLA inserts every collective from
the sharding annotations — no hand-written comms. DCN would only enter for
multi-host meshes (``jax.distributed.initialize``).

Works identically on real TPU meshes and on the virtual CPU mesh used by
tests (``--xla_force_host_platform_device_count``).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from deep_active_inference_mc_tpu.config import Config
from deep_active_inference_mc_tpu.infer.agent import ActiveInferenceAgent
from deep_active_inference_mc_tpu.train import loop as train_loop


def initialize_multihost(
    coordinator: Optional[str] = None,
    num_hosts: int = 1,
    host_id: Optional[int] = None,
) -> None:
    """Multi-host (DCN) wiring: ``jax.distributed.initialize`` so that
    ``jax.devices()`` returns the GLOBAL device list and every mesh built
    below spans hosts (SURVEY.md §2.10 stretch; the reference has no
    distributed backend at all).

    No-op for ``num_hosts <= 1`` — the single-host path never pays the
    coordinator handshake. After initialization the data axis laid out by
    ``make_mesh`` places host-local devices contiguously, so the per-pair
    Megatron psums ride ICI and only the DP gradient all-reduce crosses DCN.
    """
    if num_hosts <= 1:
        return
    if coordinator is None:
        raise ValueError("multi-host run needs --coordinator host:port")
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_hosts,
        process_id=host_id,
    )


def is_primary() -> bool:
    """True on the process that owns checkpoint/stats/viz writes (host 0).
    Single-host runs are always primary."""
    return jax.process_index() == 0


def make_mesh(
    n_devices: Optional[int] = None, n_model: int = 1
) -> Mesh:
    """A ``data`` mesh (1-D), or a 2-D ``(data, model)`` mesh when
    ``n_model > 1``. ``n_devices`` is the TOTAL device count used.

    Under ``initialize_multihost`` the device list is global;
    ``jax.devices()`` orders it by (process, local id), so reshaping to
    (data, model) keeps each host's devices contiguous on the data axis —
    the TP 'model' groups never straddle DCN (unless tp > devices/host,
    which the divisibility check below rejects only arithmetically: don't
    do that)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if n_model <= 1:
        return Mesh(devices, ("data",))
    if len(devices) % n_model:
        raise ValueError(
            f"{len(devices)} devices not divisible by tp={n_model}"
        )
    grid = np.array(devices).reshape(-1, n_model)
    return Mesh(grid, ("data", "model"))


def _tp_spec(path, leaf, n_model: int) -> P:
    """Megatron-style spec for one param leaf: Dense chains alternate
    column (even index: out-dim on 'model', bias sharded) and row (odd
    index: in-dim on 'model', bias replicated, psum folded in by XLA).
    Convs and sub-tile layers stay replicated."""
    keys = [getattr(k, "key", str(k)) for k in path]
    layer, kind = keys[-2], keys[-1]
    if not layer.startswith("Dense_"):
        return P()  # convs + anything exotic: replicated
    col = int(layer.split("_")[1]) % 2 == 0
    min_dim = 8 * n_model  # don't split below an 8-lane sliver per device
    if kind == "kernel":
        in_d, out_d = leaf.shape
        if col and out_d % n_model == 0 and out_d >= min_dim:
            return P(None, "model")
        if not col and in_d % n_model == 0 and in_d >= min_dim:
            return P("model", None)
        return P()
    if col and leaf.shape[0] % n_model == 0 and leaf.shape[0] >= min_dim:
        return P("model")
    return P()


def param_shardings(params, mesh: Mesh):
    """NamedSharding pytree for the agent params: replicated on a pure-data
    mesh, Megatron column/row splits on a ``(data, model)`` mesh."""
    if "model" not in mesh.axis_names:
        return jax.tree.map(lambda _: NamedSharding(mesh, P()), params)
    n_model = mesh.shape["model"]
    return jax.tree_util.tree_map_with_path(
        lambda p, l: NamedSharding(mesh, _tp_spec(p, l, n_model)), params
    )


def opt_shardings(opts, opt_states, p_shardings, mesh: Mesh):
    """Optimizer-state shardings mirroring the param shardings (Adam mu/nu
    shard exactly like their params; counts replicated)."""
    repl = NamedSharding(mesh, P())
    return {
        k: optax.tree_map_params(
            opts[k],
            lambda _leaf, ps: ps,
            opt_states[k],
            p_shardings[k],
            transform_non_params=lambda _leaf: repl,
        )
        for k in opt_states
    }


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch/env) sharding."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _state_shardings(cfg: Config, state: train_loop.TrainState, mesh: Mesh):
    """Sharding pytree for a TrainState on this mesh: envs over 'data',
    params/opt per the TP rules (replicated on a pure-data mesh)."""
    opts = train_loop.make_optimizers(cfg)
    ps = param_shardings(state.params, mesh)
    return train_loop.TrainState(
        params=ps,
        opt_states=opt_shardings(opts, state.opt_states, ps, mesh),
        precision=jax.tree.map(lambda _: replicated(mesh), state.precision),
        env=jax.tree.map(lambda _: batch_sharding(mesh), state.env),
    )


def shard_train_state(
    state: train_loop.TrainState, mesh: Mesh, cfg: Optional[Config] = None
) -> train_loop.TrainState:
    """Place a TrainState on the mesh: envs sharded over 'data', params /
    optimizer state replicated (data mesh) or TP-split (2-D mesh)."""
    cfg = cfg or Config()
    sh = _state_shardings(cfg, state, mesh)
    return jax.tree.map(jax.device_put, state, sh)


def _abstract_state_shardings(
    cfg: Config, agent: ActiveInferenceAgent, mesh: Mesh
):
    """State-sharding pytree without materializing a state (eval_shape)."""
    template = jax.eval_shape(
        functools.partial(train_loop.create_train_state, cfg, agent),
        jax.random.key(0),
    )
    return _state_shardings(cfg, template, mesh)


def make_sharded_train_round(
    agent: ActiveInferenceAgent, cfg: Config, lut: jax.Array, mesh: Mesh
):
    """The fused train round jitted over the mesh. Input/output shardings
    pin envs to the data axis and learnable state to full replication; the
    gradient all-reduce over ICI is inserted by XLA from the sharding
    propagation (no hand-written collectives needed for pure DP)."""
    repl = replicated(mesh)
    state_shardings = _abstract_state_shardings(cfg, agent, mesh)
    lut_repl = jax.device_put(lut, repl)
    return jax.jit(
        train_loop.make_round_fn(agent, cfg, lut_repl),
        in_shardings=(state_shardings, repl),
        out_shardings=(state_shardings, repl),
        donate_argnums=(0,),
    )


def make_sharded_epoch(
    agent: ActiveInferenceAgent,
    cfg: Config,
    lut: jax.Array,
    mesh: Mesh,
    rounds: int,
):
    """Mesh-sharded version of ``train_loop.make_jit_epoch``: the whole epoch
    (``rounds`` fused train rounds) as one jitted ``lax.scan`` with envs
    pinned to the ``data`` axis and learnable state replicated (or TP-split
    on a 2-D mesh). Used by the flagship trainer when ``Config.mesh_shape``
    is set."""
    repl = replicated(mesh)
    state_shardings = _abstract_state_shardings(cfg, agent, mesh)
    lut_repl = jax.device_put(lut, repl)
    return jax.jit(
        train_loop.make_epoch_fn(agent, cfg, lut_repl, rounds),
        in_shardings=(state_shardings, repl),
        out_shardings=(state_shardings, repl),
        donate_argnums=(0,),
    )
