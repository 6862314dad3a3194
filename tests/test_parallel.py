"""Multi-chip tests on the virtual 8-device CPU mesh (SURVEY.md §4: the
TPU-native answer to testing distributed without a cluster)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deep_active_inference_mc_tpu.config import Config
from deep_active_inference_mc_tpu.envs import dsprites as env_lib
from deep_active_inference_mc_tpu.envs import raster
from deep_active_inference_mc_tpu.infer.agent import ActiveInferenceAgent
from deep_active_inference_mc_tpu.parallel import mesh as mesh_lib
from deep_active_inference_mc_tpu.train import loop as train_loop


@pytest.fixture(scope="module")
def lut():
    return raster.build_sprite_lut()


def test_eight_devices_available():
    assert jax.device_count() >= 8  # conftest spoofing must be active


@pytest.mark.slow
def test_sharded_train_round(lut):
    n = 8
    cfg = Config(batch=2 * n, rounds=1, test_size=n, samples=1)
    agent = ActiveInferenceAgent(s_dim=cfg.s_dim, pi_dim=cfg.pi_dim)
    mesh = mesh_lib.make_mesh(n)
    state = train_loop.create_train_state(cfg, agent, jax.random.key(0))
    state = mesh_lib.shard_train_state(state, mesh)

    # Env state is actually sharded over the data axis.
    shard_counts = {
        len(state.env.latents.sharding.device_set),
        len(state.env.score.sharding.device_set),
    }
    assert shard_counts == {n}
    # Params replicated on all devices.
    some_param = jax.tree.leaves(state.params)[0]
    assert len(some_param.sharding.device_set) == n

    step = mesh_lib.make_sharded_train_round(agent, cfg, lut, mesh)
    state, metrics = step(state, jax.random.key(1))
    for k in ("F_top", "F_mid", "F_down", "omega"):
        assert np.isfinite(float(metrics[k])), k
    # Output shardings preserved.
    assert len(state.env.latents.sharding.device_set) == n


@pytest.mark.slow
def test_graft_dryrun_entry():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


@pytest.mark.slow
def test_sharded_matches_single_device(lut):
    """Data-parallel must be numerically equivalent to single-device
    execution for the same PRNG keys (pure SPMD, no algorithmic change)."""
    cfg = Config(batch=8, rounds=1, test_size=8, samples=1)
    agent = ActiveInferenceAgent(s_dim=cfg.s_dim, pi_dim=cfg.pi_dim)

    state1 = train_loop.create_train_state(cfg, agent, jax.random.key(0))
    step1 = train_loop.make_jit_train_round(agent, cfg, lut)
    state1, m1 = step1(state1, jax.random.key(7))

    mesh = mesh_lib.make_mesh(4)
    state2 = train_loop.create_train_state(cfg, agent, jax.random.key(0))
    state2 = mesh_lib.shard_train_state(state2, mesh)
    step2 = mesh_lib.make_sharded_train_round(agent, cfg, lut, mesh)
    state2, m2 = step2(state2, jax.random.key(7))

    np.testing.assert_allclose(
        float(m1["F_down"]), float(m2["F_down"]), rtol=2e-3
    )
    np.testing.assert_allclose(
        float(m1["omega"]), float(m2["omega"]), rtol=2e-3
    )
    # Same parameter updates modulo float reassociation across shards.
    p1 = jax.tree.leaves(state1.params["top"])[0]
    p2 = jax.tree.leaves(state2.params["top"])[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=5e-5)


@pytest.mark.slow
def test_determinism_fixed_keys(lut):
    """Same PRNG key -> bitwise-identical round outputs (explicit-rng design,
    SURVEY.md §7 'stochasticity under jit')."""
    cfg = Config(batch=8, rounds=1, test_size=8, samples=1)
    agent = ActiveInferenceAgent(s_dim=cfg.s_dim, pi_dim=cfg.pi_dim)
    outs = []
    for _ in range(2):
        state = train_loop.create_train_state(cfg, agent, jax.random.key(3))
        step = train_loop.make_jit_train_round(agent, cfg, lut)
        state, metrics = step(state, jax.random.key(9))
        outs.append(
            (
                np.asarray(jax.tree.leaves(state.params["mid"])[0]),
                float(metrics["F_down"]),
                np.asarray(state.env.latents),
            )
        )
    np.testing.assert_array_equal(outs[0][0], outs[1][0])
    assert outs[0][1] == outs[1][1]
    np.testing.assert_array_equal(outs[0][2], outs[1][2])


@pytest.mark.slow
def test_tensor_parallel_matches_single_device(lut):
    """dp x tp (4x2 mesh, Megatron column/row Dense splits) must match
    single-device training numerically: same F metrics, and parameter
    updates equal up to Adam's step-1 sign-noise on near-zero-gradient
    elements under float reassociation."""
    cfg = Config(batch=8, rounds=1, test_size=8, samples=1, tp=2)
    agent = ActiveInferenceAgent(s_dim=cfg.s_dim, pi_dim=cfg.pi_dim)

    state1 = train_loop.create_train_state(cfg, agent, jax.random.key(0))
    step1 = train_loop.make_jit_train_round(agent, cfg, lut)
    state1, m1 = step1(state1, jax.random.key(7))

    mesh = mesh_lib.make_mesh(8, n_model=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    state2 = train_loop.create_train_state(cfg, agent, jax.random.key(0))
    state2 = mesh_lib.shard_train_state(state2, mesh, cfg)
    # The big Dense chain is actually split: column layer shards its out
    # dim, row layer its in dim; conv kernels stay replicated.
    from jax.sharding import PartitionSpec as P

    assert state2.params["mid"]["Dense_0"]["kernel"].sharding.spec == P(
        None, "model"
    )
    assert state2.params["mid"]["Dense_1"]["kernel"].sharding.spec == P(
        "model", None
    )
    assert state2.params["down"]["encoder"]["Conv_0"]["kernel"].sharding.spec == P()
    # Adam mu mirrors the param sharding.
    mu_mid = state2.opt_states["mid"][0].mu["Dense_1"]["kernel"]
    assert mu_mid.sharding.spec == P("model", None)

    step2 = mesh_lib.make_sharded_train_round(agent, cfg, lut, mesh)
    state2, m2 = step2(state2, jax.random.key(7))

    np.testing.assert_allclose(
        float(m1["F_down"]), float(m2["F_down"]), rtol=2e-3
    )
    np.testing.assert_allclose(
        float(m1["omega"]), float(m2["omega"]), rtol=2e-3
    )
    diffs = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        state1.params,
        jax.device_get(state2.params),
    )
    assert max(jax.tree.leaves(diffs)) < 3e-4


@pytest.mark.slow
def test_multihost_wiring_single_host():
    """Multi-host path (SURVEY §2.10 stretch): the single-host invocation is
    a no-op, is_primary() is true, and a missing coordinator is rejected
    before touching jax.distributed."""
    import pytest as _pytest

    mesh_lib.initialize_multihost(None, num_hosts=1)  # no-op, no raise
    mesh_lib.initialize_multihost("ignored:1234", num_hosts=0)
    assert mesh_lib.is_primary()
    with _pytest.raises(ValueError, match="coordinator"):
        mesh_lib.initialize_multihost(None, num_hosts=2, host_id=0)
    # Mesh from a device subset (the host-local slice of a global list).
    m = mesh_lib.make_mesh(4)
    assert m.devices.size == 4 and m.axis_names == ("data",)


@pytest.mark.slow
def test_non_primary_host_writes_nothing(tmp_path, monkeypatch):
    """Process-0 gating: a non-primary trainer process trains but writes no
    checkpoints, config, stats or figures."""
    from deep_active_inference_mc_tpu.apps import train as train_app
    from deep_active_inference_mc_tpu.parallel import mesh as pm

    monkeypatch.setattr(pm, "is_primary", lambda: False)
    argv = [
        "--batch", "4", "--rounds", "2", "--test_size", "4",
        "--epochs", "1", "--samples", "1",
        "--sweep_envs", "4", "--sweep_steps", "2",
        "--out_root", str(tmp_path),
    ]
    train_app.main(argv)
    leftovers = [p for p in tmp_path.rglob("*") if p.is_file()]
    assert leftovers == [], leftovers
