"""Causal model family tests (reference scaffold completed — SURVEY.md §2.8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deep_active_inference_mc_tpu.config import Config
from deep_active_inference_mc_tpu.envs import raster
from deep_active_inference_mc_tpu.models.causal import StructuralCausalModel
from deep_active_inference_mc_tpu.train import causal as causal_lib


@pytest.fixture(scope="module")
def cfg():
    return Config(batch=8, test_size=8, rounds=1)


@pytest.fixture(scope="module")
def model(cfg):
    return StructuralCausalModel(s_dim=cfg.s_dim, resolution=64)


@pytest.fixture(scope="module")
def lut():
    return raster.build_sprite_lut()


def test_roundtrip_shapes(model):
    params = model.init(jax.random.key(0), jnp.zeros((2, 64, 64, 1)))["params"]
    x = jax.random.uniform(jax.random.key(1), (2, 64, 64, 1))
    recon, s = model.apply({"params": params}, x)
    assert recon.shape == (2, 64, 64, 1)
    assert s.shape == (2, 10)
    assert float(recon.min()) >= 0 and float(recon.max()) <= 1


def test_counterfactual_changes_decode(model):
    params = model.init(jax.random.key(0), jnp.zeros((2, 64, 64, 1)))["params"]
    x = jax.random.uniform(jax.random.key(1), (2, 64, 64, 1))
    recon, s = model.apply({"params": params}, x)
    delta = jnp.zeros((2, 10)).at[:, 0].set(3.0)
    cf, s_cf = model.apply(
        {"params": params}, x, delta,
        method=StructuralCausalModel.counterfactual,
    )
    np.testing.assert_allclose(np.asarray(s_cf), np.asarray(s + delta), rtol=1e-5)
    assert float(jnp.abs(cf - recon).mean()) > 1e-6
    # Zero intervention must reproduce the plain decode.
    cf0, _ = model.apply(
        {"params": params}, x, jnp.zeros((2, 10)),
        method=StructuralCausalModel.counterfactual,
    )
    np.testing.assert_allclose(np.asarray(cf0), np.asarray(recon), rtol=1e-5)


@pytest.mark.slow
def test_causal_training_reduces_loss(cfg, model, lut):
    state, opt = causal_lib.create_causal_state(
        cfg, model, jax.random.key(0), lr=1e-3
    )
    round_fn = causal_lib.make_jit_causal_round(model, cfg, opt, lut)
    first, last = None, None
    for i in range(25):
        state, metrics = round_fn(state, jax.random.key(i))
        mse = float(metrics["mse_o"])
        if i < 3:
            first = mse if first is None else min(first, mse)
        last = mse
    assert np.isfinite(last)
    assert last < first


def test_causal_eval(cfg, model, lut):
    state, opt = causal_lib.create_causal_state(cfg, model, jax.random.key(0))
    eval_fn = causal_lib.make_jit_causal_eval(model, cfg, lut)
    ev = jax.device_get(eval_fn(state.params, state.precision, jax.random.key(1)))
    for k in ("F", "mse_o", "kl_div_s", "omega", "cf_effect"):
        assert np.isfinite(float(ev[k])), k
    assert ev["s"].shape == (cfg.test_size, cfg.s_dim)
    assert ev["S0_real"].shape == (cfg.test_size, 6)
