"""Train-loop tests: staged updates, gradient isolation, smoke training."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deep_active_inference_mc_tpu.config import Config
from deep_active_inference_mc_tpu.envs import raster
from deep_active_inference_mc_tpu.infer.agent import ActiveInferenceAgent
from deep_active_inference_mc_tpu.infer.precision import (
    OmegaParams,
    PrecisionState,
    anneal_gamma,
)
from deep_active_inference_mc_tpu.train import loop as train_loop
from deep_active_inference_mc_tpu.train import losses
from deep_active_inference_mc_tpu.train.evaluate import make_jit_eval

pytestmark = pytest.mark.smoke  # pre-commit tier: `pytest -m smoke`


@pytest.fixture(scope="module")
def cfg():
    return Config(batch=8, rounds=2, test_size=16, samples=1, deepness=1)


@pytest.fixture(scope="module")
def agent(cfg):
    return ActiveInferenceAgent(s_dim=cfg.s_dim, pi_dim=cfg.pi_dim)


@pytest.fixture(scope="module")
def lut():
    return raster.build_sprite_lut()


def test_down_loss_gamma_gate(agent):
    params = agent.init(jax.random.key(0))
    key = jax.random.key(1)
    o1 = jax.random.uniform(jax.random.key(2), (4, 64, 64, 1))
    ps1_mean = jnp.zeros((4, 10))
    ps1_logvar = jnp.zeros((4, 10))
    omega = jnp.full((4, 1), 2.0)

    def F_at(gamma):
        prec = PrecisionState.create(gamma=gamma)
        F, (terms, _, _) = losses.compute_loss_down(
            agent, params["down"], key, o1, ps1_mean, ps1_logvar, omega, prec
        )
        return float(F.mean()), terms

    F_low, terms = F_at(0.0)
    F_hi, _ = F_at(1.0)
    F_mid_val, _ = F_at(0.5)
    # gamma<=0.05 uses the naive KL; gamma>=0.95 the transition KL; the
    # middle a convex mixture (torchloss.py:56-61).
    nll = float(terms[0].mean())
    kl_s = float(terms[1].mean())
    kl_naive = float(terms[3].mean())
    np.testing.assert_allclose(F_low, nll + kl_naive, rtol=1e-4)
    np.testing.assert_allclose(F_hi, nll + kl_s, rtol=1e-4)
    np.testing.assert_allclose(
        F_mid_val, nll + 0.5 * kl_s + 0.5 * kl_naive, rtol=1e-3
    )


def test_train_round_runs_and_updates(cfg, agent, lut):
    state = train_loop.create_train_state(cfg, agent, jax.random.key(0))
    step = train_loop.make_jit_train_round(agent, cfg, lut)
    old_params = jax.tree.map(lambda x: np.asarray(x).copy(), state.params)
    state, metrics = step(state, jax.random.key(1))
    for k in ("F_top", "F_mid", "F_down", "omega", "kl_pi"):
        assert np.isfinite(float(metrics[k])), k
    # Every layer's params moved.
    for layer in ("top", "mid", "down"):
        diffs = jax.tree.map(
            lambda a, b: float(np.abs(np.asarray(a) - b).max()),
            state.params[layer],
            old_params[layer],
        )
        assert max(jax.tree.leaves(diffs)) > 0, layer


@pytest.mark.slow
def test_freeze_top_withholds_only_the_top_update(agent, lut):
    cfg = Config(batch=8, rounds=2, test_size=16, freeze_top=True)
    state = train_loop.create_train_state(cfg, agent, jax.random.key(0))
    step = train_loop.make_jit_train_round(agent, cfg, lut)
    old_params = jax.tree.map(lambda x: np.asarray(x).copy(), state.params)
    old_opt_top = jax.tree.map(
        lambda x: np.asarray(x).copy(), state.opt_states["top"]
    )
    state, metrics = step(state, jax.random.key(1))
    # omega still flows from the live habit KL.
    assert np.isfinite(float(metrics["kl_pi"]))
    assert np.isfinite(float(metrics["omega"]))
    # top params AND top Adam state are bit-frozen; mid/down still move.
    for tree_new, tree_old in (
        (state.params["top"], old_params["top"]),
        (state.opt_states["top"], old_opt_top),
    ):
        diffs = jax.tree.map(
            lambda a, b: float(np.abs(np.asarray(a, dtype=np.float64)
                                      - np.asarray(b, dtype=np.float64)).max()),
            tree_new, tree_old,
        )
        assert max(jax.tree.leaves(diffs)) == 0.0
    for layer in ("mid", "down"):
        diffs = jax.tree.map(
            lambda a, b: float(np.abs(np.asarray(a) - b).max()),
            state.params[layer], old_params[layer],
        )
        assert max(jax.tree.leaves(diffs)) > 0, layer


@pytest.mark.slow
def test_gen_habit_mix_changes_behavior_not_target(agent, lut):
    """gen_habit_mix reshapes the executed-action distribution while the
    top-loss target log_Ppi stays the pure softmax(-G) prior."""
    from deep_active_inference_mc_tpu.envs import dsprites as env_lib
    from deep_active_inference_mc_tpu.envs.data import (
        make_batch_active_inference,
    )

    params = agent.init(jax.random.key(0))
    key = jax.random.key(3)
    env = env_lib.reset(jax.random.key(4), 64)

    def run(mix):
        cfg = Config(batch=64, gen_habit_mix=mix)
        return make_batch_active_inference(agent, cfg, params, key, env, lut)

    _, o0_a, _, pi0_a, logp_a = run(0.0)
    _, o0_b, _, pi0_b, logp_b = run(1.0)
    # Same PRNG + envs: identical o0 and identical top-loss target.
    np.testing.assert_array_equal(np.asarray(o0_a), np.asarray(o0_b))
    np.testing.assert_allclose(
        np.asarray(logp_a), np.asarray(logp_b), rtol=1e-6
    )
    # mix=1.0 samples from the habit distribution — with the same action
    # key, at least one of 64 envs picks a different action unless the two
    # policies are identical (they are not for random init).
    assert np.abs(np.asarray(pi0_a) - np.asarray(pi0_b)).max() > 0


@pytest.mark.slow
def test_epoch_scan_and_gamma_anneal(cfg, agent, lut):
    state = train_loop.create_train_state(cfg, agent, jax.random.key(0))
    epoch_fn = train_loop.make_jit_epoch(agent, cfg, lut, rounds=2)
    state, metrics = epoch_fn(state, jax.random.key(1))
    assert np.isfinite(float(metrics["F_down"]))
    # anneal_gamma host-side schedule.
    prec = state.precision
    assert float(prec.gamma) == 0.0
    prec = anneal_gamma(prec, epoch=31)
    np.testing.assert_allclose(float(prec.gamma), 0.01, rtol=1e-5)
    prec = anneal_gamma(prec, epoch=10)
    np.testing.assert_allclose(float(prec.gamma), 0.01, rtol=1e-5)
    prec = prec.replace(gamma=jnp.asarray(0.799))
    prec = anneal_gamma(prec, epoch=100)
    np.testing.assert_allclose(float(prec.gamma), 0.8, rtol=1e-5)


@pytest.mark.slow
def test_eval_pass(cfg, agent, lut):
    state = train_loop.create_train_state(cfg, agent, jax.random.key(0))
    eval_fn = make_jit_eval(agent, cfg, lut)
    ev = jax.device_get(eval_fn(state.params, state.precision, jax.random.key(2)))
    for k in ("F", "F_top", "F_mid", "F_down", "mse_o", "kl_div_pi", "mse_r"):
        assert np.isfinite(float(ev[k])), k
    assert ev["kl_div_s_anal"].shape == (cfg.s_dim,)
    assert ev["s0"].shape == (cfg.test_size, cfg.s_dim)
    assert ev["S0_real"].shape == (cfg.test_size, 6)
    # Pixel NLL of an untrained model must be far above the "perfect" line.
    assert float(ev["mse_o"]) > 60.0


@pytest.mark.slow
def test_loss_decreases_over_short_training(cfg, agent, lut):
    """Smoke training: 30 rounds must reduce the down loss (pixel NLL)."""
    state = train_loop.create_train_state(cfg, agent, jax.random.key(0))
    step = train_loop.make_jit_train_round(agent, cfg, lut)
    first, last = None, None
    for i in range(30):
        state, metrics = step(state, jax.random.key(100 + i))
        nll = float(metrics["nll_o"])
        if i < 3:
            first = nll if first is None else min(first, nll)
        last = nll
    assert last < first, (first, last)


def test_omega_params_eval_value():
    assert OmegaParams(1.0, 25.0, 5.0, 1.5).eval_omega == 2.0
