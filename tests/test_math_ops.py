"""Golden-value tests for the closed-form math ops.

Every formula in ops/math.py is closed-form (reference torchutils.py:7-42),
so we test against hand-computed values and scipy-free numpy recomputations.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from deep_active_inference_mc_tpu.ops import math as m

pytestmark = pytest.mark.smoke  # pre-commit tier: `pytest -m smoke`


def test_kl_div_gaussian_zero_for_identical():
    mu = jnp.asarray([0.3, -1.2])
    logvar = jnp.asarray([0.1, -0.4])
    kl = m.kl_div_gaussian(mu, logvar, mu, logvar)
    np.testing.assert_allclose(np.asarray(kl), 0.0, atol=1e-6)


def test_kl_div_gaussian_golden():
    # KL[N(1, e^0) || N(0, e^0)] = 0.5 * mu^2 = 0.5
    kl = m.kl_div_gaussian(1.0, 0.0, 0.0, 0.0)
    np.testing.assert_allclose(float(kl), 0.5, atol=1e-6)
    # KL[N(0, 1) || N(0, e^1)]: 0.5*(1 - 0) + (1+0)/(2e) - 0.5 = 0.5 + 1/(2e) - 0.5
    kl = m.kl_div_gaussian(0.0, 0.0, 0.0, 1.0)
    np.testing.assert_allclose(float(kl), 0.5 + 1 / (2 * np.e) - 0.5, atol=1e-6)


def test_kl_div_precision_reduces_to_plain_at_omega_one():
    rng = np.random.RandomState(0)
    mu1, lv1, mu2, lv2 = (rng.randn(5).astype(np.float32) for _ in range(4))
    a = m.kl_div_gaussian_precision(mu1, lv1, mu2, lv2, 1.0)
    b = m.kl_div_gaussian(mu1, lv1, mu2, lv2)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)


def test_kl_div_precision_formula():
    # omega divides the prior variance: matches torchutils.py:7-8 exactly.
    mu1, lv1, mu2, lv2, om = 0.5, 0.2, -0.3, 0.7, 2.5
    expected = (
        0.5 * (lv2 - np.log(om) - lv1)
        + (np.exp(lv1) + (mu1 - mu2) ** 2) / (2.0 * np.exp(lv2) / om)
        - 0.5
    )
    got = float(m.kl_div_gaussian_precision(mu1, lv1, mu2, lv2, om))
    np.testing.assert_allclose(got, expected, rtol=1e-4)  # f32


def test_entropy_normal():
    # H of a standard normal = 0.5 * log(2 pi e)
    np.testing.assert_allclose(
        float(m.entropy_normal_from_logvar(0.0)),
        0.5 * np.log(2 * np.pi * np.e),
        rtol=1e-6,
    )


def test_entropy_bernoulli_max_at_half():
    p = jnp.asarray([0.5])
    h_half = float(m.entropy_bernoulli(p)[0])
    # -2 * 0.5 * log(1e-5 + 0.5)
    np.testing.assert_allclose(h_half, -np.log(0.50001), rtol=1e-5)
    assert float(m.entropy_bernoulli(jnp.asarray([0.01]))[0]) < h_half
    assert float(m.entropy_bernoulli(jnp.asarray([0.99]))[0]) < h_half


def test_log_bernoulli_golden():
    # x=1, p=0.9 -> log(0.90001); x=0, p=0.9 -> log(0.10001)
    np.testing.assert_allclose(
        float(m.log_bernoulli(1.0, 0.9)), np.log(0.90001), rtol=1e-4
    )
    np.testing.assert_allclose(
        float(m.log_bernoulli(0.0, 0.9)), np.log(1e-5 + 0.1), rtol=1e-4
    )


def test_calc_reward_template():
    # A "perfect" observation (left half of strip all 1, right all 0) must
    # score the max possible log-likelihood: 64*3 pixels * log(1+1e-5)-ish.
    o = np.zeros((2, 64, 64, 1), np.float32)
    o[:, 0:3, 0:32] = 1.0
    val = np.asarray(m.calc_reward(jnp.asarray(o)))
    assert val.shape == (2, 3, 64, 1)
    np.testing.assert_allclose(val.sum(), 2 * 3 * 64 * np.log(1 + 1e-5), atol=1e-3)
    # Inverted observation is maximally unlikely.
    o_bad = np.zeros((1, 64, 64, 1), np.float32)
    o_bad[:, 0:3, 32:64] = 1.0
    val_bad = float(np.asarray(m.calc_reward(jnp.asarray(o_bad))).sum())
    assert val_bad < 3 * 64 * np.log(1e-5) * 0.9


def test_softmax_multi_with_log_matches_reference_formula():
    rng = np.random.RandomState(1)
    x = rng.randn(8, 4).astype(np.float32) * 5
    sm, log_sm = m.softmax_multi_with_log(jnp.asarray(x.reshape(-1)), 4)
    # reference formula (util.py:46-53)
    xs = x - x.max(1, keepdims=True)
    e_x = np.exp(xs / 10.0)
    ref_sm = e_x / e_x.sum(1, keepdims=True)
    ref_log = xs - np.log(e_x.sum(1, keepdims=True) + 1e-20)
    np.testing.assert_allclose(np.asarray(sm), ref_sm, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(log_sm), ref_log, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sm).sum(1), 1.0, rtol=1e-5)


def test_compute_omega_limits():
    # kl << b -> omega -> a + d ; kl >> b -> omega -> d ; kl = b -> a/2 + d
    a, b, c, d = 1.0, 25.0, 5.0, 1.5
    np.testing.assert_allclose(
        float(m.compute_omega(jnp.asarray(0.0), a, b, c, d)), a + d, atol=0.02
    )
    np.testing.assert_allclose(
        float(m.compute_omega(jnp.asarray(1e3), a, b, c, d)), d, atol=1e-5
    )
    np.testing.assert_allclose(
        float(m.compute_omega(jnp.asarray(b), a, b, c, d)), a / 2 + d, atol=1e-6
    )


def test_total_correlation_independent_vs_correlated():
    rng = np.random.RandomState(2)
    indep = rng.randn(4000, 6)
    tc_indep = m.total_correlation(indep)
    z = rng.randn(4000, 1)
    corr = np.hstack([z + 0.1 * rng.randn(4000, 1) for _ in range(6)])
    tc_corr = m.total_correlation(corr)
    assert tc_indep == pytest.approx(0.0, abs=0.05)
    assert tc_corr > 1.0
