"""Closed-form probabilistic math ops used by losses and the EFE engine.

Functional parity with the reference's ``src/torchutils.py`` (see
``/root/reference/src/torchutils.py:7-42``) and the numerically-stabilized
softmax-with-log from ``/root/reference/src/util.py:46-53``, re-expressed as
pure JAX functions. All ops are elementwise/VPU-friendly and fuse into the
surrounding jitted computation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

LOG_2_PI = float(np.log(2.0 * np.pi))
LOG_2_PI_E = float(np.log(2.0 * np.pi * np.e))


def kl_div_gaussian_precision(mu1, logvar1, mu2, logvar2, omega):
    """Precision-weighted analytic Gaussian KL, elementwise per latent dim.

    KL[N(mu1, e^logvar1) || N(mu2, e^logvar2 / omega)] — the top-down
    transition precision ``omega`` divides the prior's variance
    (reference: torchutils.py:7-8).
    """
    return (
        0.5 * (logvar2 - jnp.log(omega) - logvar1)
        + (jnp.exp(logvar1) + jnp.square(mu1 - mu2))
        / (2.0 * jnp.exp(logvar2) / omega)
        - 0.5
    )


def kl_div_gaussian(mu1, logvar1, mu2, logvar2):
    """Analytic Gaussian KL, elementwise (reference: torchutils.py:11-12)."""
    return (
        0.5 * (logvar2 - logvar1)
        + (jnp.exp(logvar1) + jnp.square(mu1 - mu2)) / (2.0 * jnp.exp(logvar2))
        - 0.5
    )


def kl_div_categorical(q, log_q, log_p, axis=-1):
    """D_KL[Q || P] for categorical distributions given log-probs."""
    return jnp.sum(q * (log_q - log_p), axis=axis)


def entropy_normal_from_logvar(logvar):
    """Gaussian differential entropy per dim (reference: torchutils.py:22-23)."""
    return 0.5 * (LOG_2_PI_E + logvar)


def entropy_bernoulli(p, displacement=1e-5):
    """Bernoulli entropy per pixel (reference: torchutils.py:26-27)."""
    return -(1.0 - p) * jnp.log(displacement + 1.0 - p) - p * jnp.log(
        displacement + p
    )


def log_bernoulli(x, p, displacement=1e-5):
    """Bernoulli log-likelihood per pixel (reference: torchutils.py:30-31)."""
    return x * jnp.log(displacement + p) + (1.0 - x) * jnp.log(
        displacement + 1.0 - p
    )


def calc_reward(o, resolution=64):
    """Log-likelihood of the observation's reward strip under the "perfect"
    preference template: rows 0-2 all-ones on the left half, zeros on the
    right (reference: torchutils.py:34-37).

    Args:
      o: observations, shape (..., H, W, C) with H = W = ``resolution``.
    Returns:
      per-pixel log-Bernoulli over the 3-row strip, shape (..., 3, W, C).
    """
    half = resolution // 2
    cols = jnp.arange(resolution)
    perfect = (cols < half).astype(o.dtype)[None, :, None]  # (3,W,1)-broadcast
    return log_bernoulli(o[..., 0:3, 0:resolution, :], perfect)


def softmax_multi_with_log(x, single_values=4, eps=1e-20, temperature=10.0):
    """Temperature softmax over groups of ``single_values`` scores plus the
    max-shifted log-numerator (reference: util.py:46-53).

    Matches the reference exactly: the softmax uses x/temperature but the
    returned ``logSM`` is the *unscaled* shifted score minus log-sum-exp of
    the scaled scores (this asymmetry is load-bearing for loss parity).
    """
    x = x.reshape(-1, single_values)
    x = x - jnp.max(x, axis=1, keepdims=True)
    e_x = jnp.exp(x / temperature)
    denom = jnp.sum(e_x, axis=1, keepdims=True)
    sm = e_x / denom
    log_sm = x - jnp.log(denom + eps)
    return sm, log_sm


def total_correlation(data):
    """Disentanglement metric: 0.5*(sum log diag(Cov) - logdet(Cov))
    (reference: torchutils.py:40-42). Host-side numpy, used in eval only.
    """
    data = np.asarray(data)
    cov = np.cov(data.T)
    return 0.5 * (np.log(np.diag(cov)).sum() - np.linalg.slogdet(cov)[1])


def compute_omega(kl_pi, a, b, c, d):
    """State-transition precision: reversed sigmoid of habit-policy surprise,
    omega = a * (1 - sigmoid((kl_pi - b)/c)) + d (reference: torchloss.py:8-9).
    """
    return a * (1.0 - jax.nn.sigmoid((kl_pi - b) / c)) + d
