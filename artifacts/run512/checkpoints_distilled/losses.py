"""The three staged variational-free-energy losses.

Rebuild of ``/root/reference/src/torchloss.py``: the paper's free energy is
split into three independently-optimized layer losses with explicit gradient
isolation at every layer boundary (the reference's ``.detach()`` calls,
torchloss.py:66-93, become ``jax.lax.stop_gradient`` at the call sites in
``train.loop``).

  F_top  = D_KL[Q(pi|s) || P(pi)]                     (torchloss.py:18-26)
  F_mid  = D_KL[Q(s1|o1) || P(s1|s0,pi)] * omega       (torchloss.py:28-37)
  F_down = -beta_o E[log P(o1|s1)]
           + beta_s * gamma-gated mixture of KL against the transition prior
             and KL against N(0,1)                     (torchloss.py:39-63)

The gamma gate (hard switches at gamma<=0.05 / >=0.95, else a convex
mixture) is expressed with ``jnp.where`` so gamma stays a *dynamic* scalar —
the annealing schedule never recompiles the train step.

Dropout is live in every loss forward (training regime), with explicit rngs.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from deep_active_inference_mc_tpu.infer.agent import ActiveInferenceAgent, Params
from deep_active_inference_mc_tpu.infer.precision import PrecisionState
from deep_active_inference_mc_tpu.models.networks import reparameterize
from deep_active_inference_mc_tpu.ops import math as m


def compute_kl_div_pi(
    agent: ActiveInferenceAgent,
    params,
    key: jax.Array,
    o0: jax.Array,
    log_Ppi: jax.Array,
):
    """D_KL[Q(pi|s(o0)) || P(pi)] from observations.

    The reference declares this (torchloss.py:11-16) but it is dead code
    calling a nonexistent ``encode_o_and_sample_s`` (SURVEY.md §2.5); this
    is the working intended form."""
    qs0, _, _ = agent.encode_with_sample(params, key, o0, dropout=True)
    _, q_pi, log_q_pi = agent.habit(params, qs0)
    return m.kl_div_categorical(q_pi, log_q_pi, log_Ppi)


def compute_loss_top(
    agent: ActiveInferenceAgent, top_params, s: jax.Array, log_Ppi: jax.Array
):
    """F_top = D_KL[Q(pi|s0) || P(pi)] (torchloss.py:18-26)."""
    _, q_pi, log_q_pi = agent.top.apply({"params": top_params}, s)
    kl_div_pi_anal = q_pi * (log_q_pi - log_Ppi)
    kl_div_pi = jnp.sum(kl_div_pi_anal, axis=-1)
    F_top = kl_div_pi
    return F_top, (kl_div_pi, kl_div_pi_anal, q_pi)


def compute_loss_mid(
    agent: ActiveInferenceAgent,
    mid_params,
    key: jax.Array,
    s0: jax.Array,
    Ppi_sampled: jax.Array,
    qs1_mean: jax.Array,
    qs1_logvar: jax.Array,
    omega: jax.Array,
):
    """F_mid = omega-weighted D_KL[Q(s1) || P(s1|s0,pi)] (torchloss.py:28-37).

    The transition runs with live dropout (a theta draw per row)."""
    k_drop, k_samp = jax.random.split(key)
    ps1_mean, ps1_logvar = agent.mid.apply(
        {"params": mid_params}, Ppi_sampled, s0, True, rngs={"dropout": k_drop}
    )
    ps1 = reparameterize(k_samp, ps1_mean, ps1_logvar)
    kl_div_s_anal = m.kl_div_gaussian_precision(
        qs1_mean, qs1_logvar, ps1_mean, ps1_logvar, omega
    )
    kl_div_s = jnp.sum(kl_div_s_anal, axis=-1)
    F_mid = kl_div_s
    return F_mid, ((kl_div_s, kl_div_s_anal), ps1, ps1_mean, ps1_logvar)


def compute_loss_down(
    agent: ActiveInferenceAgent,
    down_params,
    key: jax.Array,
    o1: jax.Array,
    ps1_mean: jax.Array,
    ps1_logvar: jax.Array,
    omega: jax.Array,
    precision: PrecisionState,
    displacement: float = 1e-5,
    vae_dropout: bool = True,
):
    """F_down = -beta_o log P(o1|s1) + beta_s * gamma-gated KL mixture
    (torchloss.py:39-63). ``vae_dropout`` gates the encoder/decoder dropout
    (see Config.vae_train_dropout)."""
    k_enc, k_samp, k_dec = jax.random.split(key, 3)
    rngs_e = {"dropout": k_enc} if vae_dropout else {}
    rngs_d = {"dropout": k_dec} if vae_dropout else {}
    qs1_mean, qs1_logvar = agent.down.apply(
        {"params": down_params}, o1, vae_dropout,
        method=type(agent.down).encode, rngs=rngs_e,
    )
    qs1 = reparameterize(k_samp, qs1_mean, qs1_logvar)
    po1 = agent.down.apply(
        {"params": down_params}, qs1, vae_dropout,
        method=type(agent.down).decode, rngs=rngs_d,
    )

    # E[log P(o1|s1)]: displaced binary cross-entropy (torchloss.py:45-46).
    bin_cross_entr = o1 * jnp.log(displacement + po1) + (1.0 - o1) * jnp.log(
        displacement + 1.0 - po1
    )
    logpo1_s1 = jnp.sum(bin_cross_entr, axis=(-3, -2, -1))

    kl_div_s_naive_anal = m.kl_div_gaussian_precision(
        qs1_mean, qs1_logvar, 0.0, 0.0, omega
    )
    kl_div_s_naive = jnp.sum(kl_div_s_naive_anal, axis=-1)
    kl_div_s_anal = m.kl_div_gaussian_precision(
        qs1_mean, qs1_logvar, ps1_mean, ps1_logvar, omega
    )
    kl_div_s = jnp.sum(kl_div_s_anal, axis=-1)

    gamma = precision.gamma
    mix = jnp.where(
        gamma <= 0.05,
        kl_div_s_naive,
        jnp.where(
            gamma >= 0.95,
            kl_div_s,
            gamma * kl_div_s + (1.0 - gamma) * kl_div_s_naive,
        ),
    )
    F = -precision.beta_o * logpo1_s1 + precision.beta_s * mix
    loss_terms = (
        -logpo1_s1,
        kl_div_s,
        kl_div_s_anal,
        kl_div_s_naive,
        kl_div_s_naive_anal,
    )
    return F, (loss_terms, po1, qs1)
