"""Expected-free-energy (EFE, "G") Monte-Carlo engine.

TPU-native rebuild of the G-estimation family
(``/root/reference/src/torchmodel.py:227-393``), implementing the paper's
Eq. 8 decomposition  G = -(a) + (b) + (c):

  term0 (a, extrinsic):       E[log P(o|pi)] — reward-strip log-likelihood of
                              imagined frames against the preference template.
  term1 (b, state epistemic): -Σ[H(s1|pi) + H(s1|o1,pi)] from Gaussian
                              entropies of the transition prior and the
                              re-encoded posterior.
  term2 (c, model epistemic): H(o|s,theta,pi) - H(o|s,pi): Bernoulli pixel
                              entropy of decodes from dropout-resampled
                              transitions (theta-sampling) minus decodes from
                              reparameterized samples under a fixed theta.

TPU-first design: the reference's per-sample Python loops
(torchmodel.py:273-293) become *sample-folded batches* — MC samples are
tiled into the batch axis so every network runs once per G call on a
(samples*batch)-row matmul that tiles cleanly onto the MXU. Flax dropout
masks are elementwise, so each folded row draws an independent theta; the MC
average over samples estimates the same expectation as the reference's
shared-theta-per-sample loop (and with strictly more theta diversity).
Multi-step lookahead (torchmodel.py:236-244) is a ``lax.scan``.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from deep_active_inference_mc_tpu.infer.agent import ActiveInferenceAgent, Params
from deep_active_inference_mc_tpu.models.networks import reparameterize
from deep_active_inference_mc_tpu.ops import math as m


def _tile(x: jax.Array, n: int) -> jax.Array:
    """Repeat along a new leading sample axis and fold it into batch."""
    return jnp.broadcast_to(x, (n,) + x.shape).reshape((n * x.shape[0],) + x.shape[1:])


def _unfold(x: jax.Array, n: int) -> jax.Array:
    return x.reshape((n, -1) + x.shape[1:])


def _sum_entropy_bernoulli(po: jax.Array) -> jax.Array:
    return jnp.sum(m.entropy_bernoulli(po), axis=(-3, -2, -1))


def calculate_G(
    agent: ActiveInferenceAgent,
    params: Params,
    key: jax.Array,
    s0: jax.Array,
    pi0: jax.Array,
    samples: int = 10,
):
    """MC estimate of G for a batch of (state, action) pairs
    (torchmodel.py:270-300).

    Args:
      s0: (B, s_dim); pi0: (B, pi_dim) one-hot.
    Returns:
      (G, [term0, term1, term2], ps1, ps1_mean, po1) with G/terms (B,);
      ps1/ps1_mean are the *last* MC sample's transition draw and po1 its
      decode — mirroring the reference, which threads the final loop
      iterate's tensors into multi-step rollouts (torchmodel.py:237-243).
    """
    B = s0.shape[0]
    k1, k2, k3, k4 = jax.random.split(key, 4)
    s0_r = _tile(s0, samples)
    pi_r = _tile(pi0, samples)

    # ---- pass 1: theta+state sampling for terms (a) and (b) --------------
    ps1, ps1_mean, ps1_logvar = agent.transition_with_sample(
        params, k1, pi_r, s0_r, dropout=True
    )
    po1 = agent.decode(params, ps1)
    _, _, qs1_logvar = agent.encode_with_sample(params, k2, po1)

    term0 = jnp.mean(_unfold(agent.check_reward(po1), samples), axis=0)
    h = jnp.sum(
        m.entropy_normal_from_logvar(ps1_logvar)
        + m.entropy_normal_from_logvar(qs1_logvar),
        axis=-1,
    )
    term1 = jnp.mean(_unfold(-h, samples), axis=0)

    # Last sample's theta output threads onward (reference keeps loop-final
    # ps1/ps1_mean/ps1_logvar/po1).
    ps1_last = _unfold(ps1, samples)[-1]
    ps1_mean_last = _unfold(ps1_mean, samples)[-1]
    ps1_logvar_last = _unfold(ps1_logvar, samples)[-1]
    po1_last = _unfold(po1, samples)[-1]

    # ---- pass 2: term (c) — fresh thetas vs fixed theta -------------------
    ps1_b, _, _ = agent.transition_with_sample(
        params, k3, pi_r, s0_r, dropout=True
    )
    term2_1 = jnp.mean(
        _unfold(_sum_entropy_bernoulli(agent.decode(params, ps1_b)), samples),
        axis=0,
    )
    s_fixed = reparameterize(
        k4, _tile(ps1_mean_last, samples), _tile(ps1_logvar_last, samples)
    )
    term2_2 = jnp.mean(
        _unfold(_sum_entropy_bernoulli(agent.decode(params, s_fixed)), samples),
        axis=0,
    )
    term2 = term2_1 - term2_2

    G = -term0 + term1 + term2
    return G, [term0, term1, term2], ps1_last, ps1_mean_last, po1_last


def calculate_G_mean(
    agent: ActiveInferenceAgent,
    params: Params,
    key: jax.Array,
    s0: jax.Array,
    pi0: jax.Array,
):
    """Deterministic single-pass G using transition means
    (torchmodel.py:302-327). One theta is still sampled per pass — the
    reference's dropout is live here too."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    _, ps1_mean, ps1_logvar = agent.transition_with_sample(
        params, k1, pi0, s0, dropout=True
    )
    po1 = agent.decode(params, ps1_mean)
    _, _, qs1_logvar = agent.encode_with_sample(params, k2, po1)

    term0 = agent.check_reward(po1)
    term1 = -jnp.sum(
        m.entropy_normal_from_logvar(ps1_logvar)
        + m.entropy_normal_from_logvar(qs1_logvar),
        axis=-1,
    )
    # Fresh theta, decode its *mean* (torchmodel.py:315).
    _, mean_b, _ = agent.transition_with_sample(params, k3, pi0, s0, dropout=True)
    term2_1 = _sum_entropy_bernoulli(agent.decode(params, mean_b))
    # Fixed theta, reparameterized sample (torchmodel.py:319).
    term2_2 = _sum_entropy_bernoulli(
        agent.decode(params, reparameterize(k4, ps1_mean, ps1_logvar))
    )
    term2 = term2_1 - term2_2

    G = -term0 + term1 + term2
    return G, [term0, term1, term2], ps1_mean, po1


def calculate_G_repeated(
    agent: ActiveInferenceAgent,
    params: Params,
    key: jax.Array,
    o: jax.Array,
    pi: jax.Array,
    steps: int = 1,
    calc_mean: bool = False,
    samples: int = 10,
    mean_estimator: bool = False,
):
    """Roll G forward ``steps`` imagination steps under a fixed action,
    accumulating terms (torchmodel.py:227-245). ``calc_mean`` feeds the
    transition mean (vs sample) forward; the per-step estimator is the
    sampled ``calculate_G`` — matching the reference exactly — unless
    ``mean_estimator`` selects the deterministic ``calculate_G_mean``
    (the estimator the demo's --mean eval agents use,
    torchmodel.py:302-327). Measured on the epoch-797 checkpoint: the
    sampled estimator's per-class edge signal is +1.4±2.0 nats (the
    reparam-sampled decode washes the reward strip out) vs +17.6±1.0 for
    the mean estimator — ``mean_estimator=True`` is what makes the
    generator's softmax(-G) prior carry the task signal."""
    k_enc, k_scan = jax.random.split(key)
    qs0, qs0_mean, _ = agent.encode_with_sample(params, k_enc, o)
    s0 = qs0_mean if calc_mean else qs0

    def step_fn(carry, k):
        s0_t = carry
        if mean_estimator:
            G, terms, ps1_mean, po1 = calculate_G_mean(
                agent, params, k, s0_t, pi
            )
            s1 = ps1_mean
        else:
            G, terms, s1, ps1_mean, po1 = calculate_G(
                agent, params, k, s0_t, pi, samples=samples
            )
        s_next = ps1_mean if calc_mean else s1
        return s_next, (G, terms[0], terms[1], terms[2], po1)

    _, (Gs, t0, t1, t2, po1s) = jax.lax.scan(
        step_fn, s0, jax.random.split(k_scan, steps)
    )
    sum_G = jnp.sum(Gs, axis=0)
    sum_terms = [jnp.sum(t0, axis=0), jnp.sum(t1, axis=0), jnp.sum(t2, axis=0)]
    return sum_G, sum_terms, po1s[-1]


def calculate_G_4_repeated(
    agent: ActiveInferenceAgent,
    params: Params,
    key: jax.Array,
    o: jax.Array,
    steps: int = 1,
    calc_mean: bool = False,
    samples: int = 10,
):
    """G for *all* actions of each observation (torchmodel.py:247-268),
    generalized from the reference's single-observation form to a batch.

    Args:
      o: (B, H, W, C).
    Returns:
      (sum_G, sum_terms, po1) with shapes (B, pi_dim).
    """
    B = o.shape[0]
    A = agent.pi_dim
    k_enc, k_scan = jax.random.split(key)
    qs0, qs0_mean, _ = agent.encode_with_sample(params, k_enc, o)
    s0 = qs0_mean if calc_mean else qs0
    # Tile each state against every one-hot action: rows ordered
    # (b0,a0),(b0,a1),... matching the reference's tile-by-pi_dim trick
    # (mcts.py:17, util.py:57-60).
    s0_r = jnp.repeat(s0, A, axis=0)
    pi_r = jnp.tile(agent.pi_one_hot, (B, 1))

    def step_fn(carry, k):
        s0_t = carry
        if calc_mean:
            G, terms, ps1_mean, po1 = calculate_G_mean(
                agent, params, k, s0_t, pi_r
            )
            s_next = ps1_mean
        else:
            G, terms, s1, ps1_mean, po1 = calculate_G(
                agent, params, k, s0_t, pi_r, samples=samples
            )
            s_next = s1
        return s_next, (G, terms[0], terms[1], terms[2], po1)

    _, (Gs, t0, t1, t2, po1s) = jax.lax.scan(
        step_fn, s0_r, jax.random.split(k_scan, steps)
    )
    sum_G = jnp.sum(Gs, axis=0).reshape(B, A)
    sum_terms = [
        jnp.sum(t, axis=0).reshape(B, A) for t in (t0, t1, t2)
    ]
    return sum_G, sum_terms, po1s[-1]


def calculate_G_4_repeated_crn(
    agent: ActiveInferenceAgent,
    params: Params,
    key: jax.Array,
    o: jax.Array,
    steps: int = 1,
    calc_mean: bool = False,
    samples: int = 10,
    mean_estimator: bool = False,
):
    """All-actions G with **common random numbers** across the action axis.

    TPU-native enhancement with no reference analogue (the torch port's
    implicit global RNG draws independent dropout/reparam noise for every
    tiled row, util.py:57-62, so the per-state *difference* G(a)-G(a') is
    dominated by MC noise at samples=1). Explicit-key RNG lets every action
    lane reuse the identical dropout masks and sample draws: the estimator
    per action column is *exactly* ``calculate_G_repeated(key, o, pi=a)``
    (same expectation, bit-equal per column), but differences between
    actions become nearly noise-free at identical FLOP cost — which is what
    the temperature-10 softmax(-G) action prior (util.py:68) actually
    consumes.

    Returns (sum_G, sum_terms, po1) with sum_G/terms shaped (B, pi_dim).
    """
    B = o.shape[0]

    def one_action(pi_row):
        pi = jnp.broadcast_to(pi_row, (B, agent.pi_dim))
        sum_G, sum_terms, po1 = calculate_G_repeated(
            agent, params, key, o, pi,
            steps=steps, calc_mean=calc_mean, samples=samples,
            mean_estimator=mean_estimator,
        )
        return sum_G, sum_terms[0], sum_terms[1], sum_terms[2], po1

    # vmap with the key closed over: every lane traces the *same* key, so
    # dropout masks (shape (B, hidden)) and sample draws are shared.
    G_a, t0, t1, t2, po1_a = jax.vmap(one_action)(agent.pi_one_hot)
    # (A, B) -> (B, A); po1 back to the tiled (b,a)-fastest row layout.
    po1 = jnp.swapaxes(po1_a, 0, 1).reshape((B * agent.pi_dim,) + po1_a.shape[2:])
    return G_a.T, [t0.T, t1.T, t2.T], po1


def calculate_G_given_trajectory(
    agent: ActiveInferenceAgent,
    params: Params,
    key: jax.Array,
    s0_traj: jax.Array,
    ps1_traj: jax.Array,
    ps1_mean_traj: jax.Array,
    ps1_logvar_traj: jax.Array,
    pi0_traj: jax.Array,
):
    """G of a pre-sampled (s, pi) trajectory (torchmodel.py:329-352), used by
    MCTS simulations. All *_traj have shape (N, dim) — time and batch may be
    folded together."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    po1 = agent.decode(params, ps1_traj)
    _, _, qs1_logvar = agent.encode_with_sample(params, k1, po1)

    term0 = agent.check_reward(po1)
    term1 = -jnp.sum(
        m.entropy_normal_from_logvar(ps1_logvar_traj)
        + m.entropy_normal_from_logvar(qs1_logvar),
        axis=-1,
    )
    # Fresh theta, decode the transition *sample* (torchmodel.py:342).
    ps1_b, _, _ = agent.transition_with_sample(
        params, k2, pi0_traj, s0_traj, dropout=True
    )
    term2_1 = _sum_entropy_bernoulli(agent.decode(params, ps1_b))
    term2_2 = _sum_entropy_bernoulli(
        agent.decode(
            params, reparameterize(k4, ps1_mean_traj, ps1_logvar_traj)
        )
    )
    return -term0 + term1 + (term2_1 - term2_2)


def mcts_step_simulate(
    agent: ActiveInferenceAgent,
    params: Params,
    key: jax.Array,
    starting_s: jax.Array,
    depth: int,
    use_means: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Habit-guided autoregressive rollout scored by trajectory G
    (torchmodel.py:354-393), batched over leaf states.

    Args:
      starting_s: (B, s_dim) leaf states.
    Returns:
      (G, pi0_traj, Qpi_root): G (B,) mean trajectory G; pi0_traj
      (depth, B, pi_dim) one-hot actions; Qpi_root (B, pi_dim) the habit
      distribution at the rollout root.
    """
    B = starting_s.shape[0]
    k_scan, k_G = jax.random.split(key)

    def step_fn(s_t, k):
        k_pi, k_trans = jax.random.split(k)
        _, q_pi, _ = agent.habit(params, s_t)
        a = jax.random.categorical(k_pi, jnp.log(q_pi + 1e-20), axis=-1)
        pi_t = jax.nn.one_hot(a, agent.pi_dim, dtype=jnp.float32)
        ps1, ps1_mean, ps1_logvar = agent.transition_with_sample(
            params, k_trans, pi_t, s_t, dropout=True
        )
        s_next = ps1_mean if use_means else ps1
        return s_next, (s_t, ps1, ps1_mean, ps1_logvar, pi_t, q_pi)

    _, (s0_tr, ps1_tr, mean_tr, logvar_tr, pi_tr, q_pis) = jax.lax.scan(
        step_fn, starting_s, jax.random.split(k_scan, depth)
    )

    flat = lambda x: x.reshape((depth * B,) + x.shape[2:])
    G_rows = calculate_G_given_trajectory(
        agent,
        params,
        k_G,
        flat(s0_tr),
        flat(ps1_tr),
        flat(mean_tr),
        flat(logvar_tr),
        flat(pi_tr),
    )
    G = jnp.mean(G_rows.reshape(depth, B), axis=0)
    return G, pi_tr, q_pis[0]
