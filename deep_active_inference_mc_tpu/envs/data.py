"""Batch builders / data pipeline — rebuild of ``/root/reference/src/util.py``.

Every builder is a pure jit-able function over the batched environment; the
reference's per-item Python loops (util.py:6-44) become one vectorized pass.

  make_batch_active_inference   <- make_batch_dsprites_active_inference
                                   (util.py:55-80): the on-policy generator —
                                   EFE over all actions, softmax(-G, T=10),
                                   sample, step with action-repeat.
  make_batch_random             <- make_batch_dsprites_random (util.py:6-25):
                                   random-policy transitions + ground truth.
  make_batch_random_reward_transitions
                                <- util.py:27-44: the reward-imagination
                                   probe set (objects pinned at the scoring
                                   edge, pushed 'up').
  compare_reward                <- util.py:82-85: reward-strip MSE.

``softmax_multi_with_log`` lives in ``ops.math`` (util.py:46-53).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from deep_active_inference_mc_tpu.config import Config
from deep_active_inference_mc_tpu.envs import dsprites as env_lib
from deep_active_inference_mc_tpu.infer import efe
from deep_active_inference_mc_tpu.infer.agent import ActiveInferenceAgent, Params
from deep_active_inference_mc_tpu.ops import math as m

stop = jax.lax.stop_gradient


def pin_edge_fraction(
    key: jax.Array, env: env_lib.EnvState, frac: float
) -> env_lib.EnvState:
    """Edge curriculum (cfg.edge_frac): re-pin ``frac`` of the freshly
    randomized envs to posY in {28..31}, where an 'up' macro-step (5
    repeats) crosses the scoring edge — boosting the scoring-transition
    fraction the mid/down losses see from ~6% rarity to ~frac*P(up)."""
    k_sel, k_posy = jax.random.split(jax.random.fold_in(key, 1))
    pinned = jax.random.uniform(k_sel, (env.batch,)) < frac
    posy = jax.random.randint(k_posy, (env.batch,), 28, 32)
    return env.replace(
        latents=env.latents.at[:, 5].set(
            jnp.where(pinned, posy, env.latents[:, 5])
        )
    )


def make_batch_active_inference(
    agent: ActiveInferenceAgent,
    cfg: Config,
    params: Params,
    key: jax.Array,
    env: env_lib.EnvState,
    lut: jax.Array,
):
    """On-policy data generation (util.py:55-80 + train.py:107).

    Returns (env', o0, o1, pi0 one-hot, log_Ppi)."""
    k_rand, k_G, k_act, k_step = jax.random.split(key, 4)
    env = env_lib.randomize(k_rand, env)
    if cfg.edge_frac > 0.0:
        env = pin_edge_fraction(k_rand, env, cfg.edge_frac)
    o0 = env_lib.render_obs(lut, env, cfg.resolution, cfg.colour_channels)

    # EFE of all actions: the reference tiles o0 4x against the one-hot
    # action matrix (util.py:57-62); identical row layout (action fastest).
    # cfg.crn shares the MC noise across the 4 action lanes instead
    # (efe.calculate_G_4_repeated_crn) so the prior ranks actions by
    # signal, not by independent dropout draws.
    B = o0.shape[0]
    if cfg.crn:
        G_ba, _, _ = efe.calculate_G_4_repeated_crn(
            agent, params, k_G, o0,
            steps=cfg.deepness, calc_mean=True, samples=cfg.samples,
            mean_estimator=cfg.gen_mean,
        )
        sum_G = G_ba.reshape(-1)
    else:
        o0_rep = jnp.repeat(o0, agent.pi_dim, axis=0)
        pi_rep = jnp.tile(agent.pi_one_hot, (B, 1))
        sum_G, _, _ = efe.calculate_G_repeated(
            agent, params, k_G, o0_rep, pi_rep,
            steps=cfg.deepness, calc_mean=True, samples=cfg.samples,
            mean_estimator=cfg.gen_mean,
        )
    Ppi, log_Ppi = m.softmax_multi_with_log(
        -sum_G, agent.pi_dim, temperature=cfg.temperature
    )
    # Executed action: optionally mixed with a uniform exploration floor;
    # the top-loss target log_Ppi stays the pure prior either way.
    P_act = Ppi
    if cfg.explore_eps > 0.0:
        P_act = (1.0 - cfg.explore_eps) * Ppi + cfg.explore_eps / agent.pi_dim
    if cfg.gen_habit_mix > 0.0:
        # Habit-mixed behavior policy (cfg.gen_habit_mix doc): lets a
        # distilled habit steer part of the fleet so its scoring
        # transitions (notably square-LEFT) enter the mid/down batches.
        q_pi_habit = stop(agent.habitual_net(params, o0))
        P_act = (
            (1.0 - cfg.gen_habit_mix) * P_act + cfg.gen_habit_mix * q_pi_habit
        )
    actions = jax.random.categorical(k_act, jnp.log(P_act + 1e-20), axis=-1)
    pi0 = jax.nn.one_hot(actions, agent.pi_dim, dtype=jnp.float32)

    env, _ = env_lib.step_repeated(
        k_step, env, env_lib.to_env_actions(actions, agent.pi_dim),
        repeats=cfg.repeats,
    )
    o1 = env_lib.render_obs(lut, env, cfg.resolution, cfg.colour_channels)
    return env, o0, o1, pi0, log_Ppi


def make_batch_random(
    cfg: Config, key: jax.Array, env: env_lib.EnvState, lut: jax.Array
):
    """Random-policy transitions with ground truth (util.py:6-25): fresh
    randomized envs, Ppi ~ normalized U(0,1)^4, one sampled action,
    ``repeats`` env steps.

    Returns (env', o0, o1, pi0 one-hot, log_Ppi, S0_real, S1_real)."""
    k_rand, k_ppi, k_act, k_step = jax.random.split(key, 4)
    env = env_lib.randomize(k_rand, env)
    o0 = env_lib.render_obs(lut, env, cfg.resolution, cfg.colour_channels)
    S0_real = env_lib.ground_truth_factors(env)

    ppi = jax.random.uniform(k_ppi, (env.batch, cfg.pi_dim))
    ppi = ppi / jnp.sum(ppi, axis=-1, keepdims=True)
    actions = jax.random.categorical(k_act, jnp.log(ppi), axis=-1)
    pi0 = jax.nn.one_hot(actions, cfg.pi_dim, dtype=jnp.float32)

    env, _ = env_lib.step_repeated(
        k_step, env, env_lib.to_env_actions(actions, cfg.pi_dim),
        repeats=cfg.repeats,
    )
    o1 = env_lib.render_obs(lut, env, cfg.resolution, cfg.colour_channels)
    S1_real = env_lib.ground_truth_factors(env)
    return env, o0, o1, pi0, jnp.log(ppi + 1e-20), S0_real, S1_real


def make_batch_random_reward_transitions(
    cfg: Config, key: jax.Array, lut: jax.Array, size: int
):
    """Probe set testing whether imagination predicts reward consequences
    (util.py:27-44): randomized envs pinned at posY=31, pushed 'up'.

    Returns (o0, o1, pi0 one-hot)."""
    k_env, k_step = jax.random.split(key)
    env = env_lib.reset(k_env, size)
    env = env_lib.randomize(k_env, env)
    env = env.replace(latents=env.latents.at[:, 5].set(31))
    o0 = env_lib.render_obs(lut, env, cfg.resolution, cfg.colour_channels)

    actions = jnp.zeros((size,), jnp.int32)  # 'up' (index 0 in both action sets)
    env, _ = env_lib.step_repeated(k_step, env, actions, repeats=cfg.repeats)
    o1 = env_lib.render_obs(lut, env, cfg.resolution, cfg.colour_channels)
    pi0 = jax.nn.one_hot(actions, cfg.pi_dim, dtype=jnp.float32)
    return o0, o1, pi0


def compare_reward(o1: jax.Array, po1: jax.Array) -> jax.Array:
    """MSE restricted to the 3-row reward strip (util.py:82-85)."""
    return jnp.mean(jnp.square(o1[:, 0:3] - po1[:, 0:3]))
