"""Causal-model training: loss, batch generation, fused train round.

Completes the reference's non-running scaffold
(``/root/reference/train_causal.py``, ``src/torchloss_causal.py``,
``src/util_causal.py`` [empty] — SURVEY.md §2.8 lists the defects). Intended
semantics implemented working:

  - loss (torchloss_causal.py:4-10): reconstruction MSE against the *next*
    observation plus a latent regularizer
    kl_div_s = sum(-0.5 * (1 + s - s^2 - e^s)) weighted by beta_s; the
    returned "omega" diagnostic is beta_s*kl + beta_o*recon;
  - batch generation (`make_batch_dsprites_causal_inference`, declared at
    train_causal.py:9,89 but missing): random-policy transitions over the
    batched envs, same shape contract (o0, o1, pi0, log_Ppi) as the
    active-inference generator;
  - one Adam over the whole model, gamma annealing and the reference's
    checkpoint/eval cadence live in apps/train_causal.py.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from deep_active_inference_mc_tpu.config import Config
from deep_active_inference_mc_tpu.envs import data as data_lib
from deep_active_inference_mc_tpu.envs import dsprites as env_lib
from deep_active_inference_mc_tpu.infer.precision import PrecisionState
from deep_active_inference_mc_tpu.models.causal import StructuralCausalModel


@struct.dataclass
class CausalTrainState:
    params: Any
    opt_state: Any
    precision: PrecisionState
    env: env_lib.EnvState


def compute_loss_causal(model, params, x_recon, o1, s, precision):
    """(F, kl_div_s, omega) per torchloss_causal.py:4-10 (intended form)."""
    recon_loss = jnp.mean(jnp.square(x_recon - o1))
    kl_div_s = jnp.sum(
        -0.5 * jnp.sum(1.0 + s - jnp.square(s) - jnp.exp(s), axis=-1)
    ) / s.shape[0]
    omega = precision.beta_s * kl_div_s + precision.beta_o * recon_loss
    F = recon_loss + precision.beta_s * kl_div_s
    return F, kl_div_s, omega


def make_causal_batch(
    cfg: Config, key: jax.Array, env: env_lib.EnvState, lut: jax.Array
):
    """`make_batch_dsprites_causal_inference` (train_causal.py:9,89 —
    missing from the reference): random-policy transitions, same contract
    as the active-inference generator."""
    env, o0, o1, pi0, log_Ppi, S0_real, _ = data_lib.make_batch_random(
        cfg, key, env, lut
    )
    return env, o0, o1, pi0, log_Ppi, S0_real


def create_causal_state(
    cfg: Config, model: StructuralCausalModel, key: jax.Array, lr: float = 1e-4
) -> Tuple[CausalTrainState, optax.GradientTransformation]:
    k_p, k_env = jax.random.split(key)
    o = jnp.zeros((1, cfg.resolution, cfg.resolution, cfg.colour_channels))
    params = model.init(k_p, o)["params"]
    opt = optax.adam(lr)
    state = CausalTrainState(
        params=params,
        opt_state=opt.init(params),
        precision=PrecisionState.create(cfg.gamma, cfg.beta_s, cfg.beta_o),
        env=env_lib.reset(k_env, cfg.batch),
    )
    return state, opt


def causal_round(
    model: StructuralCausalModel,
    cfg: Config,
    opt: optax.GradientTransformation,
    state: CausalTrainState,
    key: jax.Array,
    lut: jax.Array,
) -> Tuple[CausalTrainState, Dict[str, jax.Array]]:
    """One fused round: batch gen + single Adam update (train_causal.py:87-97,
    intended). Plain function; jit via the make_* wrappers."""
    env, o0, o1, pi0, log_Ppi, _ = make_causal_batch(cfg, key, state.env, lut)

    def loss_fn(p):
        x_recon, s = model.apply({"params": p}, o0)
        F, kl, om = compute_loss_causal(
            model, p, x_recon, o1, s, state.precision
        )
        return F, (kl, om, x_recon, s)

    (F, (kl, om, x_recon, s)), grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(state.params)
    updates, opt_state = opt.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    metrics = {
        "F": F,
        "mse_o": jnp.mean(jnp.square(x_recon - o1)),
        "kl_div_s": kl,
        "omega": om,
    }
    new_state = CausalTrainState(
        params=params,
        opt_state=opt_state,
        precision=state.precision,
        env=env,
    )
    return new_state, metrics


def make_jit_causal_round(
    model: StructuralCausalModel,
    cfg: Config,
    opt: optax.GradientTransformation,
    lut: jax.Array,
):
    fn = functools.partial(causal_round, model, cfg, opt)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def round_fn(state, key):
        return fn(state, key, lut)

    return round_fn


def make_jit_causal_epoch(
    model: StructuralCausalModel,
    cfg: Config,
    opt: optax.GradientTransformation,
    lut: jax.Array,
    rounds: int,
):
    """A whole epoch of causal rounds as ONE jitted lax.scan (mirrors
    train.loop.make_jit_epoch)."""
    fn = functools.partial(causal_round, model, cfg, opt)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def epoch(state: CausalTrainState, key: jax.Array):
        def body(st, k):
            return fn(st, k, lut)

        state, metrics = jax.lax.scan(
            body, state, jax.random.split(key, rounds)
        )
        return state, jax.tree.map(lambda x: x[-1], metrics)

    return epoch


def make_jit_causal_eval(
    model: StructuralCausalModel, cfg: Config, lut: jax.Array
):
    """Eval: loss on a fresh random batch + ground truth for traversals +
    a counterfactual probe (latent intervention changes the decode)."""

    @jax.jit
    def evaluate(params, precision, key):
        env = env_lib.reset(key, cfg.test_size)
        env, o0, o1, pi0, _, S0_real = make_causal_batch(cfg, key, env, lut)
        x_recon, s = model.apply({"params": params}, o0)
        F, kl, om = compute_loss_causal(model, params, x_recon, o1, s, precision)
        # Counterfactual probe: unit intervention along each latent axis.
        delta = jnp.eye(cfg.s_dim)[0] * 2.0
        x_cf, s_cf = model.apply(
            {"params": params}, o0[:8], jnp.broadcast_to(delta, (8, cfg.s_dim)),
            method=StructuralCausalModel.counterfactual,
        )
        cf_effect = jnp.mean(jnp.abs(x_cf - x_recon[:8]))
        return {
            "F": F,
            "mse_o": jnp.mean(jnp.square(x_recon - o1)),
            "kl_div_s": kl,
            "omega": om,
            "cf_effect": cf_effect,
            "o0": o0,
            "o1": o1,
            "x_recon": x_recon,
            "s": s,
            "S0_real": S0_real,
        }

    return evaluate
