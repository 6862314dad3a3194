"""The fused act->plan->step->train loop, fully on-device.

Rebuild of the reference's training epoch (``/root/reference/train.py:100-126``
and the on-policy data generator ``/root/reference/src/util.py:55-80``) as a
single jitted function per round:

  1. randomize all envs, render o0                        (train.py:107)
  2. EFE over all 4 actions (calc_mean, steps=deepness,
     samples) -> softmax(-G, T=10) -> sample actions      (util.py:57-74)
  3. step all envs with action-repeat, render o1          (util.py:77-78)
  4. staged update: top -> omega -> mid -> down, one Adam
     chain per layer with stop_gradient at every layer
     boundary                                             (train.py:111-126)

The reference crosses the host boundary twice per round (``.numpy()`` /
``torch.tensor``, util.py:62-70, train.py:109); here the entire round is one
XLA computation — no host round-trips, donated buffers, and the
three-stage sequential dependency (omega from the just-evaluated top KL
feeding mid and down) stays inside one fusion domain (SURVEY.md §7).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import optax
from flax import struct

from deep_active_inference_mc_tpu.config import Config
from deep_active_inference_mc_tpu.envs import dsprites as env_lib
from deep_active_inference_mc_tpu.envs.data import make_batch_active_inference
from deep_active_inference_mc_tpu.infer.agent import ActiveInferenceAgent, Params
from deep_active_inference_mc_tpu.infer.precision import OmegaParams, PrecisionState
from deep_active_inference_mc_tpu.train import losses

stop = jax.lax.stop_gradient


@struct.dataclass
class TrainState:
    """Everything the jitted round mutates: params, optimizer states,
    precision scalars, environments."""

    params: Params
    opt_states: Dict[str, Any]
    precision: PrecisionState
    env: env_lib.EnvState


def make_optimizers(cfg: Config) -> Dict[str, optax.GradientTransformation]:
    """One Adam per layer (train.py:44-46,89-94), optionally preceded by
    global-norm clipping (cfg.clip_grad > 0; off = reference semantics)."""

    def chain(lr):
        if cfg.clip_grad and cfg.clip_grad > 0.0:
            return optax.chain(
                optax.clip_by_global_norm(cfg.clip_grad), optax.adam(lr)
            )
        return optax.adam(lr)

    return {
        "top": chain(cfg.l_rate_top),
        "mid": chain(cfg.l_rate_mid),
        "down": chain(cfg.l_rate_down),
    }


def create_train_state(
    cfg: Config, agent: ActiveInferenceAgent, key: jax.Array
) -> TrainState:
    k_params, k_env = jax.random.split(key)
    params = agent.init(k_params)
    opts = make_optimizers(cfg)
    opt_states = {k: opts[k].init(params[k]) for k in opts}
    return TrainState(
        params=params,
        opt_states=opt_states,
        precision=PrecisionState.create(cfg.gamma, cfg.beta_s, cfg.beta_o),
        env=env_lib.reset(k_env, cfg.batch),
    )


def train_round(
    agent: ActiveInferenceAgent,
    cfg: Config,
    opts: Dict[str, optax.GradientTransformation],
    omega_params: OmegaParams,
    state: TrainState,
    key: jax.Array,
    lut: jax.Array,
) -> Tuple[TrainState, Dict[str, jax.Array]]:
    """One full training round (data gen + 3 staged updates), jit-able."""
    k_data, k_qs0, k_enc1, k_mid, k_down = jax.random.split(key, 5)

    env, o0, o1, pi0, log_Ppi = make_batch_active_inference(
        agent, cfg, state.params, k_data, state.env, lut
    )
    params = state.params

    # -- TOP: F_top on qs0 ~ Q(s|o0), gradients only into the habit net
    # (train.py:112-113, torchloss.py:65-74).
    vae_do = bool(cfg.vae_train_dropout)
    qs0, _, _ = agent.encode_with_sample(params, k_qs0, o0, dropout=vae_do)
    qs0 = stop(qs0)

    def top_loss(top_p):
        F_top, (kl_pi, kl_pi_anal, q_pi) = losses.compute_loss_top(
            agent, top_p, qs0, stop(log_Ppi)
        )
        return F_top.mean(), (F_top, kl_pi, kl_pi_anal)

    (_, (F_top, kl_pi, _)), g_top = jax.value_and_grad(top_loss, has_aux=True)(
        params["top"]
    )
    if cfg.freeze_top:
        # kl_pi (the omega input below) is still the live habit-vs-prior
        # KL; only the parameter update is withheld (cfg.freeze_top doc).
        new_top, opt_top = params["top"], state.opt_states["top"]
    else:
        upd, opt_top = opts["top"].update(
            g_top, state.opt_states["top"], params["top"]
        )
        new_top = optax.apply_updates(params["top"], upd)

    # -- omega from the pre-update top KL (train.py:116-119).
    omega = stop(omega_params(kl_pi)).reshape(-1, 1)

    # -- MID: F_mid with omega-weighted KL to the re-encoded posterior
    # (train.py:121-123, torchloss.py:76-88).
    qs1_mean, qs1_logvar = agent.encode(params, o1, k_enc1, dropout=vae_do)
    qs1_mean, qs1_logvar = stop(qs1_mean), stop(qs1_logvar)

    def mid_loss(mid_p):
        F_mid, (terms, ps1, ps1_mean, ps1_logvar) = losses.compute_loss_mid(
            agent, mid_p, k_mid, qs0, stop(pi0), qs1_mean, qs1_logvar, omega
        )
        return F_mid.mean(), (F_mid, ps1_mean, ps1_logvar)

    (_, (F_mid, ps1_mean, ps1_logvar)), g_mid = jax.value_and_grad(
        mid_loss, has_aux=True
    )(params["mid"])
    upd, opt_mid = opts["mid"].update(g_mid, state.opt_states["mid"], params["mid"])
    new_mid = optax.apply_updates(params["mid"], upd)

    # -- DOWN: F_down with the pre-update mid prior (train.py:126,
    # torchloss.py:90-98).
    ps1_mean, ps1_logvar = stop(ps1_mean), stop(ps1_logvar)

    def down_loss(down_p):
        F_down, (terms, po1, qs1) = losses.compute_loss_down(
            agent, down_p, k_down, o1, ps1_mean, ps1_logvar, omega,
            state.precision, vae_dropout=vae_do,
        )
        return F_down.mean(), (F_down, terms)

    (_, (F_down, down_terms)), g_down = jax.value_and_grad(
        down_loss, has_aux=True
    )(params["down"])
    upd, opt_down = opts["down"].update(
        g_down, state.opt_states["down"], params["down"]
    )
    new_down = optax.apply_updates(params["down"], upd)

    new_state = TrainState(
        params={"top": new_top, "mid": new_mid, "down": new_down},
        opt_states={"top": opt_top, "mid": opt_mid, "down": opt_down},
        precision=state.precision,
        env=env,
    )
    metrics = {
        "F_top": F_top.mean(),
        "F_mid": F_mid.mean(),
        "F_down": F_down.mean(),
        "nll_o": down_terms[0].mean(),
        "omega": omega.mean(),
        "omega_std": omega.std(),
        "kl_pi": kl_pi.mean(),
        "score": env.score.mean(),
        # Per-round gradient global norms (spike diagnosis — the reference
        # has no grad observability at all; train512.log epochs 1372/1389
        # showed unexplained ~30% F excursions at batch 512).
        "gnorm_top": optax.global_norm(g_top),
        "gnorm_mid": optax.global_norm(g_mid),
        "gnorm_down": optax.global_norm(g_down),
    }
    return new_state, metrics


def make_round_fn(agent: ActiveInferenceAgent, cfg: Config, lut: jax.Array):
    """The un-jitted (state, key) -> (state, metrics) round closure — the
    single implementation behind both the single-device and mesh-sharded
    jit wrappers (parallel/mesh.py)."""
    opts = make_optimizers(cfg)
    omega_params = OmegaParams(cfg.var_a, cfg.var_b, cfg.var_c, cfg.var_d)

    def step(state, key):
        return train_round(agent, cfg, opts, omega_params, state, key, lut)

    return step


def make_epoch_fn(
    agent: ActiveInferenceAgent, cfg: Config, lut: jax.Array, rounds: int
):
    """Un-jitted whole-epoch closure: ``rounds`` train rounds under one
    lax.scan, returning the last round's metrics."""
    round_fn = make_round_fn(agent, cfg, lut)

    def epoch(state, key):
        state, metrics = jax.lax.scan(
            round_fn, state, jax.random.split(key, rounds)
        )
        out = jax.tree.map(lambda x: x[-1], metrics)
        # Worst-round series: a spike inside the epoch is invisible in
        # last-round metrics; these bound it.
        for k in ("gnorm_top", "gnorm_mid", "gnorm_down", "F_down"):
            out[k + "_max"] = metrics[k].max()
        return state, out

    return epoch


def make_jit_train_round(
    agent: ActiveInferenceAgent, cfg: Config, lut: jax.Array
):
    """Compile the round with donated state buffers."""
    return jax.jit(make_round_fn(agent, cfg, lut), donate_argnums=(0,))


def make_jit_epoch(
    agent: ActiveInferenceAgent, cfg: Config, lut: jax.Array, rounds: int
):
    """A whole epoch (``rounds`` train rounds) as ONE jitted lax.scan — the
    hot loop runs on-device end to end."""
    return jax.jit(
        make_epoch_fn(agent, cfg, lut, rounds), donate_argnums=(0,)
    )
