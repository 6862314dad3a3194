"""Per-epoch quantitative evaluation, fully on-device.

Rebuild of the reference's epoch-end eval block
(``/root/reference/train.py:136-186``): a fresh random-policy batch scored by
all three losses with fixed omega = a/2 + d, ground-truth factors for
disentanglement metrics, and the reward-transition imagination probe
(``/root/reference/src/util.py:6-44,82-85`` via ``envs.data``).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from deep_active_inference_mc_tpu.config import Config
from deep_active_inference_mc_tpu.envs import data as data_lib
from deep_active_inference_mc_tpu.envs import dsprites as env_lib
from deep_active_inference_mc_tpu.infer.agent import ActiveInferenceAgent, Params
from deep_active_inference_mc_tpu.infer.precision import OmegaParams, PrecisionState
from deep_active_inference_mc_tpu.train import losses


def eval_losses(
    agent: ActiveInferenceAgent,
    cfg: Config,
    params: Params,
    precision: PrecisionState,
    key: jax.Array,
    o0: jax.Array,
    o1: jax.Array,
    pi0: jax.Array,
) -> Dict[str, jax.Array]:
    """All three losses on an eval batch with fixed omega = a/2 + d
    (train.py:139-146). log_Ppi is the log of the one-hot action
    (train.py:139)."""
    omega_params = OmegaParams(cfg.var_a, cfg.var_b, cfg.var_c, cfg.var_d)
    omega = jnp.asarray(omega_params.eval_omega, jnp.float32)
    log_Ppi = jnp.log(pi0 + 1e-15)

    vae_do = bool(cfg.vae_train_dropout)
    k_s0, k_enc1, k_mid, k_down = jax.random.split(key, 4)
    s0, _, _ = agent.encode_with_sample(params, k_s0, o0, dropout=vae_do)
    F_top, (kl_div_pi, kl_div_pi_anal, _) = losses.compute_loss_top(
        agent, params["top"], s0, log_Ppi
    )
    qs1_mean, qs1_logvar = agent.encode(params, o1, k_enc1, dropout=vae_do)
    F_mid, (mid_terms, ps1, ps1_mean, ps1_logvar) = losses.compute_loss_mid(
        agent, params["mid"], k_mid, s0, pi0, qs1_mean, qs1_logvar, omega
    )
    F_down, (down_terms, po1, qs1) = losses.compute_loss_down(
        agent, params["down"], k_down, o1, ps1_mean, ps1_logvar, omega,
        precision, vae_dropout=vae_do,
    )
    # Dropout-free reconstruction NLL: the port's eval keeps all dropout live
    # (SURVEY.md §2.9 — torch modules never .eval()), which inflates the
    # pixel NLL against the published 80/60-nat thresholds; report the
    # deterministic-VAE number alongside for a fair quality read.
    qs1_mean_c, _ = agent.encode(params, o1)
    po1_clean = agent.decode(params, qs1_mean_c)
    nll_clean = -jnp.sum(
        o1 * jnp.log(1e-5 + po1_clean)
        + (1.0 - o1) * jnp.log(1e-5 + 1.0 - po1_clean),
        axis=(-3, -2, -1),
    )
    return {
        "mse_o_clean": nll_clean.mean(),
        "F": (F_down + F_mid + F_top).mean(),
        "F_top": F_top.mean(),
        "F_mid": F_mid.mean(),
        "F_down": F_down.mean(),
        "mse_o": down_terms[0].mean(),  # pixel NLL (nats)
        "kl_div_s": down_terms[1].mean(),
        "kl_div_s_anal": down_terms[2].mean(0),
        "kl_div_s_naive": down_terms[3].mean(),
        "kl_div_s_naive_anal": down_terms[4].mean(0),
        "kl_div_pi": kl_div_pi.mean(),
        "kl_div_pi_min": kl_div_pi.min(),
        "kl_div_pi_max": kl_div_pi.max(),
        "kl_div_pi_med": jnp.median(kl_div_pi),
        "kl_div_pi_std": kl_div_pi.std(),
        "kl_div_pi_anal": kl_div_pi_anal.mean(0),
        "s0": s0,
        "po1": po1,
        "qs1": qs1,
    }


def reward_transition_probe(
    agent: ActiveInferenceAgent,
    cfg: Config,
    params: Params,
    key: jax.Array,
    lut: jax.Array,
    size: int,
):
    """Does imagination predict the *reward consequence* of a scoring move?
    (train.py:181-186.)"""
    k_batch, k_im = jax.random.split(key)
    o0, o1, pi0 = data_lib.make_batch_random_reward_transitions(
        cfg, k_batch, lut, size
    )
    po1 = agent.imagine_future_from_o(params, k_im, o0, pi0)
    mse_r = data_lib.compare_reward(o1, po1)
    # Full-frame imagination MSE — fills the reference's declared-but-never-
    # populated 'deep_mse_o' series (train.py:68, stats_plot.py panel 14).
    deep_mse = jnp.mean(jnp.square(o1 - po1))
    return mse_r, deep_mse, o0, o1, po1


def make_jit_eval(agent: ActiveInferenceAgent, cfg: Config, lut: jax.Array):
    """One jitted eval pass returning the full epoch stats payload."""

    @jax.jit
    def evaluate(params, precision, key):
        k_env, k_batch, k_loss, k_probe = jax.random.split(key, 4)
        env = env_lib.reset(k_env, cfg.test_size)
        _, o0, o1, pi0, _, S0_real, _ = data_lib.make_batch_random(
            cfg, k_batch, env, lut
        )
        metrics = eval_losses(
            agent, cfg, params, precision, k_loss, o0, o1, pi0
        )
        mse_r, deep_mse, o0p, o1p, po1p = reward_transition_probe(
            agent, cfg, params, k_probe, lut, cfg.test_size
        )
        metrics["mse_r"] = mse_r
        metrics["deep_mse_o"] = deep_mse
        metrics["S0_real"] = S0_real
        # Frames feed the 7-sample reconstruction strips only (train.py:178,
        # 184) — slice on-device so the host transfer stays a few KB.
        n_plot = 7
        metrics["o0"] = o0[:n_plot]
        metrics["o1"] = o1[:n_plot]
        metrics["po1"] = metrics["po1"][:n_plot]
        # Reward-imagination probe strip (reward_imagination_*.png,
        # train.py:184): real pre/post scoring frames vs the imagined one.
        metrics["o0_probe"] = o0p[:n_plot]
        metrics["o1_probe"] = o1p[:n_plot]
        metrics["po1_probe"] = po1p[:n_plot]
        return metrics

    return evaluate
