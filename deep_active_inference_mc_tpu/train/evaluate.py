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


def edge_discrimination_probe(
    agent: ActiveInferenceAgent,
    cfg: Config,
    params: Params,
    key: jax.Array,
    lut: jax.Array,
) -> Dict[str, jax.Array]:
    """Shape->side discrimination at the scoring edge (VERDICT r2 diagnosis).

    Places every (shape, posX) combination at posY=31 (one 'up' from
    scoring, game_environment.py:119-134) and measures how much probability
    mass the habit net — and the softmax(-G/T) data policy actually used for
    training targets (util.py:46-53,62-68) — puts on 'up' when it is the
    *correct* side (squares left / others right) vs the wrong side. The
    correct-minus-wrong gap is the single number that must grow for the
    agent to beat random at the task.
    """
    posx = jnp.arange(32, dtype=jnp.int32)
    shp = jnp.asarray([0, 1, 2], jnp.int32)
    SH, PX = jnp.meshgrid(shp, posx, indexing="ij")  # (3, 32)
    lat = jnp.stack(
        [
            jnp.zeros_like(SH),  # color
            SH,  # shape
            jnp.full_like(SH, 3),  # scale (mid)
            jnp.zeros_like(SH),  # orientation
            PX,  # posX
            jnp.full_like(SH, 31),  # posY: the scoring edge
        ],
        axis=-1,
    ).reshape(-1, 6)
    n = lat.shape[0]
    env = env_lib.EnvState(
        latents=lat,
        score=jnp.zeros((n,), jnp.float32),
        last_r=jnp.zeros((n,), jnp.float32),
    )
    o = env_lib.render_obs(lut, env, cfg.resolution, cfg.colour_channels)

    def split_correct_wrong(p_up):
        p = p_up.reshape(3, 32)
        correct = (p[0, :16].mean() + p[1:, 16:].mean()) / 2.0
        wrong = (p[0, 16:].mean() + p[1:, :16].mean()) / 2.0
        return correct, wrong

    q_pi = agent.habitual_net(params, o)
    h_corr, h_wrong = split_correct_wrong(q_pi[:, 0])

    from deep_active_inference_mc_tpu.infer import efe

    G, _, _ = efe.calculate_G_4_repeated(
        agent, params, key, o, steps=1, calc_mean=True, samples=1
    )
    p_pi = jax.nn.softmax(-G / cfg.temperature, axis=-1)
    g_corr, g_wrong = split_correct_wrong(p_pi[:, 0])
    # Raw G gap in nats (temperature-independent): mean G(up) on the wrong
    # side minus on the correct side — positive = the EFE estimate prefers
    # scoring on the correct side, however softly the T=10 data policy
    # expresses it.
    gup_corr, gup_wrong = split_correct_wrong(G[:, 0])
    # Per-class decomposition: a side-agnostic "push right" heuristic can
    # fake a positive combined gap (squares' gap negative, others' positive,
    # others outnumbering 2:1 in the sweep scores). TRUE shape->side
    # discrimination = BOTH class gaps positive.
    Gup = G[:, 0].reshape(3, 32)
    sq_gap = Gup[0, 16:].mean() - Gup[0, :16].mean()  # >0: sq prefers left
    oth_gap = Gup[1:, :16].mean() - Gup[1:, 16:].mean()  # >0: oth prefers right
    return {
        "edge_habit_correct": h_corr,
        "edge_habit_wrong": h_wrong,
        "edge_g_correct": g_corr,
        "edge_g_wrong": g_wrong,
        "edge_g_gap_nats": gup_wrong - gup_corr,
        "edge_g_sq_gap_nats": sq_gap,
        "edge_g_oth_gap_nats": oth_gap,
    }


def make_jit_eval(agent: ActiveInferenceAgent, cfg: Config, lut: jax.Array):
    """One jitted eval pass returning the full epoch stats payload."""

    @jax.jit
    def evaluate(params, precision, key):
        k_env, k_batch, k_loss, k_probe, k_edge = jax.random.split(key, 5)
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
        metrics.update(
            edge_discrimination_probe(agent, cfg, params, k_edge, lut)
        )
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
