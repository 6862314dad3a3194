"""MCTS-visit distillation into the habitual network (AlphaZero-style).

The reference trains the habit net against the on-policy generator prior
``softmax(-G, T=10)`` (``/root/reference/train.py:112-113`` feeding
``torchloss.py:18-26`` with targets from ``util.py:55-80``). Measured on
this rebuild, that teacher saturates: the habit sweep score sits at ~0.34
for hundreds of epochs while the repo's own reference-budget MCTS controller
scores ~2.2 on the same paired envs — the planner *is* a policy-improvement
operator the reference never distills from.

This module closes that loop the AlphaZero way while keeping the reference's
exact top-loss contract:

  1. **Collect** — a jitted fleet of envs is driven by the batched array
     planner (``plan.mcts.active_inference_mcts``); at every decision the env
     latents (7 ints — the frame re-renders exactly from the LUT, so frames
     are never stored) and the root visit counts are recorded.
  2. **Distill** — recorded states replay through the *current* encoder and
     the habit net trains on ``F_top = KL[Q(pi|s) || visits/Σvisits]`` — the
     same ``losses.compute_loss_top`` used by the per-round teacher, with the
     sharper target, reusing the round optimizer's Adam state (distillation
     is literally extra top-training steps with a better teacher).

Both stages are compiled once (the ``Distiller`` caches its jits); a phase
costs a few device-seconds and runs every ``cfg.distill_every`` epochs.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from deep_active_inference_mc_tpu.config import Config
from deep_active_inference_mc_tpu.envs import dsprites as env_lib
from deep_active_inference_mc_tpu.infer.agent import ActiveInferenceAgent, Params
from deep_active_inference_mc_tpu.plan import mcts as mcts_lib
from deep_active_inference_mc_tpu.train import losses

stop = jax.lax.stop_gradient


def visit_targets(root_N: jax.Array, temp: float = 1.0) -> jax.Array:
    """Normalized (optionally tempered) root visit distribution.

    ``temp`` < 1 sharpens toward the argmax visit, > 1 flattens; 1.0 is the
    plain AlphaZero pi ~ N(s,a)/ΣN target."""
    n = jnp.maximum(root_N.astype(jnp.float32), 0.0)
    if temp != 1.0:
        n = jnp.power(n + 1e-20, 1.0 / temp)
    return n / jnp.maximum(jnp.sum(n, axis=-1, keepdims=True), 1e-20)


class Distiller:
    """Cached-jit MCTS-visit distillation phase.

    Call with the live ``TrainState``; returns the updated state (only
    ``params['top']`` and ``opt_states['top']`` change) plus phase metrics.
    """

    def __init__(
        self,
        agent: ActiveInferenceAgent,
        cfg: Config,
        lut: jax.Array,
        top_opt: optax.GradientTransformation,
    ):
        self.agent = agent
        self.cfg = cfg
        self.n_record = cfg.distill_envs * cfg.distill_macro
        mcts_params = mcts_lib.MCTSParams(
            repeats=cfg.distill_repeats,
            expand_k=cfg.distill_expand_k,
            fused_eval=True,
            max_depth=16,
        )

        def render(env):
            return env_lib.render_obs(
                lut, env, cfg.resolution, cfg.colour_channels
            )

        @jax.jit
        def collect(params: Params, key: jax.Array):
            """Drive ``distill_envs`` fresh envs for ``distill_macro`` MCTS
            decisions; record (latents, last_r, root visits) per decision."""
            k_env, k_run = jax.random.split(key)
            env = env_lib.randomize(
                k_env, env_lib.reset(k_env, cfg.distill_envs)
            )

            def macro(env, k):
                k_plan, k_step = jax.random.split(k)
                o = render(env)
                res = mcts_lib.active_inference_mcts(
                    agent, params, k_plan, o, mcts_params
                )
                first = res.actions[:, 0]
                root_best = jnp.argmax(res.root_N, axis=-1).astype(jnp.int32)
                a = jnp.where(res.lengths > 0, first, root_best)
                rec = (env.latents, env.last_r, res.root_N)
                env, _ = env_lib.step_repeated(
                    k_step, env,
                    env_lib.to_env_actions(a, agent.pi_dim),
                    repeats=cfg.repeats,
                )
                return env, rec

            _, (lat, lr, root_N) = jax.lax.scan(
                macro, env, jax.random.split(k_run, cfg.distill_macro)
            )
            flat = lambda x: x.reshape((-1,) + x.shape[2:])
            return flat(lat), flat(lr), flat(root_N)

        @jax.jit
        def dstep(
            params: Params,
            opt_state,
            key: jax.Array,
            latents: jax.Array,
            last_r: jax.Array,
            log_target: jax.Array,
        ):
            """One top-only Adam step on a replayed minibatch."""
            env = env_lib.EnvState(
                latents=latents,
                score=jnp.zeros(latents.shape[:-1], jnp.float32),
                last_r=last_r,
            )
            o = render(env)
            qs0, _, _ = agent.encode_with_sample(
                params, key, o, dropout=bool(cfg.vae_train_dropout)
            )
            qs0 = stop(qs0)

            def loss(top_p):
                F_top, (kl, _, q_pi) = losses.compute_loss_top(
                    agent, top_p, qs0, log_target
                )
                match = jnp.mean(
                    (jnp.argmax(q_pi, -1) == jnp.argmax(log_target, -1))
                    .astype(jnp.float32)
                )
                return F_top.mean(), match

            (F, match), g = jax.value_and_grad(loss, has_aux=True)(
                params["top"]
            )
            upd, opt_state = top_opt.update(g, opt_state, params["top"])
            new_top = optax.apply_updates(params["top"], upd)
            return new_top, opt_state, F, match

        self._collect = collect
        self._dstep = dstep

    def __call__(self, state, key: jax.Array) -> Tuple[object, Dict[str, float]]:
        cfg = self.cfg
        k_collect, k_train = jax.random.split(key)
        lat, lr, root_N = self._collect(state.params, k_collect)
        target = visit_targets(root_N, cfg.distill_temp)
        log_target = jnp.log(target + 1e-20)
        # Teacher sharpness diagnostic: mean entropy of the visit targets.
        ent = float(
            jnp.mean(-jnp.sum(target * jnp.log(target + 1e-20), axis=-1))
        )

        n = self.n_record
        bs = min(cfg.distill_batch, n)
        steps_per_pass = n // bs
        if cfg.distill_passes < 1 or steps_per_pass < 1:
            raise ValueError(
                f"distill phase would take 0 steps (passes="
                f"{cfg.distill_passes}, records={n}, batch={bs})"
            )
        params = dict(state.params)
        opt_state = state.opt_states["top"]
        F_first = F_last = match_first = match_last = 0.0
        step = 0
        for p in range(cfg.distill_passes):
            k_perm = jax.random.fold_in(k_train, p)
            perm = jax.random.permutation(k_perm, n)
            for i in range(steps_per_pass):
                idx = perm[i * bs:(i + 1) * bs]
                new_top, opt_state, F, match = self._dstep(
                    params,
                    opt_state,
                    jax.random.fold_in(k_train, 1000 + step),
                    lat[idx],
                    lr[idx],
                    log_target[idx],
                )
                params = {**params, "top": new_top}
                if step == 0:
                    F_first, match_first = float(F), float(match)
                step += 1
        F_last, match_last = float(F), float(match)
        new_state = state.replace(
            params=params,
            opt_states={**state.opt_states, "top": opt_state},
        )
        metrics = {
            "distill_kl_first": F_first,
            "distill_kl_last": F_last,
            "distill_match_first": match_first,
            "distill_match_last": match_last,
            "distill_target_entropy": ent,
            "distill_steps": float(step),
        }
        return new_state, metrics
