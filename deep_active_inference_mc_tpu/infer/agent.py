"""ActiveInferenceAgent: the functional coordinator of the three modules.

TPU-native rebuild of ``ActiveInferenceModel``
(``/root/reference/src/torchmodel.py:149-225``): instead of a stateful object
with implicit global RNG, the agent is a thin holder of module definitions
whose every operation is a pure function of (params, rng key, inputs) — the
shape JAX needs to jit/vmap/shard the whole act->plan->step->train loop.

Stochasticity policy (explicit, SURVEY.md §2.9/§7 "hard parts"):
  - transition dropout is ON wherever the reference samples theta
    (EFE term (c), imagination, trajectory scoring);
  - encoder/decoder dropout is ON only inside training losses; EFE evaluation
    and planning use the deterministic VAE. (The torch port never calls
    ``.eval()`` so *all* its dropout is unconditionally live — an artifact of
    the port, not the paper's MC-dropout scheme, which samples transition
    model parameters only.)
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from deep_active_inference_mc_tpu.models.networks import (
    HabitNet,
    TransitionNet,
    VAE,
    reparameterize,
)
from deep_active_inference_mc_tpu.ops import math as m

Params = Dict[str, Any]


class ActiveInferenceAgent:
    """Module definitions + pure forward functions.

    Mirrors the reference's public surface: encoder/decoder/transition/habit
    forwards, ``habitual_net``, ``imagine_future_from_o``, ``check_reward``
    (torchmodel.py:210-225), with the EFE engine in
    ``deep_active_inference_mc_tpu.infer.efe``.
    """

    def __init__(
        self,
        s_dim: int = 10,
        pi_dim: int = 4,
        colour_channels: int = 1,
        resolution: int = 64,
        dtype=jnp.float32,
    ):
        self.s_dim = s_dim
        self.pi_dim = pi_dim
        self.colour_channels = colour_channels
        self.resolution = resolution
        self.dtype = dtype
        self.top = HabitNet(s_dim=s_dim, pi_dim=pi_dim, dtype=dtype)
        self.mid = TransitionNet(s_dim=s_dim, pi_dim=pi_dim, dtype=dtype)
        self.down = VAE(
            s_dim=s_dim,
            colour_channels=colour_channels,
            resolution=resolution,
            dtype=dtype,
        )
        self.pi_one_hot = jnp.eye(pi_dim, dtype=jnp.float32)

    # ------------------------------------------------------------------ init
    def init(self, key: jax.Array) -> Params:
        k_top, k_mid, k_down, k_s = jax.random.split(key, 4)
        s = jnp.zeros((1, self.s_dim), jnp.float32)
        pi = jnp.zeros((1, self.pi_dim), jnp.float32)
        o = jnp.zeros(
            (1, self.resolution, self.resolution, self.colour_channels),
            jnp.float32,
        )
        return {
            "top": self.top.init(k_top, s)["params"],
            "mid": self.mid.init(
                {"params": k_mid, "dropout": k_mid}, pi, s, True
            )["params"],
            "down": self.down.init(
                {"params": k_down, "dropout": k_down, "sample": k_s}, o, True
            )["params"],
        }

    # ------------------------------------------------------------- forwards
    def habit(self, params: Params, s: jax.Array):
        """(logits, Q(pi|s), log Q(pi|s)) — ModelTop.encode_s."""
        return self.top.apply({"params": params["top"]}, s)

    def transition(
        self,
        params: Params,
        pi: jax.Array,
        s0: jax.Array,
        key: jax.Array | None = None,
        dropout: bool = True,
    ):
        """(mean, logvar) of P(s1|s0,pi); dropout=True samples a theta."""
        rngs = {"dropout": key} if (dropout and key is not None) else {}
        return self.mid.apply(
            {"params": params["mid"]}, pi, s0, dropout and key is not None,
            rngs=rngs,
        )

    def transition_with_sample(
        self,
        params: Params,
        key: jax.Array,
        pi: jax.Array,
        s0: jax.Array,
        dropout: bool = True,
    ):
        """(ps1 sample, mean, logvar) — ModelMid.transition_with_sample."""
        k_drop, k_samp = jax.random.split(key)
        mean, logvar = self.transition(params, pi, s0, k_drop, dropout)
        ps1 = reparameterize(k_samp, mean, logvar)
        return ps1, mean, logvar

    def encode(
        self,
        params: Params,
        o: jax.Array,
        key: jax.Array | None = None,
        dropout: bool = False,
    ):
        """(mean, logvar) of Q(s|o) — ModelDown.encoder."""
        rngs = {"dropout": key} if (dropout and key is not None) else {}
        return self.down.apply(
            {"params": params["down"]}, o, dropout and key is not None,
            method=VAE.encode, rngs=rngs,
        )

    def encode_with_sample(
        self,
        params: Params,
        key: jax.Array,
        o: jax.Array,
        dropout: bool = False,
    ):
        k_drop, k_samp = jax.random.split(key)
        mean, logvar = self.encode(params, o, k_drop, dropout)
        s = reparameterize(k_samp, mean, logvar)
        return s, mean, logvar

    def decode(
        self,
        params: Params,
        s: jax.Array,
        key: jax.Array | None = None,
        dropout: bool = False,
    ):
        """P(o|s) sigmoid frame — ModelDown.decoder."""
        rngs = {"dropout": key} if (dropout and key is not None) else {}
        return self.down.apply(
            {"params": params["down"]}, s, dropout and key is not None,
            method=VAE.decode, rngs=rngs,
        )

    # ------------------------------------------------------------- wrappers
    def habitual_net(self, params: Params, o: jax.Array) -> jax.Array:
        """Q(pi | encoder-mean(o)) (torchmodel.py:222-225)."""
        qs_mean, _ = self.encode(params, o)
        _, q_pi, _ = self.habit(params, qs_mean)
        return q_pi

    def imagine_future_from_o(
        self, params: Params, key: jax.Array, o0: jax.Array, pi: jax.Array
    ) -> jax.Array:
        """One-step imagination: encode -> transition -> decode
        (torchmodel.py:216-220)."""
        k_enc, k_trans = jax.random.split(key)
        s0, _, _ = self.encode_with_sample(params, k_enc, o0)
        ps1, _, _ = self.transition_with_sample(params, k_trans, pi, s0)
        return self.decode(params, ps1)

    def check_reward(self, po: jax.Array) -> jax.Array:
        """Extrinsic-value score of an imagined frame (torchmodel.py:210-214).

        64-res: mean per-pixel strip log-likelihood x10. 32-res: summed strip
        log-likelihood (the reference's ``calc_reward_animalai`` is missing
        from the port — SURVEY.md §2.9.4 — this implements the analogous
        template at 32 resolution).
        """
        if self.resolution == 64:
            return jnp.mean(m.calc_reward(po, 64), axis=(-3, -2, -1)) * 10.0
        return jnp.sum(m.calc_reward(po, 32), axis=(-3, -2, -1))

    # ------------------------------------------------------------ utilities
    def param_counts(self, params: Params) -> Dict[str, int]:
        return {
            k: sum(x.size for x in jax.tree.leaves(v))
            for k, v in params.items()
        }
