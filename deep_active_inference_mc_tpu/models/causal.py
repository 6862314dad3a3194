"""Structural causal model: deterministic conv autoencoder with
counterfactual interventions.

Rebuild of the reference's *incomplete* second model family
(``/root/reference/src/causal_model.py``; the scaffold does not run —
SURVEY.md §2.8). Architecture per the reference's declared intent:

  encoder: 3x stride-2 conv (32, 64, 128, kernel 4) -> FC to s_dim
  decoder: FC -> 3x stride-2 transposed conv (64, 32, C) -> sigmoid
  counterfactual(x, intervention): decode(encode(x) + intervention)
  (causal_model.py:34-43)
"""

from __future__ import annotations

from typing import Tuple

import jax
from flax import linen as nn

_he = nn.initializers.he_uniform


class StructuralCausalModel(nn.Module):
    """Deterministic AE over observations with latent interventions."""

    s_dim: int = 10
    colour_channels: int = 1
    resolution: int = 64

    def setup(self):
        if self.resolution % 8 != 0:
            raise ValueError("resolution must be divisible by 8")
        sp = self.resolution // 8
        self.enc_convs = [
            nn.Conv(ch, (4, 4), strides=(2, 2), padding="SAME",
                    kernel_init=_he())
            for ch in (32, 64, 128)
        ]
        self.enc_fc = nn.Dense(self.s_dim, kernel_init=_he())
        self.dec_fc = nn.Dense(128 * sp * sp, kernel_init=_he())
        self.dec_convs = [
            nn.ConvTranspose(ch, (4, 4), strides=(2, 2), padding="SAME",
                             kernel_init=_he())
            for ch in (64, 32)
        ]
        self.dec_out = nn.ConvTranspose(
            self.colour_channels, (4, 4), strides=(2, 2), padding="SAME",
            kernel_init=_he(),
        )

    def encode(self, x: jax.Array) -> jax.Array:
        h = x
        for conv in self.enc_convs:
            h = nn.relu(conv(h))
        h = h.reshape(h.shape[:-3] + (-1,))
        return self.enc_fc(h)

    def decode(self, s: jax.Array) -> jax.Array:
        sp = self.resolution // 8
        h = nn.relu(self.dec_fc(s))
        h = h.reshape(h.shape[:-1] + (sp, sp, 128))
        for conv in self.dec_convs:
            h = nn.relu(conv(h))
        return jax.nn.sigmoid(self.dec_out(h))

    def __call__(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        s = self.encode(x)
        return self.decode(s), s

    def counterfactual(
        self, x: jax.Array, intervention: jax.Array
    ) -> Tuple[jax.Array, jax.Array]:
        """do(s := s + intervention): re-decode under a latent shift
        (causal_model.py:39-43)."""
        s = self.encode(x)
        s_intervened = s + intervention
        return self.decode(s_intervened), s_intervened
