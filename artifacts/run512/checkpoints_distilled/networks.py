"""The three-layer agent's neural modules as Flax linen modules.

TPU-native rebuild of the reference architectures
(``/root/reference/src/torchmodel.py:10-146``):

  - HabitNet   (ModelTop):  habitual policy MLP  Q(pi | s)
  - TransitionNet (ModelMid): MC-dropout transition  P(s1 | s0, pi)
  - VAE        (ModelDown): conv posterior Q(s|o) + deconv likelihood P(o|s)

Design notes (TPU-first, not a translation):
  - All dropout is explicit-rng Flax dropout. MC-dropout in the transition
    net is *the* epistemic mechanism for EFE term (c)
    (torchmodel.py:287-292), so callers choose per-forward whether dropout
    is live — including at inference.
  - Convolutions use SAME padding. The reference port's VALID-padded encoder
    with a hard-coded ``Linear(64*2*2, 256)`` cannot run at 64x64 resolution
    (torchmodel.py:84-104 — a port defect, SURVEY.md §2.9); SAME padding
    reproduces the intended 64->32->16->8->4 pyramid and mirrors the decoder,
    whose SAME-padded transposed convs are unambiguous (torchmodel.py:106-128).
  - ReLU activations + He-uniform kernel init per the reference's
    documentation (torchmodel.py:13-14).
  - ``dtype`` selects the computation dtype (bfloat16 recommended on TPU);
    parameters stay float32.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

_he = nn.initializers.he_uniform

# Numerical-stability guard on Gaussian heads: exp(logvar) must not overflow
# f32 when untrained nets feed transition samples back autoregressively
# (multi-step rollouts, torchmodel.py:236-244). Exact identity inside
# [-LOGVAR_CLIP, LOGVAR_CLIP]; the trained regime never leaves it.
LOGVAR_CLIP = 10.0


def _clip_logvar(logvar: jax.Array) -> jax.Array:
    return jnp.clip(logvar, -LOGVAR_CLIP, LOGVAR_CLIP)


def reparameterize(key: jax.Array, mean: jax.Array, logvar: jax.Array):
    """mu + eps * exp(logvar/2) (torchmodel.py:54-56,130-132)."""
    eps = jax.random.normal(key, mean.shape, mean.dtype)
    return eps * jnp.exp(logvar * 0.5) + mean


class HabitNet(nn.Module):
    """ModelTop: s -> (logits, Q(pi|s), log Q(pi|s)) (torchmodel.py:10-31)."""

    s_dim: int = 10
    pi_dim: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, s: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
        x = s.astype(self.dtype)
        x = nn.relu(nn.Dense(128, kernel_init=_he(), dtype=self.dtype)(x))
        x = nn.relu(nn.Dense(128, kernel_init=_he(), dtype=self.dtype)(x))
        logits = nn.Dense(self.pi_dim, kernel_init=_he(), dtype=self.dtype)(x)
        logits = logits.astype(jnp.float32)
        q_pi = jax.nn.softmax(logits, axis=-1)
        log_q_pi = jnp.log(q_pi + 1e-20)
        return logits, q_pi, log_q_pi


class TransitionNet(nn.Module):
    """ModelMid: (pi, s0) -> Gaussian (mean, logvar) over s1, with
    Dropout(0.5) after every hidden layer — the theta-sampling mechanism
    (torchmodel.py:34-66). Pass ``dropout=True`` plus a 'dropout' rng to
    sample a model theta; ``dropout=False`` gives the mean-field net.
    """

    s_dim: int = 10
    pi_dim: int = 4
    hidden: int = 512
    dropout_rate: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, pi: jax.Array, s0: jax.Array, dropout: bool = True
    ) -> Tuple[jax.Array, jax.Array]:
        x = jnp.concatenate([pi, s0], axis=-1).astype(self.dtype)
        for _ in range(3):
            x = nn.relu(nn.Dense(self.hidden, kernel_init=_he(), dtype=self.dtype)(x))
            x = nn.Dropout(self.dropout_rate, deterministic=not dropout)(x)
        out = nn.Dense(2 * self.s_dim, kernel_init=_he(), dtype=self.dtype)(x)
        out = out.astype(jnp.float32)
        mean, logvar = jnp.split(out, 2, axis=-1)
        return mean, _clip_logvar(logvar)


class Encoder(nn.Module):
    """Conv posterior Q(s|o): 4x stride-2 conv pyramid + 3x FC(256) with
    dropout -> (mean, logvar) (torchmodel.py:84-104, intended semantics)."""

    s_dim: int = 10
    dropout_rate: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, o: jax.Array, dropout: bool = True):
        x = o.astype(self.dtype)
        for ch in (32, 32, 64, 64):
            x = nn.Conv(
                ch, (3, 3), strides=(2, 2), padding="SAME",
                kernel_init=_he(), dtype=self.dtype,
            )(x)
            x = nn.relu(x)
        x = x.reshape(x.shape[:-3] + (-1,))
        for _ in range(3):
            x = nn.relu(nn.Dense(256, kernel_init=_he(), dtype=self.dtype)(x))
            x = nn.Dropout(self.dropout_rate, deterministic=not dropout)(x)
        out = nn.Dense(2 * self.s_dim, kernel_init=_he(), dtype=self.dtype)(x)
        out = out.astype(jnp.float32)
        mean, logvar = jnp.split(out, 2, axis=-1)
        return mean, _clip_logvar(logvar)


class Decoder(nn.Module):
    """Deconv likelihood P(o|s): 3x FC(256) + FC to 16*16*64 (dropout
    throughout) -> 4x transposed conv -> sigmoid (torchmodel.py:106-128).
    ``resolution`` 64 uses a stride-2 third deconv; 32 uses stride-1
    (torchmodel.py:77-82 — the Animal-AI configuration)."""

    s_dim: int = 10
    colour_channels: int = 1
    resolution: int = 64
    dropout_rate: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, s: jax.Array, dropout: bool = True):
        if self.resolution == 64:
            last_stride = 2
        elif self.resolution == 32:
            last_stride = 1
        else:
            raise ValueError(f"Unknown resolution {self.resolution}")
        x = s.astype(self.dtype)
        for _ in range(3):
            x = nn.relu(nn.Dense(256, kernel_init=_he(), dtype=self.dtype)(x))
            x = nn.Dropout(self.dropout_rate, deterministic=not dropout)(x)
        x = nn.relu(nn.Dense(16 * 16 * 64, kernel_init=_he(), dtype=self.dtype)(x))
        x = nn.Dropout(self.dropout_rate, deterministic=not dropout)(x)
        x = x.reshape(x.shape[:-1] + (16, 16, 64))
        for ch, stride in ((64, 1), (64, 2), (32, last_stride)):
            x = nn.ConvTranspose(
                ch, (3, 3), strides=(stride, stride), padding="SAME",
                kernel_init=_he(), dtype=self.dtype,
            )(x)
            x = nn.relu(x)
        x = nn.ConvTranspose(
            self.colour_channels, (3, 3), strides=(1, 1), padding="SAME",
            kernel_init=_he(), dtype=self.dtype,
        )(x)
        return jax.nn.sigmoid(x.astype(jnp.float32))


class VAE(nn.Module):
    """ModelDown: encoder + decoder pair (torchmodel.py:69-146)."""

    s_dim: int = 10
    colour_channels: int = 1
    resolution: int = 64
    dropout_rate: float = 0.5
    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(
            s_dim=self.s_dim, dropout_rate=self.dropout_rate, dtype=self.dtype
        )
        self.decoder = Decoder(
            s_dim=self.s_dim,
            colour_channels=self.colour_channels,
            resolution=self.resolution,
            dropout_rate=self.dropout_rate,
            dtype=self.dtype,
        )

    def __call__(self, o: jax.Array, dropout: bool = True):
        """Full autoencode pass (used for init)."""
        mean, logvar = self.encoder(o, dropout)
        s = reparameterize(self.make_rng("sample"), mean, logvar)
        po = self.decoder(s, dropout)
        return po, mean, logvar

    def encode(self, o: jax.Array, dropout: bool = True):
        return self.encoder(o, dropout)

    def decode(self, s: jax.Array, dropout: bool = True):
        return self.decoder(s, dropout)
