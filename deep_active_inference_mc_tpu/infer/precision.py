"""Top-down precision state and schedules.

The reference keeps three mutable scalar precisions with the down layer's
training state (gamma, beta_s, beta_o — torchmodel.py:161-163, read through
model_down at train.py:101-102 and torchloss.py:56-61; SURVEY.md §2.9.2) plus
the omega sigmoid parameters (train.py:29-32). Here they form an explicit
pytree carried through the jitted train step, so the annealing schedule never
triggers recompilation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from deep_active_inference_mc_tpu.ops.math import compute_omega  # noqa: F401


@struct.dataclass
class PrecisionState:
    """Dynamic scalars of the training process."""

    gamma: jax.Array  # top-down precision mixing weight, annealed 0 -> 0.8
    beta_s: jax.Array  # state-KL weight
    beta_o: jax.Array  # observation-likelihood weight

    @classmethod
    def create(cls, gamma=0.0, beta_s=1.0, beta_o=1.0):
        return cls(
            gamma=jnp.asarray(gamma, jnp.float32),
            beta_s=jnp.asarray(beta_s, jnp.float32),
            beta_o=jnp.asarray(beta_o, jnp.float32),
        )


@struct.dataclass
class OmegaParams:
    """Parameters of the omega sigmoid (train.py:23-32):
    a+d = max omega, b = KL[pi] at half-sigmoid, c = steepness, d = min."""

    a: float = 1.0
    b: float = 25.0
    c: float = 5.0
    d: float = 1.5

    def __call__(self, kl_pi):
        return compute_omega(kl_pi, self.a, self.b, self.c, self.d)

    @property
    def eval_omega(self) -> float:
        """Fixed omega used in per-epoch evaluation (train.py:145-146)."""
        return self.a / 2.0 + self.d


def anneal_gamma(
    precision: PrecisionState,
    epoch: int,
    gamma_delay: int = 30,
    gamma_rate: float = 0.01,
    gamma_max: float = 0.8,
) -> PrecisionState:
    """gamma += rate after ``gamma_delay`` epochs, capped at ``gamma_max``
    (train.py:37-40,101-102). Host-side, called once per epoch."""
    if epoch > gamma_delay:
        new_gamma = jnp.minimum(precision.gamma + gamma_rate, gamma_max)
        return precision.replace(gamma=new_gamma)
    return precision
