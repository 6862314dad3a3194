"""deep_active_inference_mc_tpu — a TPU-native rebuild of deep-active-inference-mc.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
``zfountas/deep-active-inference-mc`` (NeurIPS 2020, "Deep active inference
agents using Monte-Carlo methods"): the dynamic-dSprites sorting environment,
the three-layer amortized active-inference agent (habitual policy network /
MC-dropout transition model / convolutional VAE), expected-free-energy (EFE)
Monte-Carlo estimation, and an MCTS planner whose value function is -G.

Everything — environment stepping, frame rasterization, model forwards, EFE
rollouts, tree search, and the staged three-layer update — runs on-device
under ``jax.jit``, batched over thousands of parallel environments, and shards
over a ``jax.sharding.Mesh`` for multi-chip execution.

Reference layer map: /root/reference (see SURVEY.md at the repo root).
"""

__version__ = "0.1.0"
