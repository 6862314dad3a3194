"""Single-dataclass configuration for the whole framework.

Rebuild of the reference's module-level constant blocks
(``/root/reference/train.py:29-49``, ``train_causal.py:23-41``) plus its
config-signature run-folder naming (train.py:51-54, minus the hard-coded
Colab drive prefix — SURVEY.md §2.8). The config is serialized into the run
directory and can be overridden from the CLI.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Optional


@dataclasses.dataclass
class Config:
    # --- model dims (train.py:33-34) ---
    s_dim: int = 10
    pi_dim: int = 4
    colour_channels: int = 1
    resolution: int = 64

    # --- omega sigmoid (train.py:29-32; semantics train.py:23-28) ---
    var_a: float = 1.0
    var_b: float = 25.0
    var_c: float = 5.0
    var_d: float = 1.5

    # --- precisions & annealing (train.py:35-40) ---
    beta_s: float = 1.0
    beta_o: float = 1.0
    gamma: float = 0.0
    gamma_rate: float = 0.01
    gamma_max: float = 0.8
    gamma_delay: int = 30

    # --- EFE data generation (train.py:41-43) ---
    deepness: int = 1
    samples: int = 1
    repeats: int = 5
    temperature: float = 10.0  # softmax(-G) temperature (util.py:46)
    # Common random numbers across the 4 candidate actions in the on-policy
    # generator (efe.calculate_G_4_repeated_crn): the softmax(-G, T=10)
    # action prior becomes signal-driven instead of argmax-of-MC-noise.
    # TPU-native enhancement (explicit-key RNG); 0 = reference semantics.
    crn: bool = False
    # Use the deterministic mean estimator (calculate_G_mean) in the
    # on-policy generator instead of the reference's sampled calculate_G
    # (torchmodel.py:227-245). Measured (epoch-797 checkpoint): the sampled
    # estimator's per-class scoring-edge signal is +-0 nats (reparam-
    # sampled decodes wash out the reward strip) while the mean estimator
    # carries +-17 nats; the softmax prior only teaches the habit net
    # shape->side behavior with this on. 0 = reference semantics.
    gen_mean: bool = False
    # Exploration floor when sampling the executed action: sample from
    # (1-eps)*Ppi + eps/pi_dim while the top-loss target stays the pure
    # prior. Guards the transition model's action coverage when the CRN
    # prior is sharp. 0 = reference semantics (sample the prior directly).
    explore_eps: float = 0.0
    # Edge curriculum: fraction of generator envs re-pinned to the scoring
    # edge (posY in {28..31}) after randomization, so reward transitions
    # stop being a ~6% rarity in the mid/down training batches. Measured
    # (epoch-797 probe): the VAE decodes reward with corr 1.0 but the
    # transition imagines edge pushes at ~20% magnitude, shape-blind —
    # classic rare-event underfitting. 0 = reference semantics
    # (uniform posY, game_environment.py:70).
    edge_frac: float = 0.0
    # Behavior-policy habit mixing: sample the executed action from
    # (1-p)*P_act + p*Q(pi|s_habit). Once the habit net is distilled from
    # the planner (apps/distill.py), its policy scores squares-LEFT
    # correctly while the softmax(-G) prior is near chance on square
    # direction (round-4 probe: mcts score_sq +0.07/env vs score_other
    # +1.23) — mixing it in is the only way square-LEFT scoring
    # transitions reach the mid/down losses at learnable frequency.
    # The top-loss target stays the pure prior. 0 = reference semantics.
    gen_habit_mix: float = 0.0

    # --- MCTS-visit distillation (train/distill.py; no reference analogue).
    # Every distill_every epochs, a jitted MCTS fleet (distill_envs envs x
    # distill_macro decisions at distill_repeats expansions, expand_k-wide
    # virtual-loss iterations) records root visit distributions, and the
    # habit net takes extra F_top steps against them (AlphaZero policy
    # improvement on top of the reference's softmax(-G) teacher, which
    # measurably plateaus at ~0.34 sweep score). 0 = off (reference
    # semantics).
    distill_every: int = 0
    distill_envs: int = 256
    distill_macro: int = 40
    distill_repeats: int = 100
    distill_expand_k: int = 4
    distill_batch: int = 2048
    distill_passes: int = 4
    distill_temp: float = 1.0

    # VAE encoder/decoder dropout during the training losses (0/1). The torch
    # port trains with it unconditionally live (modules never .eval(),
    # SURVEY.md §2.9), but the paper's MC-dropout mechanism is the
    # *transition* net (always on regardless of this flag), and the TF
    # original's Keras layers default dropout off without training=True.
    # Measured: always-on VAE dropout plateaus the pixel NLL at ~186 nats;
    # disabling it drops NLL by 40+ nats within a few epochs — the published
    # 80/60-nat quality anchors imply the dropout-off regime. Default 0
    # (intended semantics); set 1 for port-faithful training.
    vae_train_dropout: int = 0

    # --- optimization (train.py:44-46) ---
    l_rate_top: float = 1e-4
    l_rate_mid: float = 1e-4
    l_rate_down: float = 1e-3
    # Global-norm gradient clipping per layer optimizer; 0 = off (reference
    # semantics — plain Adam, train.py:89-94). Added with the per-round
    # grad-norm instrumentation to diagnose/bound the rare ~30% F spikes
    # seen at batch 512 (train512.log epochs 1372/1389).
    clip_grad: float = 0.0
    # Freeze the habit net: F_top and its on-policy KL (the omega input)
    # are still computed, but the top Adam update is skipped. Protects a
    # planner-distilled habit (apps/distill.py) from being dragged back
    # toward the noisier softmax(-G) teacher while the mid/down nets keep
    # learning from habit-mixed on-policy data (gen_habit_mix). 0/False =
    # reference semantics.
    freeze_top: bool = False

    # --- training volume (train.py:20,47-49) ---
    batch: int = 50
    rounds: int = 1000
    test_size: int = 1000
    epochs: int = 1000

    # --- checkpoint cadence (train.py:128-133) ---
    save_every: int = 2
    archive_every: int = 25

    # --- per-epoch behavioral sweep (train.py:71-73 train_scores_*) ---
    # 512 envs x 100 macro-steps gives the score series a real signal;
    # smaller sweeps are statistical noise at early-training effect sizes.
    sweep_envs: int = 512
    sweep_steps: int = 100

    # --- artifact cadence (reference: every epoch, train.py:177-186) ---
    viz_every: int = 1

    # --- TPU execution ---
    bf16: bool = False  # bfloat16 compute for model forwards
    mesh_shape: Optional[int] = None  # total mesh devices; None = no mesh
    tp: int = 1  # model-axis size within mesh_shape (Megatron TP); 1 = pure DP

    # --- run identity ---
    prefix: str = "final_model_"
    out_root: str = "runs"

    @property
    def signature(self) -> str:
        """Run-folder signature (train.py:51-52)."""
        return (
            f"{self.prefix}{self.gamma_rate}_{self.gamma_delay}_{self.var_a}_"
            f"{self.batch}_{self.s_dim}_{self.repeats}"
        )

    @property
    def folder(self) -> Path:
        return Path(self.out_root) / f"figs_{self.signature}"

    @property
    def folder_chp(self) -> Path:
        return self.folder / "checkpoints"

    def save(self, path: Path) -> None:
        path.write_text(json.dumps(dataclasses.asdict(self), indent=2))

    @classmethod
    def load(cls, path: Path) -> "Config":
        return cls(**json.loads(path.read_text()))

    @classmethod
    def from_args(cls, argv=None, **overrides) -> "Config":
        """CLI override parsing: any field is settable via --field value."""
        import argparse

        scalar_types = {"int": int, "float": float, "str": str,
                        "Optional[int]": int,
                        int: int, float: float, str: str, Optional[int]: int}
        parser = argparse.ArgumentParser(description="Config overrides.")
        for f in dataclasses.fields(cls):
            if f.type in scalar_types:
                parser.add_argument(
                    f"--{f.name}", type=scalar_types[f.type], default=None
                )
            elif f.type in ("bool", bool):
                parser.add_argument(f"--{f.name}", action="store_true", default=None)
        args = parser.parse_args(argv)  # strict: typo'd flags error out
        vals = {k: v for k, v in vars(args).items() if v is not None}
        vals.update(overrides)
        return cls(**vals)
