"""Interactive real-time demo + qualitative eval — rebuild of
``/root/reference/test_demo.py``.

Six controller modes, switchable live (test_demo.py:233-287):
  1 mcts   full planner (array-based MCTS, all G terms)
  2 ai     k-step EFE softmax agent (all G terms)
  3 habit  habitual network
  4 no     manual control (wasd)
  5 t1     reward-only agent (term a)
  6 t12    terms a+b agent
plus keys: q quit, m toggle mean, r reset score, o/p (or [/]) imagination
steps -/+, 8/9 softmax temperature -/+.

Round structure mirrors the reference loop (test_demo.py:118-204): every
1000 steps the score prints and resets; every 100 steps the environment
re-randomizes keeping score; plans execute one action per frame from a
queue that flushes on a scoring event; the MCTS mode overlays a 32x32
visit-density mask of the planned trajectories (make_mask,
test_demo.py:87-113).

TPU-first: all controllers are jitted batch-1 calls into the same engine
the trainer uses. The UI is non-blocking matplotlib key events (the port
regressed to a blocking ``input()`` — SURVEY.md §2.8); ``--headless N``
runs N frames without a display and prints the score trace (also the
demo's test harness).
"""

from __future__ import annotations

import argparse
import functools
import sys
import time
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from deep_active_inference_mc_tpu.config import Config
from deep_active_inference_mc_tpu.envs import dsprites as env_lib
from deep_active_inference_mc_tpu.envs import raster
from deep_active_inference_mc_tpu.infer import efe
from deep_active_inference_mc_tpu.infer.agent import ActiveInferenceAgent
from deep_active_inference_mc_tpu.plan import mcts as mcts_lib
from deep_active_inference_mc_tpu.train import loop as train_loop
from deep_active_inference_mc_tpu.utils import checkpoint as ckpt

DURATION_OF_EXPERIMENT = 1000
DURATION_OF_ROUND = 100


def softmax(x, temp):
    e = np.exp((x - np.max(x)) / temp)
    return e / e.sum()


def make_mask(all_paths: List[List[int]], pos_x: int, pos_y: int, jumps: int):
    """Visit-density mask over planned trajectories (test_demo.py:87-113)."""
    mask = np.zeros((32, 32))
    for path in all_paths:
        tx, ty = pos_x, pos_y
        for p_i in path:
            for _ in range(jumps):
                if p_i == 0 and tx < 31:
                    tx += 1
                elif p_i == 1 and tx > 0:
                    tx -= 1
                elif p_i == 2 and ty < 31:
                    ty += 1
                elif p_i == 3 and ty > 0:
                    ty -= 1
                else:
                    continue
                mask[tx, ty] += 1.0
    return mask / mask.max() if mask.max() > 0 else mask


class Demo:
    """Controller + environment state machine, UI-independent."""

    def __init__(self, agent, params, cfg: Config, args):
        self.agent = agent
        self.params = params
        self.cfg = cfg
        self.args = args
        self.lut = raster.build_sprite_lut()
        self.key = jax.random.key(args.seed)
        self.env = env_lib.reset(self._next_key(), 1)
        self.env = env_lib.randomize(self._next_key(), self.env)
        self.env = self.env.replace(score=jnp.zeros((1,)))
        self.executing_steps: List[int] = []
        self.t = 0
        self.method = args.method
        self.steps = args.steps
        self.temperature = args.temperature
        self.mean = args.mean
        self.mask = np.zeros((32, 32))
        self.G = np.zeros(4)
        self.terms = [np.zeros(4) for _ in range(3)]
        self.last_info = ""

        mcts_params = mcts_lib.MCTSParams(
            C=args.C,
            threshold=args.threshold,
            repeats=args.repeats,
            simulation_depth=args.depth,
            use_habit=not args.no_habit,
            use_means=True,
            fused_eval=getattr(args, "fused", False),
            using_prior_for_exploration=getattr(args, "prior_explore", False),
        )
        self._planner = mcts_lib.make_jit_planner(
            agent, mcts_params, collect_paths=True
        )

        @functools.partial(jax.jit, static_argnames=("steps", "calc_mean"))
        def g4(params, key, o, steps, calc_mean):
            return efe.calculate_G_4_repeated(
                agent, params, key, o, steps=steps, calc_mean=calc_mean,
                samples=10,
            )

        self._g4 = g4
        self._habit = jax.jit(agent.habitual_net)

    def _next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    # ------------------------------------------------------------------ UI
    def frame(self) -> np.ndarray:
        # np.array (copy): on CPU np.asarray aliases the read-only jax buffer.
        o = np.array(env_lib.render(self.lut, self.env))[0, :, :, 0]
        o[59:63, 31] = 1.0  # center marker (test_demo.py:207)
        if self.method == "mcts" and self.mask.max() > 0:
            o[16:48, 16:48] = np.clip(o[16:48, 16:48] + self.mask, 0, 1)
        return o

    @property
    def score(self) -> float:
        return float(self.env.score[0])

    # ------------------------------------------------------------ controllers
    def _plan(self):
        o = env_lib.render(self.lut, self.env)
        rng = np.random.default_rng(int(self.t) + self.args.seed)
        if self.method == "habit":
            q_pi = np.asarray(self._habit(self.params, o))[0]
            pi = int(rng.choice(4, p=q_pi / q_pi.sum()))
            self.executing_steps = [pi] * self.steps
            self.last_info = f"habit Qpi={np.round(q_pi, 2)}"
        elif self.method == "mcts":
            res = self._planner(self.params, self._next_key(), o)
            length = int(res.lengths[0])
            path = [int(a) for a in np.asarray(res.actions[0][:length])]
            all_paths = []
            for it in range(int(res.repeats_done[0])):
                p_row = np.asarray(res.all_paths[it, 0])
                all_paths.append([int(a) for a in p_row[p_row >= 0]])
            self.mask = make_mask(
                all_paths,
                int(self.env.latents[0, 5]),
                int(self.env.latents[0, 4]),
                self.args.jumps,
            )
            self.executing_steps = [
                a for a in path for _ in range(self.args.jumps)
            ]
            self.last_info = (
                f"mcts path={path} reps={int(res.repeats_done[0])} "
                f"N={np.round(np.asarray(res.root_N[0]), 1)}"
            )
        elif self.method in ("ai", "t1", "t12"):
            G, terms, _ = self._g4(
                self.params, self._next_key(), o, self.steps, self.mean
            )
            G = np.asarray(G)[0] / float(self.steps)
            t0 = -np.asarray(terms[0])[0] / float(self.steps)
            t1 = np.asarray(terms[1])[0] / float(self.steps)
            t2 = np.asarray(terms[2])[0] / float(self.steps)
            self.G, self.terms = G, [t0, t1, t2]
            choices = {
                "ai": softmax(-G, self.temperature),
                "t1": softmax(-t0, self.temperature),
                "t12": softmax(-(t0 + t1), self.temperature),
            }[self.method]
            pi = int(rng.choice(4, p=choices / choices.sum()))
            self.executing_steps = [pi] * (self.steps * self.args.jumps)
            self.last_info = (
                f"{self.method} G={np.round(G, 2)} "
                f"softmax={np.round(choices, 2)}"
            )
        else:  # manual
            self.executing_steps = []

    def manual_action(self, pi: int):
        self.env, _ = env_lib.step(
            self._next_key(), self.env, jnp.asarray([pi], jnp.int32)
        )

    def tick(self):
        """One frame of the main loop (test_demo.py:118-204)."""
        if self.method in ("t1", "t12", "ai", "mcts", "habit"):
            if self.t % DURATION_OF_EXPERIMENT == 0 and self.t > 0:
                print(
                    f"{self.t} ROUND SCORE: {self.score:.3f}", flush=True
                )
                self.env = self.env.replace(score=jnp.zeros((1,)))
            if self.t % DURATION_OF_ROUND == 0:
                score = self.env.score
                self.env = env_lib.randomize(self._next_key(), self.env)
                self.env = self.env.replace(score=score)
                self.executing_steps = []

            if not self.executing_steps:
                self._plan()

        if self.executing_steps:
            pi = self.executing_steps[0]
            self.env, scored = env_lib.step(
                self._next_key(), self.env, jnp.asarray([pi], jnp.int32)
            )
            if bool(scored[0]):
                self.executing_steps = []  # flush on scoring event
            else:
                self.executing_steps = self.executing_steps[1:]
        self.t += 1

    # ------------------------------------------------------------- keyboard
    def on_key(self, k: str):
        if k == "m":
            self.mean = not self.mean
            print("Using mean:", self.mean)
        elif k == "s":
            self.manual_action(0)
        elif k == "w":
            self.manual_action(1)
        elif k == "d":
            self.manual_action(2)
        elif k == "a":
            self.manual_action(3)
        elif k == "r":
            self.env = self.env.replace(score=jnp.zeros((1,)))
            self.t = 0
            print("Restart scoring")
        elif k == "1":
            self.method = "mcts"
            print("Active inference with full-scale planner (all G terms)")
        elif k == "2":
            self.method = "ai"
            print("1-step active inference (all G terms)")
        elif k == "3":
            self.method = "habit"
            print("Habitual mode")
        elif k == "4":
            self.method = "no"
            print("Stopped. You control the agent (wasd)")
        elif k == "5":
            self.method = "t1"
            print("Term a in control (reward-based agent)")
        elif k == "6":
            self.method = "t12"
            print("Terms a+b in control")
        elif k in ("o", "["):
            self.steps = max(1, self.steps - 1)
            print("STEPS", self.steps)
        elif k in ("p", "]"):
            self.steps += 1
            print("STEPS", self.steps)
        elif k == "8":
            self.temperature = max(self.temperature - 5.0, 1.0)
            print("Temperature:", self.temperature)
        elif k == "9":
            self.temperature += 5.0
            print("Temperature:", self.temperature)


def run_interactive(demo: Demo, duration: int):
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 6))
    state = {"quit": False}

    def on_key(event):
        if event.key == "q":
            state["quit"] = True
        elif event.key:
            demo.on_key(event.key)

    fig.canvas.mpl_connect("key_press_event", on_key)
    im = ax.imshow(demo.frame(), cmap="gray", vmin=0, vmax=1)
    txt = ax.text(2, 70, "", fontsize=8, color="black")
    ax.set_xticks([])
    ax.set_yticks([])
    while demo.t < duration and not state["quit"]:
        demo.tick()
        im.set_data(demo.frame())
        txt.set_text(
            f"score: {demo.score:.2f}  method: {demo.method}\n{demo.last_info}"
        )
        plt.pause(0.001)
    plt.close(fig)


def make_fused_round(agent, method: str, args, lut):
    """One demo ROUND (100 frames) as a single jitted on-device scan.

    The host-driven tick pays ~2 dispatches/frame over the device tunnel
    (~6 ms each); at 100 steps/round that caps headless throughput at ~80
    fps regardless of compute. This fuses the whole round — randomize
    (keeping score), then 100x [plan-if-queue-empty -> step -> flush-on-
    score] — into ONE dispatch, with the plan queue living on device.
    Queue/flush semantics match Demo.tick exactly (test_demo.py:118-204)."""
    mcts_params = mcts_lib.MCTSParams(
        C=args.C,
        threshold=args.threshold,
        repeats=args.repeats,
        simulation_depth=args.depth,
        use_habit=not args.no_habit,
        use_means=True,
        fused_eval=getattr(args, "fused", False),
        using_prior_for_exploration=getattr(args, "prior_explore", False),
    )
    jumps, steps, temp = args.jumps, args.steps, args.temperature
    maxq = max(mcts_params.max_depth * jumps, steps * jumps, steps)

    def plan(params, key, env):
        """(queue, qlen) for one env from the current frame."""
        o = env_lib.render(lut, env)
        idx = jnp.arange(maxq, dtype=jnp.int32)
        if method == "habit":
            q_pi = agent.habitual_net(params, o)
            pi = jax.random.categorical(
                key, jnp.log(q_pi + 1e-20), axis=-1
            ).astype(jnp.int32)[0]
            return jnp.where(idx < steps, pi, -1), jnp.asarray(
                steps, jnp.int32
            )
        if method == "mcts":
            res = mcts_lib.active_inference_mcts(
                agent, params, key, o, mcts_params
            )
            path, length = res.actions[0], res.lengths[0]
            src = path[jnp.minimum(idx // jumps, path.shape[0] - 1)]
            valid = (idx // jumps) < length
            return (
                jnp.where(valid, src, -1),
                (length * jumps).astype(jnp.int32),
            )
        # ai / t1 / t12: k-step EFE softmax agents.
        k_G, k_act = jax.random.split(key)
        G, terms, _ = efe.calculate_G_4_repeated(
            agent, params, k_G, o, steps=steps, calc_mean=args.mean,
            samples=10,
        )
        # Per-step G normalization, matching Demo._plan (G accumulates over
        # ``steps``; softmax must see the per-step average or the policy is
        # steps-times sharper than the interactive path).
        t0, t1 = -terms[0] / steps, terms[1] / steps
        score = {"ai": -G / steps, "t1": -t0, "t12": -(t0 + t1)}[method]
        pi = jax.random.categorical(k_act, score / temp, axis=-1).astype(
            jnp.int32
        )[0]
        n = steps * jumps
        return jnp.where(idx < n, pi, -1), jnp.asarray(n, jnp.int32)

    @jax.jit
    def fused_round(params, key, env, queue, qlen):
        k_rand, k_scan = jax.random.split(key)
        score = env.score
        env = env_lib.randomize(k_rand, env).replace(score=score)
        qlen = jnp.zeros_like(qlen)  # round boundary clears the plan queue

        def tick(carry, k):
            env, queue, qlen = carry
            k_plan, k_step = jax.random.split(k)
            queue, qlen = jax.lax.cond(
                qlen == 0,
                lambda: plan(params, k_plan, env),
                lambda: (queue, qlen),
            )
            stepped = qlen > 0
            a = jnp.maximum(queue[0], 0)
            env2, scored = env_lib.step(
                k_step, env, jnp.asarray([a], jnp.int32)
            )
            env = jax.tree.map(
                lambda new, old: jnp.where(stepped, new, old), env2, env
            )
            flush = stepped & scored[0]
            qlen = jnp.where(
                flush, 0, jnp.maximum(qlen - stepped.astype(jnp.int32), 0)
            )
            queue = jnp.roll(queue, -1)
            return (env, queue, qlen), env.score[0]

        (env, queue, qlen), trace = jax.lax.scan(
            tick, (env, queue, qlen), jax.random.split(k_scan, DURATION_OF_ROUND)
        )
        return env, queue, qlen, trace

    return fused_round, maxq


def run_headless(demo: Demo, duration: int):
    if demo.method in ("t1", "t12", "ai", "mcts", "habit"):
        return run_headless_fused(demo, duration)
    t0 = time.time()
    for _ in range(duration):
        demo.tick()
    print(
        f"headless done: {duration} frames, score {demo.score:.3f}, "
        f"{duration / (time.time() - t0):.1f} fps, method={demo.method}",
        flush=True,
    )


def run_headless_fused(demo: Demo, duration: int):
    """Headless eval through the fused on-device round (one dispatch per 100
    frames instead of ~2 per frame)."""
    fused_round, maxq = make_fused_round(
        demo.agent, demo.method, demo.args, demo.lut
    )
    env = demo.env
    queue = jnp.full((maxq,), -1, jnp.int32)
    qlen = jnp.asarray(0, jnp.int32)
    key = demo.key
    # Whole 100-frame rounds (the round boundary re-randomizes the env,
    # test_demo.py:125-129); round *up* so at least ``duration`` frames run.
    n_rounds = max(1, -(-duration // DURATION_OF_ROUND))
    if n_rounds * DURATION_OF_ROUND != duration:
        print(
            f"note: running {n_rounds * DURATION_OF_ROUND} frames "
            f"({n_rounds} whole rounds) for --headless {duration}"
        )
    t0 = None
    for r in range(n_rounds):
        key, k = jax.random.split(key)
        env, queue, qlen, trace = fused_round(demo.params, k, env, queue, qlen)
        if t0 is None:  # timing excludes the one-off XLA compile (round 0)
            jax.block_until_ready(trace)
            t0 = time.time()
            compiled_rounds = 0
        else:
            compiled_rounds += 1
        t_now = (r + 1) * DURATION_OF_ROUND
        if t_now % DURATION_OF_EXPERIMENT == 0:
            print(
                f"{t_now} ROUND SCORE: {float(env.score[0]):.3f}", flush=True
            )
            env = env.replace(score=jnp.zeros((1,)))
    jax.block_until_ready(env.score)
    frames = compiled_rounds * DURATION_OF_ROUND
    # Single-round runs have no post-compile round to time (ADVICE r2 #4).
    fps_str = (
        f"{frames / max(time.time() - t0, 1e-9):.1f} fps (steady-state)"
        if compiled_rounds > 0
        else "fps n/a (single round is all compile)"
    )
    demo.env = env
    demo.key = key  # advance the demo's key stream past this run
    print(
        f"headless done: {n_rounds * DURATION_OF_ROUND} frames, "
        f"score {float(env.score[0]):.3f}, {fps_str}, "
        f"method={demo.method}",
        flush=True,
    )


def run_record(demo: Demo, duration: int, path: str):
    """Record a reference-style demo gif (the reference ships
    ``dsprites.gif``, a 1001-frame recording of its demo loop): run the
    host-driven controller loop and save every composited frame — sprite +
    reward strip + center marker + (for mcts) the planned-trajectory visit
    mask (test_demo.py:207-210)."""
    import time as _time

    from PIL import Image

    t0 = _time.time()
    frames = []
    for _ in range(duration):
        demo.tick()
        f = np.clip(demo.frame() * 255.0, 0.0, 255.0).astype(np.uint8)
        frames.append(
            Image.fromarray(f, mode="L").resize((256, 256), Image.NEAREST)
        )
    frames[0].save(
        path, save_all=True, append_images=frames[1:], duration=50, loop=0
    )
    print(
        f"recorded {duration} frames -> {path} "
        f"({_time.time() - t0:.1f}s, final score {demo.score:.2f}, "
        f"method={demo.method})",
        flush=True,
    )


def run_record_ref(demo: Demo, duration: int, path: str):
    """Record a gif in the REFERENCE recording's exact format — 500x500
    NEAREST-upscaled frames with the running score painted into the frame
    (test_demo.py:210-221 renders at 500 res with a ``score: <cum> (<rate>)``
    text overlay; ``/root/reference/dsprites.gif`` is 1001 such frames) —
    so ``scripts/gif_score.py --gif`` decodes this rebuild's recording with
    the same algorithm it decodes the reference's (VERDICT r4 ask #5).

    The exact per-frame score trace is also saved to ``<path>.scores.npz``:
    the decode is verifiable against ground truth instead of trusted.
    """
    import time as _time

    from PIL import Image

    from deep_active_inference_mc_tpu.viz import scoretext

    t0 = _time.time()
    frames, trace = [], []
    for _ in range(duration):
        demo.tick()
        trace.append(demo.score)
        f = np.clip(demo.frame() * 255.0, 0.0, 255.0).astype(np.uint8)
        big = np.asarray(
            Image.fromarray(f, mode="L").resize((500, 500), Image.NEAREST)
        ).copy()
        rate = DURATION_OF_EXPERIMENT * demo.score / float(max(demo.t, 1))
        scoretext.paint_score(big, demo.score, rate)
        frames.append(Image.fromarray(big, mode="L"))
    frames[0].save(
        path, save_all=True, append_images=frames[1:], duration=50, loop=0
    )
    np.savez_compressed(path + ".scores.npz", scores=np.asarray(trace))
    print(
        f"recorded {duration} ref-style frames -> {path} "
        f"(+{path}.scores.npz, {_time.time() - t0:.1f}s, "
        f"final score {demo.score:.2f}, method={demo.method})",
        flush=True,
    )


def main(argv=None):
    from deep_active_inference_mc_tpu.utils import compcache

    compcache.enable_persistent_cache()
    parser = argparse.ArgumentParser(description="Interactive demo.")
    parser.add_argument("-n", "--network", type=str, default="",
                        help="Checkpoint dir (figs_*/checkpoints) to load.")
    parser.add_argument("-m", "--mean", action="store_true")
    parser.add_argument("-d", "--duration", type=int, default=50001)
    parser.add_argument("-method", "--method", type=str, default="mcts",
                        choices=["t1", "t12", "ai", "mcts", "habit", "no"])
    parser.add_argument("-steps", "--steps", type=int, default=7)
    parser.add_argument("-temp", "--temperature", type=float, default=1.0)
    parser.add_argument("-jumps", "--jumps", type=int, default=5)
    parser.add_argument("-C", "--C", type=float, default=1.0)
    parser.add_argument("-repeats", "--repeats", type=int, default=300)
    parser.add_argument("-threshold", "--threshold", type=float, default=0.5)
    parser.add_argument("-depth", "--depth", type=int, default=3)
    parser.add_argument("-no_habit", "--no_habit", action="store_true",
                        help="Disable the habit short-circuit (phase A). "
                        "The reference CLI wired this backwards — "
                        "test_demo.py:40, SURVEY.md §2.8.")
    parser.add_argument("--headless", type=int, default=0,
                        help="Run N frames without a display.")
    parser.add_argument("--record", type=str, default="",
                        help="Record --duration frames to this gif "
                        "(reference dsprites.gif analogue) instead of "
                        "opening a display.")
    parser.add_argument("--record_ref", type=str, default="",
                        help="Record --duration frames to this gif in the "
                        "REFERENCE recording's format (500x500, score "
                        "painted into the frame, decodable by "
                        "scripts/gif_score.py --gif) plus the exact score "
                        "trace as <gif>.scores.npz.")
    parser.add_argument("--prior_explore", action="store_true",
                        help="Habit-prior-weighted selection bonus — the "
                        "reference's using_prior_for_exploration "
                        "(mcts.py:43-44,148; default off there too).")
    parser.add_argument("--fused", action="store_true",
                        help="Mega-batched MCTS expand+simulate evaluator "
                        "(fewer dispatches per planner iteration).")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--platform", type=str, default="default",
                        choices=["default", "cpu"],
                        help="'cpu' forces the JAX CPU backend (single-env "
                        "demo runs fine without a TPU; this environment's "
                        "sitecustomize pre-registers the TPU platform, so "
                        "the switch must go through jax.config, which wins "
                        "over the env var — see tests/conftest.py).")
    args = parser.parse_args(argv)

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    cfg = Config()
    agent = ActiveInferenceAgent(s_dim=cfg.s_dim, pi_dim=cfg.pi_dim)
    if args.network:
        state = train_loop.create_train_state(cfg, agent, jax.random.key(0))
        state, _, _ = ckpt.load_all(args.network, state)
        params = state.params
        print(f"Loaded checkpoint from {args.network}")
    else:
        params = agent.init(jax.random.key(0))
        print("No checkpoint given (-n); using untrained weights.")

    demo = Demo(agent, params, cfg, args)
    if args.record_ref:
        run_record_ref(demo, args.duration, args.record_ref)
    elif args.record:
        run_record(demo, args.duration, args.record)
    elif args.headless:
        run_headless(demo, args.headless)
    else:
        run_interactive(demo, args.duration)


if __name__ == "__main__":
    main(sys.argv[1:])
