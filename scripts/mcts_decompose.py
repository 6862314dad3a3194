"""MCTS per-iteration cost decomposition (run with the TPU tunnel free).

Microbenchmarks through the axon tunnel are untrustworthy for sub-ms
dispatches (block_until_ready returns early), so this measures the only
thing that can be trusted — END-TO-END planner wall time — across stubbed
variants and differences them:

    full            select + expand-G + simulate + tree update
    stub_sim        simulate replaced by zeros (no rollout / trajectory-G)
    stub_expand     expand-G replaced by zeros (no G_mean networks)
    stub_both       tree mechanics + while_loop bookkeeping only

    sim cost    = full - stub_sim
    expand cost = full - stub_expand
    overhead    = stub_both

Usage: python scripts/mcts_decompose.py [--bf16] [--fused] [--repeats N]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--fused", action="store_true")
    ap.add_argument("--repeats", type=int, default=50)
    ap.add_argument("--batch", type=int, default=256)
    args = ap.parse_args()

    from deep_active_inference_mc_tpu.envs import dsprites as env_lib
    from deep_active_inference_mc_tpu.envs import raster
    from deep_active_inference_mc_tpu.infer import efe
    from deep_active_inference_mc_tpu.infer.agent import ActiveInferenceAgent
    from deep_active_inference_mc_tpu.plan import mcts as mcts_lib
    from deep_active_inference_mc_tpu.utils import compcache

    compcache.enable_persistent_cache()
    agent = ActiveInferenceAgent(
        s_dim=10, pi_dim=4,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
    )
    params = agent.init(jax.random.key(0))
    lut = raster.build_sprite_lut()
    state = env_lib.reset(jax.random.key(0), args.batch)
    o = env_lib.render(lut, state)
    p = mcts_lib.MCTSParams(
        repeats=args.repeats, simulation_depth=3, max_depth=16,
        fused_eval=args.fused,
    )

    real_fused = mcts_lib._fused_expand_sim
    real_expand = mcts_lib._expand_G
    real_sim = efe.mcts_step_simulate

    def stub_fused(stub_expand, stub_sim):
        def fn(agent_, params_, key, leaf_s, p_):
            B, s_dim = leaf_s.shape
            A = agent_.pi_dim
            if stub_expand and stub_sim:
                return (
                    jnp.zeros((B, A)),
                    jnp.broadcast_to(leaf_s[:, None], (B, A, s_dim)),
                    jnp.zeros((B,)),
                    jnp.full((B, A), 1.0 / A),
                )
            if stub_sim:
                G_leaf, ps_next = real_expand(agent_, params_, key, leaf_s, p_)
                return (
                    G_leaf, ps_next, jnp.zeros((B,)),
                    jnp.full((B, A), 1.0 / A),
                )
            if stub_expand:
                G_sim, _, Qpi = real_sim(
                    agent_, params_, key, leaf_s, p_.simulation_depth,
                    use_means=False,
                )
                return (
                    jnp.zeros((B, A)),
                    jnp.broadcast_to(leaf_s[:, None], (B, A, s_dim)),
                    G_sim, Qpi,
                )
            return real_fused(agent_, params_, key, leaf_s, p_)

        return fn

    def stub_unfused_expand(agent_, params_, key, s, p_):
        B, s_dim = s.shape
        A = agent_.pi_dim
        return jnp.zeros((B, A)), jnp.broadcast_to(
            s[:, None], (B, A, s_dim)
        )

    def stub_unfused_sim(agent_, params_, key, s, depth, use_means=False):
        B = s.shape[0]
        return jnp.zeros((B,)), None, jnp.full((B, 4), 0.25)

    def timed(label):
        planner = mcts_lib.make_jit_planner(agent, p)
        res = planner(params, jax.random.key(1), o)
        jax.device_get(res.actions[0, 0])  # true fence (see bench.py)
        t0 = time.perf_counter()
        reps = 3
        for i in range(reps):
            res = planner(params, jax.random.key(2 + i), o)
            jax.device_get(res.actions[0, 0])
        dt = time.perf_counter() - t0
        per_iter = dt / reps / args.repeats * 1e3
        print(
            f"{label:12s}: {args.batch * reps / dt:8.1f} plans/s, "
            f"{per_iter:6.2f} ms/iter", flush=True,
        )
        return per_iter

    variants = {}
    if args.fused:
        variants["full"] = (real_fused, None, None)
        variants["stub_sim"] = (stub_fused(False, True), None, None)
        variants["stub_expand"] = (stub_fused(True, False), None, None)
        variants["stub_both"] = (stub_fused(True, True), None, None)
        out = {}
        for name, (ffn, _, _) in variants.items():
            mcts_lib._fused_expand_sim = ffn
            out[name] = timed(name)
        mcts_lib._fused_expand_sim = real_fused
    else:
        variants["full"] = (real_expand, real_sim)
        variants["stub_sim"] = (real_expand, stub_unfused_sim)
        variants["stub_expand"] = (stub_unfused_expand, real_sim)
        variants["stub_both"] = (stub_unfused_expand, stub_unfused_sim)
        out = {}
        for name, (efn, sfn) in variants.items():
            mcts_lib._expand_G = efn
            efe.mcts_step_simulate = sfn
            out[name] = timed(name)
        mcts_lib._expand_G = real_expand
        efe.mcts_step_simulate = real_sim

    print(
        f"decomposition (ms/iter): sim={out['full'] - out['stub_sim']:.2f}, "
        f"expand={out['full'] - out['stub_expand']:.2f}, "
        f"overhead={out['stub_both']:.2f}, full={out['full']:.2f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
