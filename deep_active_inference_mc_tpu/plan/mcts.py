"""Array-based batched MCTS planner (value = -G, priors = habit network).

TPU-native rebuild of the reference's pointer-tree search
(``/root/reference/src/mcts.py``). The reference expands Python ``Node``
objects one at a time with batch-1-to-4 tensors — maximally host-bound
(SURVEY.md §3.3). Here the tree is a fixed-budget *structure of arrays*
(mctx-style) so hundreds of environments plan simultaneously on-device
inside one jit:

  - node slots are preallocated: every iteration expands exactly one leaf
    per environment, so slot ids are deterministic (root children 1..4,
    iteration i's children 5+4i..8+4i);
  - selection walks are vectorized gathers under ``lax.while_loop``;
  - backpropagation is one masked scatter-add along the recorded path;
  - the reference's data-dependent early stops become masked freezes:
    phase A (habit short-circuit, mcts.py:166-170) and phase B
    (visit-threshold, mcts.py:176-181) mark an environment done and freeze
    its tree, so the final action selection reads exactly the tree that
    existed at decision time;
  - the final visit-max walk and opposite-action pair trimming
    (mcts.py:98-128) are fixed-shape array postprocesses.

Semantics preserved per reference: UCB-like ``probs_for_selection``
(mcts.py:39-47), expand seeding W = -G / N = 1 (mcts.py:64-86), habit-guided
depth-3 simulations scored by trajectory G (torchmodel.py:354-393), and the
exact trim rule including its drop-last-action quirk (mcts.py:110-127).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from deep_active_inference_mc_tpu.infer import efe
from deep_active_inference_mc_tpu.infer.agent import ActiveInferenceAgent, Params
from deep_active_inference_mc_tpu.models.networks import reparameterize


@dataclasses.dataclass(frozen=True)
class MCTSParams:
    """Planner knobs (reference defaults, mcts.py:137-148). Static under jit."""

    C: float = 1.0
    threshold: float = 0.5
    repeats: int = 300
    simulation_repeats: int = 1
    simulation_depth: int = 3
    use_habit: bool = False
    use_means: bool = True
    using_prior_for_exploration: bool = False
    samples: int = 1  # MC samples in expand when use_means=False
    max_depth: int = 32  # selection-walk bound (trees this deep are degenerate)
    # Sampled (vs argmax) walks in select/action_selection — the reference's
    # ``deterministic=False`` modes (mcts.py:49-62, 98-108). The reference
    # entry point always passes deterministic=True (mcts.py:180,183,193);
    # these flags expose the rest of the API.
    deterministic_selection: bool = True
    deterministic_action: bool = True
    # Fuse every expand + simulate network forward of an iteration into
    # single mega-batched transition/decoder/encoder dispatches (same
    # estimators, same formulas, one MXU call each instead of ~11). The RNG
    # row layout differs from the unfused path, so per-key trees are not
    # bitwise identical — the estimator's *distribution* is (see
    # tests/test_mcts.py fused-vs-unfused statistics test).
    fused_eval: bool = False
    # Virtual-loss parallel expansion: expand ``expand_k`` leaves per
    # sequential iteration (selection walks diverge via virtual visits
    # applied between walks), evaluating all k expansions + simulations in
    # one k*B batch. ceil(repeats / expand_k) iterations keep the total
    # expansion budget. expand_k=1 is the reference-exact sequential search;
    # >1 is an explicit approximation (walks within an iteration cannot see
    # each other's G results — standard virtual-loss semantics) that cuts
    # the sequential critical path k-fold.
    expand_k: int = 1
    # Common random numbers across the 4 actions in each expansion's G
    # evaluation (efe.calculate_G_4_repeated_crn rationale): node values
    # rank sibling actions by signal instead of independent dropout draws.
    # Unfused path only (the fused evaluator concatenates expand+simulate
    # rows into single dispatches with per-row noise).
    crn: bool = False


class MCTSResult(NamedTuple):
    actions: jax.Array  # (B, max_depth) int32 trimmed action path, -1 padded
    lengths: jax.Array  # (B,) path lengths (0 possible — reference quirk)
    repeats_done: jax.Array  # (B,) iterations until decision
    states_explored: jax.Array  # (B,) simulated states
    depth_capped: jax.Array  # (B,) iterations whose walk hit max_depth
    #   (no-op expands — the deviation-from-reference counter, VERDICT r2
    #   weak #4: the reference's walks are unbounded, mcts.py:49-62)
    root_N: jax.Array  # (B, 4) root visit counts
    root_Qpi: jax.Array  # (B, 4) habit prior at root
    all_paths: Optional[jax.Array]  # (R, B, max_depth) selection paths or None
    all_paths_G: Optional[jax.Array]  # (R, B) simulation G per iteration
    tree: Optional["_Tree"] = None  # final tree arrays (return_tree=True)


@struct.dataclass
class _Tree:
    s: jax.Array  # (B, N, s_dim) node states
    W: jax.Array  # (B, N, 4) summed -G per edge
    N: jax.Array  # (B, N, 4) visit counts
    Qpi: jax.Array  # (B, N, 4) habit prior per node
    children: jax.Array  # (B, N, 4) child slot or -1
    done: jax.Array  # (B,) decision frozen
    repeats_done: jax.Array  # (B,)
    states_explored: jax.Array  # (B,)
    depth_capped: jax.Array  # (B,) no-op expands from the max_depth cap


def _probs_for_selection(W, N, Qpi, C, use_prior):
    """Normalized Q + exploration bonus (mcts.py:39-47). Expanded nodes have
    N >= 1 on every edge."""
    Q = W / jnp.maximum(N, 1e-12)
    Q = Q - jnp.min(Q, axis=-1, keepdims=True)
    Q = Q / jnp.maximum(jnp.sum(Q, axis=-1, keepdims=True), 1e-12)
    if use_prior:
        return Q + C * Qpi / jnp.maximum(N, 1e-12)
    return Q + C / jnp.maximum(N, 1e-12)


def _calc_threshold(P):
    """Decision confidence: max - mean (mcts.py:130-131)."""
    return jnp.max(P, axis=-1) - jnp.mean(P, axis=-1)


def _expand_G(
    agent: ActiveInferenceAgent,
    params: Params,
    key: jax.Array,
    s: jax.Array,
    p: MCTSParams,
):
    """G for all 4 actions of each state: (B, 4) G and (B, 4, s_dim) next
    states (mcts.py:64-86)."""
    B = s.shape[0]
    A = agent.pi_dim
    if p.crn:
        # Shared noise per action lane (MCTSParams.crn): vmap with the key
        # closed over, exactly like efe.calculate_G_4_repeated_crn.
        def one_action(pi_row):
            pi = jnp.broadcast_to(pi_row, (B, A))
            if p.use_means:
                G, _, ps_next, _ = efe.calculate_G_mean(
                    agent, params, key, s, pi
                )
            else:
                G, _, ps_next, _, _ = efe.calculate_G(
                    agent, params, key, s, pi, samples=p.samples
                )
            return G, ps_next

        G_a, ps_a = jax.vmap(one_action)(agent.pi_one_hot)
        return G_a.T, jnp.swapaxes(ps_a, 0, 1)
    s_r = jnp.repeat(s, A, axis=0)
    pi_r = jnp.tile(agent.pi_one_hot, (B, 1))
    if p.use_means:
        G, _, ps_next, _ = efe.calculate_G_mean(agent, params, key, s_r, pi_r)
    else:
        G, _, ps_next, _, _ = efe.calculate_G(
            agent, params, key, s_r, pi_r, samples=p.samples
        )
    return G.reshape(B, A), ps_next.reshape(B, A, -1)


def _fused_expand_sim(
    agent: ActiveInferenceAgent,
    params: Params,
    key: jax.Array,
    leaf_s: jax.Array,
    p: MCTSParams,
):
    """One iteration's full G workload — expand (calculate_G_mean over all
    actions, torchmodel.py:302-327) AND simulate (habit rollout + trajectory
    G, torchmodel.py:329-393) — with every network forward concatenated into
    ONE transition, ONE decoder and ONE encoder dispatch.

    The unfused path issues ~3 transition, 6 decoder and 2 encoder calls per
    iteration at batches B..4B; on TPU each conv dispatch under-fills the
    MXU at small B and pays fixed launch cost. Formulas and estimators are
    identical; only the dropout/noise row layout differs (independent draws
    per row either way).

    Returns (G_leaf (B, A), ps_next (B, A, s_dim), G_sim (B,),
    Qpi_leaf (B, A)).
    """
    from deep_active_inference_mc_tpu.ops import math as m

    B, s_dim = leaf_s.shape
    A = agent.pi_dim
    R = p.simulation_repeats
    D = p.simulation_depth
    k_roll, k_trans, k_rep1, k_rep2, k_enc = jax.random.split(key, 5)

    # --- habit rollout (sequential by nature; tiny MLP batches) -----------
    leaf_rep = jnp.repeat(leaf_s, R, axis=0)  # (B*R, s)

    def step_fn(s_t, k):
        k_pi, k_tr = jax.random.split(k)
        _, q_pi, _ = agent.habit(params, s_t)
        a = jax.random.categorical(k_pi, jnp.log(q_pi + 1e-20), axis=-1)
        pi_t = jax.nn.one_hot(a, A, dtype=jnp.float32)
        ps1, ps1_mean, ps1_logvar = agent.transition_with_sample(
            params, k_tr, pi_t, s_t, dropout=True
        )
        return ps1, (s_t, ps1, ps1_mean, ps1_logvar, pi_t, q_pi)

    _, (s0_tr, ps1_tr, mean_tr, logvar_tr, pi_tr, q_pis) = jax.lax.scan(
        step_fn, leaf_rep, jax.random.split(k_roll, D)
    )
    flat = lambda x: x.reshape((D * B * R,) + x.shape[2:])
    n1 = B * A  # expand rows
    n3 = D * B * R  # trajectory rows

    # --- ONE transition dispatch: expand pass 1 + pass 2 + trajectory -----
    s_r = jnp.repeat(leaf_s, A, axis=0)
    pi_r = jnp.tile(agent.pi_one_hot, (B, 1))
    t_s = jnp.concatenate([s_r, s_r, flat(s0_tr)], axis=0)
    t_pi = jnp.concatenate([pi_r, pi_r, flat(pi_tr)], axis=0)
    ps1_c, mean_c, logvar_c = agent.transition_with_sample(
        params, k_trans, t_pi, t_s, dropout=True
    )
    ps1_mean, ps1_logvar = mean_c[:n1], logvar_c[:n1]  # expand theta draw 1
    mean_b = mean_c[n1 : 2 * n1]  # expand theta draw 2 (term2_1 decodes MEAN)
    ps1_b_traj = ps1_c[2 * n1 :]  # trajectory theta draw (term2_1: SAMPLE)

    # --- ONE decoder dispatch ---------------------------------------------
    dec_in = jnp.concatenate(
        [
            ps1_mean,  # expand po1
            mean_b,  # expand term2_1
            reparameterize(k_rep1, ps1_mean, ps1_logvar),  # expand term2_2
            flat(ps1_tr),  # trajectory po1
            ps1_b_traj,  # trajectory term2_1
            reparameterize(k_rep2, flat(mean_tr), flat(logvar_tr)),  # t. 2_2
        ],
        axis=0,
    )
    dec = agent.decode(params, dec_in)
    po1_e, t21_e, t22_e = dec[:n1], dec[n1 : 2 * n1], dec[2 * n1 : 3 * n1]
    po1_t = dec[3 * n1 : 3 * n1 + n3]
    t21_t = dec[3 * n1 + n3 : 3 * n1 + 2 * n3]
    t22_t = dec[3 * n1 + 2 * n3 :]

    # --- ONE encoder dispatch ---------------------------------------------
    _, _, q_logvar = agent.encode_with_sample(
        params, k_enc, jnp.concatenate([po1_e, po1_t], axis=0)
    )
    qlv_e, qlv_t = q_logvar[:n1], q_logvar[n1:]

    def G_terms(po1, ps_logvar, q_logvar, t21, t22):
        # Score in f32 even under a bfloat16 agent: the MXU-heavy forwards
        # stay bf16, but G sums ~4096 pixel entropies to O(1e2-1e3) nats
        # where bf16's ~3 significant digits would alias nearby actions.
        po1, t21, t22 = (x.astype(jnp.float32) for x in (po1, t21, t22))
        ps_logvar = ps_logvar.astype(jnp.float32)
        q_logvar = q_logvar.astype(jnp.float32)
        term0 = agent.check_reward(po1)
        term1 = -jnp.sum(
            m.entropy_normal_from_logvar(ps_logvar)
            + m.entropy_normal_from_logvar(q_logvar),
            axis=-1,
        )
        term2 = jnp.sum(m.entropy_bernoulli(t21), axis=(-3, -2, -1)) - jnp.sum(
            m.entropy_bernoulli(t22), axis=(-3, -2, -1)
        )
        return -term0 + term1 + term2

    G_leaf = G_terms(po1_e, ps1_logvar, qlv_e, t21_e, t22_e).reshape(B, A)
    ps_next = ps1_mean.reshape(B, A, s_dim)
    G_rows = G_terms(po1_t, flat(logvar_tr), qlv_t, t21_t, t22_t)
    G_sim = G_rows.reshape(D, B * R).mean(0).reshape(B, R).mean(-1)
    Qpi_leaf = q_pis[0].reshape(B, R, A)[:, 0]
    return G_leaf, ps_next, G_sim, Qpi_leaf


def _select(
    tree: _Tree,
    C: float,
    use_prior: bool,
    max_depth: int,
    deterministic: bool = True,
    key: Optional[jax.Array] = None,
):
    """Vectorized selection walk (mcts.py:49-62): from the root, walk
    probs_for_selection (argmax, or a multinomial draw when
    ``deterministic=False`` — mcts.py:53,58) into children until a node
    without children. Returns (path_nodes, path_actions, path_len,
    leaf_idx); the path records (node, action-taken) pairs
    root..parent-of-leaf."""
    B, N_max, A = tree.W.shape
    bidx = jnp.arange(B)

    def cond(carry):
        cur, depth, *_ = carry
        has_children = jnp.any(
            tree.children[bidx, cur, 0] >= 0
        )  # any env still walking
        return jnp.logical_and(depth < max_depth, has_children)

    def body(carry):
        cur, depth, nodes, acts, lens = carry
        probs = _probs_for_selection(
            tree.W[bidx, cur], tree.N[bidx, cur], tree.Qpi[bidx, cur],
            C, use_prior,
        )
        if deterministic:
            a = jnp.argmax(probs, axis=-1).astype(jnp.int32)
        else:
            a = jax.random.categorical(
                jax.random.fold_in(key, depth),
                jnp.log(jnp.maximum(probs, 1e-30)),
                axis=-1,
            ).astype(jnp.int32)
        child = tree.children[bidx, cur, a]
        walking = child >= 0  # node had children -> we step into one
        nodes = nodes.at[:, depth].set(jnp.where(walking, cur, -1))
        acts = acts.at[:, depth].set(jnp.where(walking, a, -1))
        lens = lens + walking.astype(jnp.int32)
        cur = jnp.where(walking, child, cur)
        return cur, depth + 1, nodes, acts, lens

    cur0 = jnp.zeros((B,), jnp.int32)
    nodes0 = jnp.full((B, max_depth), -1, jnp.int32)
    acts0 = jnp.full((B, max_depth), -1, jnp.int32)
    lens0 = jnp.zeros((B,), jnp.int32)
    cur, _, nodes, acts, lens = jax.lax.while_loop(
        cond, body, (cur0, jnp.asarray(0), nodes0, acts0, lens0)
    )
    return nodes, acts, lens, cur


def _trim_path(path: jax.Array, length: jax.Array, pi_dim: int, max_depth: int):
    """Opposite-action pair trimming (mcts.py:110-127), exact semantics
    including the reference's `while i < len-1` bound (the final action is
    examined only as the second element of a pair)."""
    if pi_dim == 4:
        def opposite(a, b):
            return ((a == 0) & (b == 1)) | ((a == 1) & (b == 0)) | (
                (a == 2) & (b == 3)
            ) | ((a == 3) & (b == 2))
    elif pi_dim == 3:
        def opposite(a, b):
            return ((a == 1) & (b == 2)) | ((a == 2) & (b == 1))
    else:
        raise ValueError(f"Unknown pi_dim {pi_dim}")

    B = path.shape[0]

    def step(carry, i):
        out, out_len, skip = carry
        a = path[:, i]
        b = jnp.where(i + 1 < max_depth, path[:, jnp.minimum(i + 1, max_depth - 1)], -1)
        in_range = i < length - 1  # reference bound: last action never emitted
        is_pair = opposite(a, b) & in_range & ~skip
        emit = in_range & ~skip & ~is_pair
        out = jnp.where(
            emit[:, None] & (jnp.arange(max_depth)[None, :] == out_len[:, None]),
            a[:, None],
            out,
        )
        out_len = out_len + emit.astype(jnp.int32)
        skip = is_pair  # next position is the pair's second half: skip it
        return (out, out_len, skip), None

    out0 = jnp.full((B, max_depth), -1, jnp.int32)
    (out, out_len, _), _ = jax.lax.scan(
        step,
        (out0, jnp.zeros((B,), jnp.int32), jnp.zeros((B,), bool)),
        jnp.arange(max_depth),
    )
    return out, out_len


def _action_selection(
    tree: _Tree,
    max_depth: int,
    pi_dim: int,
    deterministic: bool = True,
    key: Optional[jax.Array] = None,
):
    """Final visit-count walk (mcts.py:98-108) + pair trim. Argmax by
    default; ``deterministic=False`` samples proportional to visit counts
    (mcts.py:101,106)."""
    B, N_max, A = tree.N.shape
    bidx = jnp.arange(B)

    def cond(carry):
        cur, depth, *_ = carry
        return jnp.logical_and(
            depth < max_depth, jnp.any(tree.children[bidx, cur, 0] >= 0)
        )

    def body(carry):
        cur, depth, acts, lens = carry
        if deterministic:
            a = jnp.argmax(tree.N[bidx, cur], axis=-1).astype(jnp.int32)
        else:
            a = jax.random.categorical(
                jax.random.fold_in(key, depth),
                jnp.log(jnp.maximum(tree.N[bidx, cur], 1e-30)),
                axis=-1,
            ).astype(jnp.int32)
        child = tree.children[bidx, cur, a]
        walking = child >= 0
        acts = acts.at[:, depth].set(jnp.where(walking, a, -1))
        lens = lens + walking.astype(jnp.int32)
        cur = jnp.where(walking, child, cur)
        return cur, depth + 1, acts, lens

    acts0 = jnp.full((B, max_depth), -1, jnp.int32)
    _, _, acts, lens = jax.lax.while_loop(
        cond,
        body,
        (jnp.zeros((B,), jnp.int32), jnp.asarray(0), acts0,
         jnp.zeros((B,), jnp.int32)),
    )
    return _trim_path(acts, lens, pi_dim, max_depth)



@struct.dataclass
class SearchCarry:
    """Resumable search state — everything live between planner iterations.

    Factoring the search into ``_init_search`` → ``_run_search``(×k) →
    ``_finalize_search`` lets a host-side driver pause the search at
    iteration boundaries, retire decided environments, and re-pack the
    stragglers into a smaller batch (``make_bucketed_planner``): the
    batched while_loop otherwise runs until the *slowest* env decides, and
    every decided env keeps paying full (masked) G-network compute while it
    rides along. Every field has leading batch dim B except ``i`` and the
    two keys, which are shared across the batch (compaction copies them, so
    a continued search replays the same fold_in(k_loop, i) key sequence).
    """

    i: jax.Array  # () int32 — sequential iterations completed
    tree: _Tree
    done: jax.Array  # (B,) decision frozen (phase A/B, or budget)
    habit_done: jax.Array  # (B,) phase-A short-circuit fired
    habit_action: jax.Array  # (B,) phase-A habit action
    root_Qpi: jax.Array  # (B, A) habit prior at the root
    k_loop: jax.Array  # iteration key stream (fold_in by iteration index)
    k_final: jax.Array  # final action-selection key


def _budget(p: MCTSParams, A: int) -> Tuple[int, int, int]:
    """(sequential iterations, total expansions, node-slot budget).

    ceil(repeats / expand_k) iterations of expand_k expansions each
    preserve the reference's total expansion budget (mcts.py:141,174)."""
    n_iters = -(-p.repeats // p.expand_k)
    n_expansions = n_iters * p.expand_k
    N_max = A * (n_expansions + 1) + 2  # root + children per expansion + pad
    return n_iters, n_expansions, N_max


def _phase_b_done(tree: _Tree, p: MCTSParams) -> jax.Array:
    """Phase B check (mcts.py:176-181): normalized root visits confident."""
    N_root = tree.N[:, 0]
    N_norm = N_root / jnp.maximum(N_root.sum(-1, keepdims=True), 1e-12)
    return tree.done | (_calc_threshold(N_norm) > p.threshold)


def _init_search(
    agent: ActiveInferenceAgent,
    params: Params,
    key: jax.Array,
    frames: jax.Array,
    p: MCTSParams,
) -> SearchCarry:
    """Search setup: root encode (posterior mean, mcts.py:158-161), habit
    prior, phase-A short-circuit (mcts.py:166-170), root expand
    (mcts.py:172). Phase-A-decided envs start ``done`` — they skip the
    search entirely, like the reference's immediate return."""
    B = frames.shape[0]
    A = agent.pi_dim
    if p.crn and p.fused_eval:
        raise ValueError(
            "MCTSParams.crn requires the unfused evaluator "
            "(fused_eval concatenates rows with per-row noise)"
        )
    _, _, N_max = _budget(p, A)
    k_habit, k_root, k_loop, k_final = jax.random.split(key, 4)

    # Root: posterior MEAN of the encoded frame (mcts.py:158-161).
    qs0_mean, _ = agent.encode(params, frames)
    _, root_Qpi, _ = agent.habit(params, qs0_mean)

    s_dim = qs0_mean.shape[-1]
    tree = _Tree(
        s=jnp.zeros((B, N_max, s_dim)).at[:, 0].set(qs0_mean),
        W=jnp.zeros((B, N_max, A)),
        N=jnp.zeros((B, N_max, A)),
        Qpi=jnp.zeros((B, N_max, A)).at[:, 0].set(root_Qpi),
        children=jnp.full((B, N_max, A), -1, jnp.int32),
        done=jnp.zeros((B,), bool),
        repeats_done=jnp.zeros((B,), jnp.int32),
        states_explored=jnp.zeros((B,), jnp.int32),
        depth_capped=jnp.zeros((B,), jnp.int32),
    )

    # ---- phase A: habit short-circuit (mcts.py:166-170) -------------------
    if p.use_habit:
        habit_conf = _calc_threshold(root_Qpi)
        habit_done = habit_conf > p.threshold
        habit_action = jax.random.categorical(
            k_habit, jnp.log(root_Qpi + 1e-20), axis=-1
        ).astype(jnp.int32)
    else:
        habit_done = jnp.zeros((B,), bool)
        habit_action = jnp.zeros((B,), jnp.int32)

    # ---- root expand (mcts.py:172) ----------------------------------------
    G_root, ps_next = _expand_G(agent, params, k_root, qs0_mean, p)
    tree = tree.replace(
        W=tree.W.at[:, 0].set(-G_root),
        N=tree.N.at[:, 0].set(1.0),
        children=tree.children.at[:, 0].set(
            jnp.broadcast_to(jnp.arange(1, A + 1, dtype=jnp.int32), (B, A))
        ),
        s=jax.lax.dynamic_update_slice(tree.s, ps_next, (0, 1, 0)),
    )
    return SearchCarry(
        i=jnp.asarray(0, jnp.int32),
        tree=tree,
        done=_phase_b_done(tree, p) | habit_done,
        habit_done=habit_done,
        habit_action=habit_action,
        root_Qpi=root_Qpi,
        k_loop=k_loop,
        k_final=k_final,
    )


def _run_search(
    agent: ActiveInferenceAgent,
    params: Params,
    carry: SearchCarry,
    p: MCTSParams,
    i_end,
    paths_buf: Optional[jax.Array] = None,
    paths_G_buf: Optional[jax.Array] = None,
):
    """Advance the search until iteration ``i_end`` (a dynamic scalar,
    clamped to the repeat budget) or until every env has decided. Returns
    (carry, paths_buf, paths_G_buf)."""
    B, N_max, A = carry.tree.W.shape
    n_iters, _, _ = _budget(p, A)
    use_fused = p.fused_eval and p.use_means
    collect_paths = paths_buf is not None
    k_loop = carry.k_loop
    bidx = jnp.arange(B)
    i_cap = jnp.minimum(jnp.asarray(i_end, jnp.int32), n_iters)

    def loop_cond(carry_):
        # Early exit when every env has decided — the reference's per-env
        # `break` (mcts.py:176-181) as a batched while_loop, so decided
        # batches stop paying expand+simulate cost. `done` rides the carry
        # (computed once per iteration, at the end of the previous one).
        i, tree, _, _, done = carry_
        return jnp.logical_and(i < i_cap, jnp.any(~done))

    def iteration(carry_):
        i, tree, paths_buf, paths_G_buf, done = carry_
        k_i = jax.random.fold_in(k_loop, i)
        k_exp, k_sim, k_sel = jax.random.split(k_i, 3)

        active = ~done

        # select (mcts.py:183).
        nodes, acts, lens, leaf = _select(
            tree, p.C, p.using_prior_for_exploration, p.max_depth,
            deterministic=p.deterministic_selection, key=k_sel,
        )

        # expand leaf (mcts.py:184): slots are deterministic. A walk that
        # hit the max_depth cap returns an *internal* node — expanding it
        # would orphan its subtree and double-count its seed visit, so the
        # expand is a no-op there (the reference has no depth cap; its
        # walks always end at a true leaf, mcts.py:56).
        base = A + 1 + A * i
        leaf_s = tree.s[bidx, leaf]
        if use_fused:
            G_leaf, ps_next, G_sim, Qpi_leaf = _fused_expand_sim(
                agent, params, k_exp, leaf_s, p
            )
        else:
            G_leaf, ps_next = _expand_G(agent, params, k_exp, leaf_s, p)
        child_ids = jnp.broadcast_to(
            base + jnp.arange(A, dtype=jnp.int32), (B, A)
        )
        is_true_leaf = tree.children[bidx, leaf, 0] < 0
        mask = (active & is_true_leaf)[:, None]
        new_W = tree.W.at[bidx, leaf].set(
            jnp.where(mask, tree.W[bidx, leaf] - G_leaf, tree.W[bidx, leaf])
        )
        new_N = tree.N.at[bidx, leaf].set(
            jnp.where(mask, tree.N[bidx, leaf] + 1.0, tree.N[bidx, leaf])
        )
        new_children = tree.children.at[bidx, leaf].set(
            jnp.where(mask, child_ids, tree.children[bidx, leaf])
        )
        old_slots = jax.lax.dynamic_slice(
            tree.s, (0, base, 0), (B, A, tree.s.shape[-1])
        )
        new_s = jax.lax.dynamic_update_slice(
            tree.s,
            jnp.where(mask[:, :, None], ps_next, old_slots),
            (0, base, 0),
        )

        # simulate (mcts.py:185-188): habit rollouts from the leaf,
        # averaged over simulation_repeats (batch-folded). In fused mode
        # this was computed together with the expand above.
        if not use_fused:
            leaf_rep = jnp.repeat(leaf_s, p.simulation_repeats, axis=0)
            G_sim_r, _, Qpi_leaf_r = efe.mcts_step_simulate(
                agent, params, k_sim, leaf_rep, p.simulation_depth,
                use_means=False,
            )
            G_sim = G_sim_r.reshape(B, p.simulation_repeats).mean(-1)
            Qpi_leaf = Qpi_leaf_r.reshape(B, p.simulation_repeats, A)[:, 0]
        new_Qpi = tree.Qpi.at[bidx, leaf].set(
            jnp.where(mask, Qpi_leaf, tree.Qpi[bidx, leaf])
        )

        # backpropagate along [root .. parent-of-leaf] (mcts.py:88-96,189):
        # one masked scatter-add. Padded entries target the pad row N_max-1.
        valid = (nodes >= 0) & active[:, None]
        node_t = jnp.where(valid, nodes, N_max - 1)
        act_t = jnp.where(valid, acts, 0)
        b_t = jnp.broadcast_to(bidx[:, None], nodes.shape)
        dG = jnp.where(valid, -G_sim[:, None], 0.0)
        dN = valid.astype(jnp.float32)
        new_W = new_W.at[b_t, node_t, act_t].add(dG)
        new_N = new_N.at[b_t, node_t, act_t].add(dN)

        tree = _Tree(
            s=new_s,
            W=new_W,
            N=new_N,
            Qpi=new_Qpi,
            children=new_children,
            done=done,
            repeats_done=tree.repeats_done + active.astype(jnp.int32),
            states_explored=tree.states_explored
            + active.astype(jnp.int32)
            * p.simulation_depth
            * p.simulation_repeats,
            depth_capped=tree.depth_capped
            + (active & ~is_true_leaf).astype(jnp.int32),
        )
        if collect_paths:
            paths_buf = paths_buf.at[i].set(
                jnp.where(active[:, None], acts, -1)
            )
            paths_G_buf = paths_G_buf.at[i].set(G_sim)
        return i + 1, tree, paths_buf, paths_G_buf, _phase_b_done(tree, p)

    def iteration_k(carry_):
        """expand_k > 1: k virtual-loss selection walks, ONE k*B-batch G
        evaluation, k seed+backprop scatters. The dN half of backprop is
        applied at select time (the virtual visit) so successive walks
        diverge; the dG half lands after evaluation — an active env's final
        tree state per walk matches the sequential path exactly except that
        walks within an iteration cannot see each other's G results."""
        i, tree, paths_buf, paths_G_buf, done = carry_
        kx = p.expand_k
        k_i = jax.random.fold_in(k_loop, i)
        keys = jax.random.split(k_i, 1 + kx)
        k_eval, k_sels = keys[0], keys[1:]
        active = ~done

        pre_children = tree.children
        walks = []
        for j in range(kx):
            nodes, acts, lens, leaf = _select(
                tree, p.C, p.using_prior_for_exploration, p.max_depth,
                deterministic=p.deterministic_selection, key=k_sels[j],
            )
            valid = (nodes >= 0) & active[:, None]
            node_t = jnp.where(valid, nodes, N_max - 1)
            act_t = jnp.where(valid, acts, 0)
            b_t = jnp.broadcast_to(bidx[:, None], nodes.shape)
            tree = tree.replace(
                N=tree.N.at[b_t, node_t, act_t].add(
                    valid.astype(jnp.float32)
                )
            )
            walks.append((acts, leaf, valid, node_t, act_t, b_t))

        leaves = jnp.stack([w[1] for w in walks])  # (k, B)
        leaf_s_all = tree.s[bidx[None], leaves].reshape(kx * B, -1)
        if use_fused:
            G_leaf_a, ps_next_a, G_sim_a, Qpi_a = _fused_expand_sim(
                agent, params, k_eval, leaf_s_all, p
            )
        else:
            k_exp, k_sim = jax.random.split(k_eval)
            G_leaf_a, ps_next_a = _expand_G(
                agent, params, k_exp, leaf_s_all, p
            )
            leaf_rep = jnp.repeat(leaf_s_all, p.simulation_repeats, axis=0)
            G_sim_r, _, Qpi_r = efe.mcts_step_simulate(
                agent, params, k_sim, leaf_rep, p.simulation_depth,
                use_means=False,
            )
            G_sim_a = G_sim_r.reshape(kx * B, p.simulation_repeats).mean(-1)
            Qpi_a = Qpi_r.reshape(kx * B, p.simulation_repeats, A)[:, 0]
        G_leaf_a = G_leaf_a.reshape(kx, B, A)
        ps_next_a = ps_next_a.reshape(kx, B, A, -1)
        G_sim_a = G_sim_a.reshape(kx, B)
        Qpi_a = Qpi_a.reshape(kx, B, A)

        new_W, new_N = tree.W, tree.N
        new_children, new_Qpi, new_s = tree.children, tree.Qpi, tree.s
        capped = jnp.zeros((B,), jnp.int32)
        for j in range(kx):
            acts, leaf, valid, node_t, act_t, b_t = walks[j]
            dup = jnp.zeros((B,), bool)
            for jj in range(j):  # same leaf picked twice: expand once
                dup = dup | (walks[jj][1] == leaf)
            is_true_leaf = pre_children[bidx, leaf, 0] < 0
            mask = (active & is_true_leaf & ~dup)[:, None]
            base = A + 1 + A * (i * kx + j)
            child_ids = jnp.broadcast_to(
                base + jnp.arange(A, dtype=jnp.int32), (B, A)
            )
            new_W = new_W.at[bidx, leaf].set(
                jnp.where(
                    mask, new_W[bidx, leaf] - G_leaf_a[j], new_W[bidx, leaf]
                )
            )
            new_N = new_N.at[bidx, leaf].set(
                jnp.where(mask, new_N[bidx, leaf] + 1.0, new_N[bidx, leaf])
            )
            new_children = new_children.at[bidx, leaf].set(
                jnp.where(mask, child_ids, new_children[bidx, leaf])
            )
            new_Qpi = new_Qpi.at[bidx, leaf].set(
                jnp.where(mask, Qpi_a[j], new_Qpi[bidx, leaf])
            )
            old_slots = jax.lax.dynamic_slice(
                new_s, (0, base, 0), (B, A, new_s.shape[-1])
            )
            new_s = jax.lax.dynamic_update_slice(
                new_s,
                jnp.where(mask[:, :, None], ps_next_a[j], old_slots),
                (0, base, 0),
            )
            # dG half of backprop (dN was the virtual visit above).
            new_W = new_W.at[b_t, node_t, act_t].add(
                jnp.where(valid, -G_sim_a[j][:, None], 0.0)
            )
            capped = capped + (active & ~is_true_leaf).astype(jnp.int32)
            if collect_paths:
                paths_buf = paths_buf.at[i * kx + j].set(
                    jnp.where(active[:, None], acts, -1)
                )
                paths_G_buf = paths_G_buf.at[i * kx + j].set(G_sim_a[j])

        tree = _Tree(
            s=new_s, W=new_W, N=new_N, Qpi=new_Qpi, children=new_children,
            done=done,
            repeats_done=tree.repeats_done + kx * active.astype(jnp.int32),
            states_explored=tree.states_explored
            + kx
            * active.astype(jnp.int32)
            * p.simulation_depth
            * p.simulation_repeats,
            depth_capped=tree.depth_capped + capped,
        )
        return i + 1, tree, paths_buf, paths_G_buf, _phase_b_done(tree, p)

    i, tree, paths_buf, paths_G_buf, done = jax.lax.while_loop(
        loop_cond,
        iteration_k if p.expand_k > 1 else iteration,
        (carry.i, carry.tree, paths_buf, paths_G_buf, carry.done),
    )
    # Envs whose threshold crossed on what would have been the next
    # iteration are already decided; finalize the done flags so
    # repeats_done matches the reference's per-env break point.
    carry = carry.replace(i=i, tree=tree.replace(done=done), done=done)
    return carry, paths_buf, paths_G_buf


def _finalize_search(
    agent: ActiveInferenceAgent, carry: SearchCarry, p: MCTSParams
) -> MCTSResult:
    """Final visit-count action path + trim (phase C, mcts.py:193-195),
    with phase-A overrides (single habit action, zero search)."""
    tree = carry.tree
    A = agent.pi_dim
    actions, lengths = _action_selection(
        tree, p.max_depth, A,
        deterministic=p.deterministic_action, key=carry.k_final,
    )
    repeats_done = tree.repeats_done
    states_explored = tree.states_explored
    if p.use_habit:
        actions = jnp.where(
            carry.habit_done[:, None],
            jnp.full_like(actions, -1).at[:, 0].set(carry.habit_action),
            actions,
        )
        lengths = jnp.where(carry.habit_done, 1, lengths)
        repeats_done = jnp.where(carry.habit_done, 0, repeats_done)
        states_explored = jnp.where(carry.habit_done, 0, states_explored)
    return MCTSResult(
        actions=actions,
        lengths=lengths,
        repeats_done=repeats_done,
        states_explored=states_explored,
        depth_capped=tree.depth_capped,
        root_N=tree.N[:, 0],
        root_Qpi=carry.root_Qpi,
        all_paths=None,
        all_paths_G=None,
        tree=None,
    )


def active_inference_mcts(
    agent: ActiveInferenceAgent,
    params: Params,
    key: jax.Array,
    frames: jax.Array,
    p: MCTSParams,
    collect_paths: bool = False,
    return_tree: bool = False,
) -> MCTSResult:
    """Batched planner entry point (mcts.py:150-195).

    Args:
      frames: (B, H, W, C) current observations.
      collect_paths: also return per-iteration selection paths + G (the
        demo's visit-density mask input; memory ~R*B*max_depth).
      return_tree: also return the final tree arrays (tests/debugging).
    """
    B = frames.shape[0]
    A = agent.pi_dim
    n_iters, n_expansions, _ = _budget(p, A)
    carry = _init_search(agent, params, key, frames, p)
    paths_buf = (
        jnp.full((n_expansions, B, p.max_depth), -1, jnp.int32)
        if collect_paths
        else None
    )
    paths_G_buf = jnp.zeros((n_expansions, B)) if collect_paths else None
    carry, paths_buf, paths_G_buf = _run_search(
        agent, params, carry, p, n_iters, paths_buf, paths_G_buf
    )
    res = _finalize_search(agent, carry, p)
    tree_out = None
    if return_tree:
        tree_out = carry.tree.replace(
            repeats_done=res.repeats_done,
            states_explored=res.states_explored,
        )
    return res._replace(
        all_paths=paths_buf, all_paths_G=paths_G_buf, tree=tree_out
    )


def _gather_carry(carry: SearchCarry, idx: jax.Array) -> SearchCarry:
    """Re-pack per-env search state onto the rows in ``idx`` (compaction)."""
    return carry.replace(
        tree=jax.tree.map(lambda x: x[idx], carry.tree),
        done=carry.done[idx],
        habit_done=carry.habit_done[idx],
        habit_action=carry.habit_action[idx],
        root_Qpi=carry.root_Qpi[idx],
    )


def make_bucketed_planner(
    agent: ActiveInferenceAgent,
    p: MCTSParams,
    check_every: int = 16,
    min_bucket: int = 32,
):
    """Host-driven planner with batch compaction — the deployed fast path.

    The jitted planner's batched while_loop runs until the SLOWEST env in
    the batch decides; with a trained habit prior most envs phase-B-exit in
    a fraction of the repeat budget (measured: avg 102/300 expansions at
    B=256), but the tail envs keep the full batch paying masked G-network
    compute. This driver pauses the search every ``check_every``
    iterations, retires decided envs (their trees are frozen — finalizing
    early is exact), and gathers the stragglers into the smallest
    power-of-two bucket ≥ max(active, ``min_bucket``). Iteration cost then
    tracks the *active* env count instead of the original batch size.

    Per-env search semantics are identical to ``active_inference_mcts``
    (same tree updates, same fold_in(k_loop, i) key sequence); only the
    batch row layout of the MC noise differs after a compaction (like
    ``fused_eval``, the estimator's distribution is unchanged). With no
    compaction triggered (e.g. B == min_bucket) results are bitwise equal
    to the plain planner.

    Each distinct bucket size JIT-compiles its own executable (ladder of
    ≤ log2(B/min_bucket) sizes, cached persistently via utils/compcache).
    ``collect_paths``/``return_tree`` are not supported.

    Measured (TPU v5e via the axon tunnel, trained epoch-1136 prior,
    reference budget repeats=300 fused bf16): B=256 97-102 plans/s vs 80
    plain (1.25x); B=1024 107 vs 75 (1.43x — the tunnel's ~50ms/chunk RTT
    amortizes over more envs). Ideal-compute ceiling from the measured
    active-env decay and per-iteration costs is ~2.1x plain; the gap is
    pure host-tunnel round-trip latency (scripts/mcts_bucketed_bench.py,
    docs/STATUS.md round-3 notes), which a locally-attached TPU would not
    pay.

    Returns ``plan(params, key, frames) -> MCTSResult``.
    """
    import numpy as np

    n_iters, _, _ = _budget(p, agent.pi_dim)

    @jax.jit
    def init_j(params, key, frames):
        return _init_search(agent, params, key, frames, p)

    @jax.jit
    def run_j(params, carry, i_end):
        carry, _, _ = _run_search(agent, params, carry, p, i_end)
        return carry

    @jax.jit
    def fin_j(carry):
        return _finalize_search(agent, carry, p)

    @jax.jit
    def gather_j(carry, idx):
        return _gather_carry(carry, idx)

    out_fields = (
        "actions", "lengths", "repeats_done", "states_explored",
        "depth_capped", "root_N", "root_Qpi",
    )

    # Check cadence is ADAPTIVE WITHIN one call and stateless ACROSS calls.
    # (A previous design memoized the first call's compaction iterations
    # and re-checked only there on later calls; when the warmup key's
    # searches decided on a different profile than the timed keys' — e.g.
    # the distilled prior's flatter root visits — later calls could skip
    # every useful compaction point and run the full budget at full width,
    # which is how BENCH_r04's B=256 point regressed to half the PLAIN
    # planner's rate. Adaptivity must not leak across calls.)
    # Within a call: check every `check_every` iterations; after 2
    # consecutive checks with no compaction, double the stride (the done
    # mask is growing slowly — checking costs a host round trip), and reset
    # it to `check_every` whenever a compaction fires.

    def plan(params, key, frames) -> MCTSResult:
        B0 = frames.shape[0]
        A = agent.pi_dim
        plan.bucket_trace = [B0]  # bucket sizes this call (diagnostics)
        gidx = np.arange(B0)  # bucket row -> original env row (-1 = pad)
        recorded = []
        at_floor = B0 <= min_bucket
        stride = check_every
        dry = 0  # consecutive no-compaction checks at the current stride

        def next_stop(i):
            # Once the bucket is at min_bucket no further compaction is
            # possible: run the whole remaining budget as ONE chunk (the
            # device-side while_loop still exits early when every env
            # decides) instead of paying per-chunk overhead for nothing.
            if at_floor:
                return n_iters
            return min(i + stride, n_iters)
        out = {
            "actions": np.full((B0, p.max_depth), -1, np.int32),
            "lengths": np.zeros((B0,), np.int32),
            "repeats_done": np.zeros((B0,), np.int32),
            "states_explored": np.zeros((B0,), np.int32),
            "depth_capped": np.zeros((B0,), np.int32),
            "root_N": np.zeros((B0, A), np.float32),
            "root_Qpi": np.zeros((B0, A), np.float32),
        }

        # Pipelined driver: the next chunk is enqueued BEFORE syncing on the
        # previous one's done mask, so the (axon-tunnel-expensive) host
        # round trip overlaps device compute and the device queue never
        # starves. Retirement decisions therefore run one chunk stale —
        # always valid, since ``done`` only grows and a done env's tree is
        # frozen (finalizing it any number of chunks later is exact). All
        # result fetches are deferred to a single drain at the end.
        stash = []  # (device MCTSResult, bucket rows, original env rows)
        i_host = next_stop(0)
        pending = run_j(params, init_j(params, key, frames),
                        jnp.asarray(i_host, jnp.int32))
        # Enqueue the D2H copy of the done mask BEFORE the next chunk's
        # dispatch enters the (FIFO) device queue, so reading it later
        # doesn't serialize behind that chunk's compute.
        pending.done.copy_to_host_async()
        while True:
            if i_host < n_iters:
                i_next = next_stop(i_host)
                nxt = run_j(params, pending, jnp.asarray(i_next, jnp.int32))
            else:
                nxt, i_next = None, i_host
            done = np.asarray(pending.done)  # blocks on `pending` only
            if nxt is None or done.all():
                # Budget exhausted, or everything decided (any enqueued
                # ``nxt`` was a no-op pass: its while_loop cond is false).
                final = nxt if nxt is not None else pending
                stash.append((fin_j(final), np.arange(done.shape[0]), gidx))
                break
            cur_B = done.shape[0]
            n_active = int((~done).sum())
            new_B = cur_B
            while new_B // 2 >= max(min_bucket, n_active):
                new_B //= 2
            if new_B == cur_B:
                dry += 1
                if dry >= 2:
                    stride = min(stride * 2, n_iters)
                    dry = 0
            else:
                stride = check_every
                dry = 0
            if new_B < cur_B:
                # Retire the envs known done as of `pending` (frozen since),
                # reading their final results from `nxt`'s tree state.
                rows = np.where(done)[0]
                stash.append((fin_j(nxt), rows, gidx))
                keep = np.where(~done)[0]
                pad = new_B - keep.shape[0]
                idx = np.concatenate([keep, np.full(pad, keep[0], np.int64)])
                nxt = gather_j(nxt, jnp.asarray(idx, jnp.int32))
                if pad:
                    pad_done = np.zeros(new_B, bool)
                    pad_done[keep.shape[0]:] = True
                    nxt = nxt.replace(done=nxt.done | jnp.asarray(pad_done))
                gidx = np.concatenate(
                    [gidx[keep], np.full(pad, -1, np.int64)]
                )
                plan.bucket_trace.append(new_B)
                recorded.append(i_host)
                if new_B <= min_bucket:
                    at_floor = True
            pending, i_host = nxt, i_next
            # Next loop reads pending.done: enqueue its D2H copy now, ahead
            # of the next chunk's dispatch in the FIFO queue.
            pending.done.copy_to_host_async()

        plan.schedule = recorded  # this call's compaction iterations

        for res, rows, gmap in stash:
            dst = gmap[rows]
            ok = dst >= 0
            rows_ok, dst = rows[ok], dst[ok]
            if rows_ok.size == 0:
                continue
            for name in out_fields:
                out[name][dst] = np.asarray(getattr(res, name))[rows_ok]

        return MCTSResult(
            actions=jnp.asarray(out["actions"]),
            lengths=jnp.asarray(out["lengths"]),
            repeats_done=jnp.asarray(out["repeats_done"]),
            states_explored=jnp.asarray(out["states_explored"]),
            depth_capped=jnp.asarray(out["depth_capped"]),
            root_N=jnp.asarray(out["root_N"]),
            root_Qpi=jnp.asarray(out["root_Qpi"]),
            all_paths=None,
            all_paths_G=None,
            tree=None,
        )

    return plan


def make_jit_planner(
    agent: ActiveInferenceAgent, p: MCTSParams, collect_paths: bool = False
):
    """Compile the planner once for a given (agent, params-structure)."""
    return jax.jit(
        functools.partial(
            active_inference_mcts, agent, p=p, collect_paths=collect_paths
        )
    )
