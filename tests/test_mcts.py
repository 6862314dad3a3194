"""MCTS planner tests.

The core test validates the array-based batched planner against a direct
pointer-tree implementation of the reference semantics
(/root/reference/src/mcts.py) on identical *deterministic mock* model
functions — same selection walks, expansion seeding, backpropagation and
final trimmed action path.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deep_active_inference_mc_tpu.plan import mcts as amcts
from deep_active_inference_mc_tpu.plan.mcts import MCTSParams

pytestmark = pytest.mark.smoke  # pre-commit tier: `pytest -m smoke`

S_DIM = 6
A = 4

# Deterministic mock dynamics: G depends on state+action; next state drifts.
W_G = np.linspace(-0.5, 0.8, S_DIM).astype(np.float32)
C_A = np.asarray([0.3, -0.2, 0.05, -0.4], np.float32)
D_A = (np.arange(A * S_DIM).reshape(A, S_DIM).astype(np.float32) / (A * S_DIM) - 0.4)


def mock_G_np(s, a):
    return float(np.dot(s, W_G) + C_A[a])


def mock_next_np(s, a):
    return s * 0.9 + D_A[a]


def mock_sim_np(s):
    return float(np.sum(s) * 0.7)


def mock_qpi_np(s):
    e = np.exp(s[:A] - s[:A].max())
    return e / e.sum()


# ---- jax mocks plugged into the array planner ---------------------------


def mock_calculate_G_mean(agent, params, key, s0, pi0):
    G = s0 @ jnp.asarray(W_G) + pi0 @ jnp.asarray(C_A)
    ps_next = s0 * 0.9 + pi0 @ jnp.asarray(D_A)
    return G, None, ps_next, None


def mock_step_simulate(agent, params, key, leaf_s, depth, use_means=False):
    G = jnp.sum(leaf_s, -1) * 0.7
    e = jnp.exp(leaf_s[:, :A] - leaf_s[:, :A].max(-1, keepdims=True))
    qpi = e / e.sum(-1, keepdims=True)
    return G, None, qpi


class MockAgent:
    pi_dim = A
    pi_one_hot = jnp.eye(A)

    def encode(self, params, frames):
        # "frames" are already states in the mock.
        return frames, None

    def habit(self, params, s):
        e = jnp.exp(s[:, :A] - s[:, :A].max(-1, keepdims=True))
        q = e / e.sum(-1, keepdims=True)
        return None, q, jnp.log(q + 1e-20)


# ---- pointer-tree implementation of the reference algorithm --------------


class RefNode:
    def __init__(self, s, C, use_prior):
        self.s = s
        self.W = np.zeros(A)
        self.N = np.zeros(A)
        self.Qpi = np.zeros(A)
        self.children = [None] * A
        self.C = C
        self.use_prior = use_prior
        self.in_progress = -1

    def probs(self):
        Q = self.W / self.N
        Q = Q - Q.min()
        Q = Q / Q.sum()
        if self.use_prior:
            return Q + self.C * self.Qpi / self.N
        return Q + self.C / self.N

    def expand(self):
        G = np.asarray([mock_G_np(self.s, a) for a in range(A)])
        self.W -= G
        self.N += 1.0
        for a in range(A):
            self.children[a] = RefNode(
                mock_next_np(self.s, a), self.C, self.use_prior
            )


def ref_mcts(s_root, repeats, threshold, C=1.0, use_prior=False):
    root = RefNode(np.asarray(s_root, np.float64), C, use_prior)
    root.Qpi = mock_qpi_np(root.s)
    root.expand()
    repeats_done = repeats
    for rep in range(repeats):
        Nn = root.N / root.N.sum()
        if Nn.max() - Nn.mean() > threshold:
            repeats_done = rep
            break
        # select
        path = []
        node = root
        node.in_progress = int(np.argmax(node.probs()))
        path.append((node, node.in_progress))
        node = node.children[node.in_progress]
        while None not in node.children:
            node.in_progress = int(np.argmax(node.probs()))
            path.append((node, node.in_progress))
            node = node.children[node.in_progress]
        leaf = node
        leaf.expand()
        G_sim = mock_sim_np(leaf.s)
        leaf.Qpi = mock_qpi_np(leaf.s)
        for n, a in path:
            n.W[a] -= G_sim
            n.N[a] += 1
    # action selection
    path = []
    node = root
    while None not in node.children:
        a = int(np.argmax(node.N))
        path.append(a)
        node = node.children[a]
    # trim
    trimmed, i = [], 0
    while i < len(path) - 1:
        pair = (path[i], path[i + 1])
        if pair in [(0, 1), (1, 0), (2, 3), (3, 2)]:
            i += 2
        else:
            trimmed.append(path[i])
            i += 1
    return trimmed, repeats_done, root.N


@pytest.mark.parametrize("use_prior", [False, True])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_array_mcts_matches_reference_tree(monkeypatch, use_prior, seed):
    monkeypatch.setattr(amcts.efe, "calculate_G_mean", mock_calculate_G_mean)
    monkeypatch.setattr(amcts.efe, "mcts_step_simulate", mock_step_simulate)

    rng = np.random.RandomState(seed)
    roots = rng.randn(3, S_DIM).astype(np.float32) * 0.5
    p = MCTSParams(
        repeats=12, threshold=0.2, use_means=True, max_depth=16,
        using_prior_for_exploration=use_prior,
    )
    res = amcts.active_inference_mcts(
        MockAgent(), {}, jax.random.key(0), jnp.asarray(roots), p
    )
    for b in range(3):
        ref_path, ref_reps, ref_rootN = ref_mcts(
            roots[b], p.repeats, p.threshold, p.C, use_prior
        )
        got_len = int(res.lengths[b])
        got_path = list(np.asarray(res.actions[b][:got_len]))
        assert got_path == ref_path, (b, got_path, ref_path)
        assert int(res.repeats_done[b]) == ref_reps, (b, res.repeats_done[b], ref_reps)
        np.testing.assert_allclose(
            np.asarray(res.root_N[b]), ref_rootN, rtol=1e-4
        )


def test_trim_path_semantics():
    path = jnp.asarray([[0, 1, 2, 2, 3, -1, -1, -1]], jnp.int32)
    out, n = amcts._trim_path(path, jnp.asarray([5]), 4, 8)
    # (0,1) trimmed; 2 kept; (2,3) trimmed -> [2]; last action only consumed
    # as pair-half (reference's while i < len-1 bound).
    assert int(n[0]) == 1
    assert list(np.asarray(out[0][:1])) == [2]

    path = jnp.asarray([[2, 3, 3, 2, 0, 0, -1, -1]], jnp.int32)
    out, n = amcts._trim_path(path, jnp.asarray([6]), 4, 8)
    # (2,3) pair, (3,2) pair, then 0 kept, last 0 dropped by the bound.
    assert int(n[0]) == 1
    assert list(np.asarray(out[0][:1])) == [0]

    path = jnp.asarray([[1, -1, -1, -1, -1, -1, -1, -1]], jnp.int32)
    out, n = amcts._trim_path(path, jnp.asarray([1]), 4, 8)
    assert int(n[0]) == 0  # single action yields empty plan (reference quirk)


def test_phase_a_habit_shortcircuit(monkeypatch):
    monkeypatch.setattr(amcts.efe, "calculate_G_mean", mock_calculate_G_mean)
    monkeypatch.setattr(amcts.efe, "mcts_step_simulate", mock_step_simulate)
    # A root state whose habit dist is extremely peaked on action 2.
    root = np.zeros((1, S_DIM), np.float32)
    root[0, 2] = 25.0
    p = MCTSParams(repeats=6, threshold=0.5, use_habit=True, max_depth=8)
    res = amcts.active_inference_mcts(
        MockAgent(), {}, jax.random.key(3), jnp.asarray(root), p
    )
    assert int(res.lengths[0]) == 1
    assert int(res.actions[0, 0]) == 2
    assert int(res.repeats_done[0]) == 0
    assert int(res.states_explored[0]) == 0


def test_max_depth_cap_is_noop_expand(monkeypatch):
    """A selection walk that hits the max_depth cap returns an *internal*
    node; expanding it must be a no-op (no children overwrite, no extra
    seed visit) — regression for the re-expansion hazard. The reference has
    no depth cap (mcts.py:49-62), so the only correct capped behavior is
    'leave the subtree alone'."""
    # State-independent dynamics that make the argmax walk a pure action-0
    # chain: action 0 has much lower G (higher -G seed) and the exploration
    # constant is tiny, so the chain deepens by one node per iteration.
    def g_mean(agent, params, key, s0, pi0):
        G = pi0 @ jnp.asarray([-1.0, 0.2, 0.3, 0.4])
        return G, None, s0 * 0.9, None

    def sim(agent, params, key, leaf_s, depth, use_means=False):
        B = leaf_s.shape[0]
        return jnp.zeros((B,)), None, jnp.full((B, A), 0.25)

    monkeypatch.setattr(amcts.efe, "calculate_G_mean", g_mean)
    monkeypatch.setattr(amcts.efe, "mcts_step_simulate", sim)

    repeats, max_depth = 8, 3
    p = MCTSParams(
        repeats=repeats, threshold=1.1, C=0.01, max_depth=max_depth
    )
    res = amcts.active_inference_mcts(
        MockAgent(), {}, jax.random.key(0), jnp.zeros((1, S_DIM)), p,
        return_tree=True,
    )
    tree = res.tree
    # Chain of slots along action 0: root=0 -> 1 -> 5 -> 9; node 9 is first
    # expanded at iteration 2 and is the capped walk's endpoint afterwards.
    node9_children = np.asarray(tree.children[0, 9])
    assert list(node9_children) == [13, 14, 15, 16], node9_children
    # Node 9 keeps exactly its seed visit (N=1 per edge): iterations 3..7
    # must not re-seed it (old bug: +1 per capped iteration).
    np.testing.assert_allclose(np.asarray(tree.N[0, 9]), np.ones(A))
    # Backprop still credits the capped walks along the real path:
    # root action 0 gets seed 1 + one visit per iteration.
    assert float(tree.N[0, 0, 0]) == 1 + repeats
    # node 5 (depth 2) is a path node from iteration 2 onward.
    assert float(tree.N[0, 5, 0]) == 1 + (repeats - 2)


def test_early_exit_matches_reference_when_all_decide_early(monkeypatch):
    """The while_loop early exit (batched phase-B break) must leave results
    identical to the reference per-env break semantics."""
    monkeypatch.setattr(amcts.efe, "calculate_G_mean", mock_calculate_G_mean)
    monkeypatch.setattr(amcts.efe, "mcts_step_simulate", mock_step_simulate)
    rng = np.random.RandomState(7)
    roots = rng.randn(4, S_DIM).astype(np.float32) * 0.5
    p = MCTSParams(repeats=50, threshold=0.05, max_depth=16)
    res = amcts.active_inference_mcts(
        MockAgent(), {}, jax.random.key(0), jnp.asarray(roots), p
    )
    for b in range(4):
        ref_path, ref_reps, ref_rootN = ref_mcts(
            roots[b], p.repeats, p.threshold, p.C, False
        )
        got_len = int(res.lengths[b])
        assert list(np.asarray(res.actions[b][:got_len])) == ref_path
        assert int(res.repeats_done[b]) == ref_reps
        np.testing.assert_allclose(np.asarray(res.root_N[b]), ref_rootN, rtol=1e-4)
    # All envs decided well before the repeat budget: the loop exited early.
    assert int(np.max(np.asarray(res.repeats_done))) < p.repeats


@pytest.mark.slow
def test_stochastic_selection_modes(monkeypatch):
    """deterministic=False walks (reference mcts.py:53,58,101,106): sampled
    selection/action walks run and the final action is drawn from the root
    visit distribution rather than argmax."""
    monkeypatch.setattr(amcts.efe, "calculate_G_mean", mock_calculate_G_mean)
    monkeypatch.setattr(amcts.efe, "mcts_step_simulate", mock_step_simulate)
    roots = np.random.RandomState(1).randn(2, S_DIM).astype(np.float32) * 0.5
    p = MCTSParams(
        repeats=10, threshold=1.1, max_depth=16,
        deterministic_selection=False, deterministic_action=False,
    )
    first_actions = []
    for seed in range(24):
        res = amcts.active_inference_mcts(
            MockAgent(), {}, jax.random.key(seed), jnp.asarray(roots), p
        )
        acts = np.asarray(res.actions)
        lens = np.asarray(res.lengths)
        assert np.all(acts[acts >= 0] < A)
        if lens[0] > 0:
            first_actions.append(int(acts[0, 0]))
    # Sampling over visit counts: more than one distinct first action
    # across seeds (argmax would be constant).
    assert len(set(first_actions)) > 1, first_actions


@pytest.mark.slow
def test_real_agent_end_to_end_planner():
    """The planner must run with the real agent nets under jit."""
    from deep_active_inference_mc_tpu.infer.agent import ActiveInferenceAgent

    agent = ActiveInferenceAgent(s_dim=10, pi_dim=4)
    params = agent.init(jax.random.key(0))
    frames = jax.random.uniform(jax.random.key(1), (2, 64, 64, 1))
    p = MCTSParams(repeats=5, simulation_depth=2, max_depth=8)
    planner = amcts.make_jit_planner(agent, p, collect_paths=True)
    res = planner(params, jax.random.key(2), frames)
    assert res.actions.shape == (2, 8)
    assert res.all_paths.shape == (5, 2, 8)
    assert res.all_paths_G.shape == (5, 2)
    assert np.all(np.asarray(res.lengths) >= 0)
    assert np.all(np.asarray(res.root_N).sum(-1) >= 4)


@pytest.mark.slow
def test_fused_eval_statistics_match_unfused():
    """The fused mega-batched expand+simulate evaluator computes the same
    estimators as _expand_G + efe.mcts_step_simulate: over many keys the MC
    means of G_leaf and G_sim must agree within combined standard error
    (the RNG row layout differs, the distribution must not)."""
    from deep_active_inference_mc_tpu.infer import efe
    from deep_active_inference_mc_tpu.infer.agent import ActiveInferenceAgent

    agent = ActiveInferenceAgent(s_dim=10, pi_dim=4)
    params = agent.init(jax.random.key(0))
    B = 4
    leaf_s = jax.random.normal(jax.random.key(1), (B, 10)) * 0.5
    p = MCTSParams(simulation_depth=3, simulation_repeats=1, use_means=True)
    n_keys = 24

    @jax.jit
    def one_fused(k):
        G_leaf, ps_next, G_sim, Qpi = amcts._fused_expand_sim(
            agent, params, k, leaf_s, p
        )
        return G_leaf, G_sim, ps_next, Qpi

    @jax.jit
    def one_unfused(k):
        k_exp, k_sim = jax.random.split(k)
        G_leaf, ps_next = amcts._expand_G(agent, params, k_exp, leaf_s, p)
        G_sim, _, Qpi = efe.mcts_step_simulate(
            agent, params, k_sim, leaf_s, p.simulation_depth, use_means=False
        )
        return G_leaf, G_sim, ps_next, Qpi

    Gf, Sf, Pf, Qf = [], [], [], []
    Gu, Su, Pu, Qu = [], [], [], []
    for i in range(n_keys):
        a = one_fused(jax.random.key(100 + i))
        b = one_unfused(jax.random.key(500 + i))
        Gf.append(np.asarray(a[0])); Sf.append(np.asarray(a[1]))
        Pf.append(np.asarray(a[2])); Qf.append(np.asarray(a[3]))
        Gu.append(np.asarray(b[0])); Su.append(np.asarray(b[1]))
        Pu.append(np.asarray(b[2])); Qu.append(np.asarray(b[3]))

    def close_in_sem(xs, ys, z=5.0):
        xs, ys = np.stack(xs), np.stack(ys)
        mx, my = xs.mean(0), ys.mean(0)
        sem = np.sqrt(xs.var(0) / len(xs) + ys.var(0) / len(ys)) + 1e-6
        assert np.all(np.abs(mx - my) < z * sem + 1e-3 * np.abs(my)), (
            np.abs(mx - my).max(), (z * sem).max()
        )

    close_in_sem(Gf, Gu)  # expand G per (b, a)
    close_in_sem(Sf, Su)  # simulation G
    close_in_sem(Pf, Pu)  # children states (transition means)
    close_in_sem(Qf, Qu)  # leaf habit prior


@pytest.mark.slow
def test_fused_planner_end_to_end():
    """fused_eval planner: runs under jit, counts depth-cap binds, and
    produces a sane tree (root fully seeded, paths well-formed)."""
    from deep_active_inference_mc_tpu.infer.agent import ActiveInferenceAgent

    agent = ActiveInferenceAgent(s_dim=10, pi_dim=4)
    params = agent.init(jax.random.key(0))
    frames = jax.random.uniform(jax.random.key(1), (2, 64, 64, 1))
    p = MCTSParams(repeats=5, simulation_depth=2, max_depth=8, fused_eval=True)
    planner = amcts.make_jit_planner(agent, p)
    res = planner(params, jax.random.key(2), frames)
    assert res.actions.shape == (2, 8)
    assert np.all(np.asarray(res.root_N).sum(-1) >= 4)
    assert np.all(np.asarray(res.depth_capped) >= 0)
    assert np.all(np.asarray(res.depth_capped) <= np.asarray(res.repeats_done))
    assert np.all(np.isfinite(np.asarray(res.root_Qpi)))


@pytest.mark.parametrize("seed", [0, 1])
def test_expand_k_virtual_loss_mechanics(monkeypatch, seed):
    """expand_k>1 (virtual-loss parallel expansion): bookkeeping invariants
    hold — every walk contributes exactly one visit along its path, the
    expansion budget matches ceil(repeats/k)*k, and on the deterministic
    mock landscape the chosen root action agrees with the sequential
    (expand_k=1) search."""
    monkeypatch.setattr(amcts.efe, "calculate_G_mean", mock_calculate_G_mean)
    monkeypatch.setattr(amcts.efe, "mcts_step_simulate", mock_step_simulate)

    rng = np.random.RandomState(seed)
    roots = rng.randn(3, S_DIM).astype(np.float32) * 0.5
    base = dict(repeats=12, threshold=10.0, use_means=True, max_depth=16)
    p1 = MCTSParams(**base, expand_k=1)
    p4 = MCTSParams(**base, expand_k=4)
    res1 = amcts.active_inference_mcts(
        MockAgent(), {}, jax.random.key(0), jnp.asarray(roots), p1
    )
    res4 = amcts.active_inference_mcts(
        MockAgent(), {}, jax.random.key(0), jnp.asarray(roots), p4,
        return_tree=True,
    )
    # threshold=10 -> no phase-B exit: full budget spent in both.
    assert np.all(np.asarray(res1.repeats_done) == 12)
    assert np.all(np.asarray(res4.repeats_done) == 12)
    # Root visits: A seed visits + one per walk (12), minus nothing (no caps
    # at this depth/budget).
    assert np.all(np.asarray(res4.depth_capped) == 0)
    np.testing.assert_allclose(
        np.asarray(res4.root_N).sum(-1), A + 12, rtol=1e-5
    )
    # Deterministic easy landscape: both searches pick the same root action.
    a1 = np.argmax(np.asarray(res1.root_N), axis=-1)
    a4 = np.argmax(np.asarray(res4.root_N), axis=-1)
    np.testing.assert_array_equal(a1, a4)
    # Tree sanity: every expanded node's children ids are in range.
    ch = np.asarray(res4.tree.children)
    assert ch.max() < ch.shape[1]


@pytest.mark.slow
def test_expand_k_real_agent_fused():
    """expand_k + fused_eval on the real nets under jit."""
    from deep_active_inference_mc_tpu.infer.agent import ActiveInferenceAgent

    agent = ActiveInferenceAgent(s_dim=10, pi_dim=4)
    params = agent.init(jax.random.key(0))
    frames = jax.random.uniform(jax.random.key(1), (2, 64, 64, 1))
    p = MCTSParams(repeats=8, simulation_depth=2, max_depth=8,
                   fused_eval=True, expand_k=4)
    res = amcts.make_jit_planner(agent, p)(params, jax.random.key(2), frames)
    assert res.actions.shape == (2, 8)
    assert np.all(np.asarray(res.root_N).sum(-1) >= 4)
    assert np.all(np.isfinite(np.asarray(res.all_paths_G))) if res.all_paths_G is not None else True


@pytest.mark.slow
def test_crn_expand_planner_end_to_end():
    """CRN expansion (MCTSParams.crn): runs under jit with the real nets;
    per-column parity with the single-action estimator; fused+crn rejected."""
    from deep_active_inference_mc_tpu.infer import efe
    from deep_active_inference_mc_tpu.infer.agent import ActiveInferenceAgent

    agent = ActiveInferenceAgent(s_dim=10, pi_dim=4)
    params = agent.init(jax.random.key(0))

    # Column parity: _expand_G with crn equals calculate_G_mean per action
    # under the shared key.
    s = jax.random.normal(jax.random.key(3), (3, 10))
    key = jax.random.key(4)
    p_crn = MCTSParams(repeats=4, simulation_depth=2, max_depth=8, crn=True)
    G_crn, ps_crn = amcts._expand_G(agent, params, key, s, p_crn)
    for a in range(4):
        pi = jnp.tile(jnp.eye(4)[a], (3, 1))
        G_a, _, ps_a, _ = efe.calculate_G_mean(agent, params, key, s, pi)
        np.testing.assert_allclose(
            np.asarray(G_crn[:, a]), np.asarray(G_a), rtol=3e-5, atol=3e-5
        )
        np.testing.assert_allclose(
            np.asarray(ps_crn[:, a]), np.asarray(ps_a), rtol=3e-5, atol=3e-5
        )

    frames = jax.random.uniform(jax.random.key(1), (2, 64, 64, 1))
    planner = amcts.make_jit_planner(agent, p_crn)
    res = planner(params, jax.random.key(2), frames)
    assert res.actions.shape == (2, 8)
    assert np.all(np.asarray(res.root_N).sum(-1) >= 4)

    with pytest.raises(ValueError, match="unfused"):
        amcts.active_inference_mcts(
            agent, params, jax.random.key(5), frames,
            MCTSParams(repeats=4, crn=True, fused_eval=True),
        )
