"""Bucketed (batch-compaction) planner tests.

``make_bucketed_planner`` pauses the search at iteration boundaries,
retires decided envs and re-packs the stragglers into smaller buckets. On
the *deterministic mock* dynamics from test_mcts.py the per-env search is
independent of batch composition, so the bucketed planner must be
**bitwise identical** to the plain ``active_inference_mcts`` — regardless
of how many compactions fire. (With real stochastic networks only the MC
noise row layout differs; the estimator's distribution is unchanged —
see the make_bucketed_planner docstring.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deep_active_inference_mc_tpu.plan import mcts as amcts
from deep_active_inference_mc_tpu.plan.mcts import MCTSParams

from tests.test_mcts import (  # deterministic mock model + agent
    A,
    S_DIM,
    MockAgent,
    mock_calculate_G_mean,
    mock_step_simulate,
)


@pytest.fixture(autouse=True)
def _mock_model(monkeypatch):
    monkeypatch.setattr(amcts.efe, "calculate_G_mean", mock_calculate_G_mean)
    monkeypatch.setattr(amcts.efe, "mcts_step_simulate", mock_step_simulate)


def _assert_results_equal(got, want):
    for name in (
        "actions", "lengths", "repeats_done", "states_explored",
        "depth_capped", "root_N", "root_Qpi",
    ):
        np.testing.assert_array_equal(
            np.asarray(getattr(got, name)),
            np.asarray(getattr(want, name)),
            err_msg=name,
        )


def test_bucketed_matches_plain_with_compaction():
    """Heterogeneous batch: some envs phase-B-decide quickly (their root G
    gaps are large), others search the full budget. Compaction must fire
    and the merged results must equal the plain planner's exactly."""
    rng = np.random.RandomState(3)
    roots = rng.randn(16, S_DIM).astype(np.float32) * 0.5
    # Moderate threshold: splits the batch into early deciders + stragglers.
    p = MCTSParams(repeats=24, threshold=0.28, max_depth=16)
    key = jax.random.key(11)

    want = amcts.active_inference_mcts(
        MockAgent(), {}, key, jnp.asarray(roots), p
    )
    reps = np.asarray(want.repeats_done)
    assert reps.min() < reps.max(), "batch must be heterogeneous"

    plan = amcts.make_bucketed_planner(
        MockAgent(), p, check_every=2, min_bucket=2
    )
    got = plan({}, key, jnp.asarray(roots))
    assert len(plan.bucket_trace) > 1, (
        f"compaction never fired: {plan.bucket_trace}"
    )
    assert plan.bucket_trace[-1] < 16
    _assert_results_equal(got, want)


def test_bucketed_matches_plain_no_compaction():
    """min_bucket == B: no compaction possible; still exact."""
    rng = np.random.RandomState(5)
    roots = rng.randn(4, S_DIM).astype(np.float32) * 0.5
    p = MCTSParams(repeats=10, threshold=0.3, max_depth=16)
    key = jax.random.key(2)
    want = amcts.active_inference_mcts(
        MockAgent(), {}, key, jnp.asarray(roots), p
    )
    plan = amcts.make_bucketed_planner(
        MockAgent(), p, check_every=3, min_bucket=4
    )
    got = plan({}, key, jnp.asarray(roots))
    assert plan.bucket_trace == [4]
    _assert_results_equal(got, want)


def test_bucketed_phase_a_habit_retirement():
    """Phase-A-decided envs start done and retire at the first check; the
    merged result must carry their habit action (plain-planner parity)."""
    rng = np.random.RandomState(7)
    roots = rng.randn(8, S_DIM).astype(np.float32) * 0.5
    # Peak a few envs' habit inputs so phase A fires only for them.
    roots[1, 2] = 25.0
    roots[4, 0] = 25.0
    p = MCTSParams(
        repeats=12, threshold=0.4, use_habit=True, max_depth=16
    )
    key = jax.random.key(9)
    want = amcts.active_inference_mcts(
        MockAgent(), {}, key, jnp.asarray(roots), p
    )
    assert int(want.repeats_done[1]) == 0  # phase A fired
    assert int(want.lengths[1]) == 1

    plan = amcts.make_bucketed_planner(
        MockAgent(), p, check_every=2, min_bucket=2
    )
    got = plan({}, key, jnp.asarray(roots))
    _assert_results_equal(got, want)


def test_bucketed_deterministic_across_calls():
    rng = np.random.RandomState(1)
    roots = rng.randn(8, S_DIM).astype(np.float32) * 0.5
    p = MCTSParams(repeats=16, threshold=0.25, max_depth=16)
    plan = amcts.make_bucketed_planner(
        MockAgent(), p, check_every=2, min_bucket=2
    )
    a = plan({}, jax.random.key(4), jnp.asarray(roots))
    b = plan({}, jax.random.key(4), jnp.asarray(roots))
    _assert_results_equal(a, b)
