"""Agent-configuration variants: 3-action (Animal-AI-style) pi_dim and
32x32 resolution (torchmodel.py:77-82,164-165; mcts.py:70-75,119-124)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deep_active_inference_mc_tpu.infer import efe
from deep_active_inference_mc_tpu.infer.agent import ActiveInferenceAgent
from deep_active_inference_mc_tpu.plan import mcts as amcts
from deep_active_inference_mc_tpu.train import losses


def test_three_action_agent_efe():
    agent = ActiveInferenceAgent(s_dim=10, pi_dim=3, resolution=32)
    params = agent.init(jax.random.key(0))
    o = jax.random.uniform(jax.random.key(1), (4, 32, 32, 1))
    G, terms, po1 = efe.calculate_G_4_repeated(
        agent, params, jax.random.key(2), o, steps=1, calc_mean=True
    )
    assert G.shape == (4, 3)
    assert po1.shape == (4 * 3, 32, 32, 1)
    assert np.all(np.isfinite(np.asarray(G)))
    # 32-res check_reward path (calc_reward_animalai analogue) is finite
    # and prefers the template.
    good = np.zeros((1, 32, 32, 1), np.float32)
    good[:, 0:3, 0:16] = 1.0
    bad = np.zeros((1, 32, 32, 1), np.float32)
    bad[:, 0:3, 16:32] = 1.0
    assert float(agent.check_reward(jnp.asarray(good))[0]) > float(
        agent.check_reward(jnp.asarray(bad))[0]
    )


def test_three_action_trim_rule():
    # pi_dim=3: (1,2) and (2,1) are the opposite pair (mcts.py:119-124).
    path = jnp.asarray([[0, 1, 2, 0, 0, -1, -1, -1]], jnp.int32)
    out, n = amcts._trim_path(path, jnp.asarray([5]), 3, 8)
    # 0 kept; (1,2) pair dropped; 0 kept; last 0 dropped by the bound.
    assert int(n[0]) == 2
    assert list(np.asarray(out[0][:2])) == [0, 0]


def test_three_action_habit_and_sim():
    agent = ActiveInferenceAgent(s_dim=10, pi_dim=3, resolution=32)
    params = agent.init(jax.random.key(0))
    s = jax.random.normal(jax.random.key(1), (2, 10))
    G, pi_traj, q_root = efe.mcts_step_simulate(
        agent, params, jax.random.key(2), s, depth=2
    )
    assert pi_traj.shape == (2, 2, 3)
    assert q_root.shape == (2, 3)
    np.testing.assert_allclose(np.asarray(q_root.sum(-1)), 1.0, rtol=1e-5)


def test_compute_kl_div_pi():
    agent = ActiveInferenceAgent(s_dim=10, pi_dim=4)
    params = agent.init(jax.random.key(0))
    o = jax.random.uniform(jax.random.key(1), (4, 64, 64, 1))
    log_Ppi = jnp.log(jnp.full((4, 4), 0.25))
    kl = losses.compute_kl_div_pi(agent, params, jax.random.key(2), o, log_Ppi)
    assert kl.shape == (4,)
    assert np.all(np.asarray(kl) >= -1e-5)  # KL against uniform prior >= 0
