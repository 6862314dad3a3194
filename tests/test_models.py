"""Shape/dtype/stochasticity tests for the three neural modules and agent."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deep_active_inference_mc_tpu.infer.agent import ActiveInferenceAgent


@pytest.fixture(scope="module")
def agent():
    return ActiveInferenceAgent(s_dim=10, pi_dim=4)


@pytest.fixture(scope="module")
def params(agent):
    return agent.init(jax.random.key(0))


def test_param_counts(agent, params):
    counts = agent.param_counts(params)
    # ModelTop: 10*128+128 + 128*128+128 + 128*4+4 = 18436
    assert counts["top"] == 10 * 128 + 128 + 128 * 128 + 128 + 128 * 4 + 4
    # ModelMid: (14*512+512) + 2*(512*512+512) + 512*20+20
    assert counts["mid"] == (14 * 512 + 512) + 2 * (512 * 512 + 512) + (
        512 * 20 + 20
    )
    assert counts["down"] > 4_000_000  # decoder FC to 16*16*64 dominates


def test_habit_output(agent, params):
    s = jax.random.normal(jax.random.key(1), (7, 10))
    logits, q_pi, log_q_pi = agent.habit(params, s)
    assert logits.shape == q_pi.shape == log_q_pi.shape == (7, 4)
    np.testing.assert_allclose(np.asarray(q_pi.sum(-1)), 1.0, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(log_q_pi), np.log(np.asarray(q_pi) + 1e-20), atol=1e-3
    )


def test_transition_shapes_and_dropout(agent, params):
    s0 = jax.random.normal(jax.random.key(2), (5, 10))
    pi = jnp.tile(jnp.eye(4)[0], (5, 1))
    mean, logvar = agent.transition(params, pi, s0, dropout=False)
    assert mean.shape == logvar.shape == (5, 10)
    # Without dropout: deterministic.
    mean2, _ = agent.transition(params, pi, s0, dropout=False)
    np.testing.assert_array_equal(np.asarray(mean), np.asarray(mean2))
    # With dropout: different theta draws give different outputs.
    m_a, _ = agent.transition(params, pi, s0, key=jax.random.key(3), dropout=True)
    m_b, _ = agent.transition(params, pi, s0, key=jax.random.key(4), dropout=True)
    assert not np.allclose(np.asarray(m_a), np.asarray(m_b))


def test_vae_roundtrip_shapes(agent, params):
    o = jax.random.uniform(jax.random.key(5), (3, 64, 64, 1))
    mean, logvar = agent.encode(params, o)
    assert mean.shape == logvar.shape == (3, 10)
    po = agent.decode(params, mean)
    assert po.shape == (3, 64, 64, 1)
    assert float(po.min()) >= 0.0 and float(po.max()) <= 1.0


def test_decoder_res32():
    agent32 = ActiveInferenceAgent(s_dim=10, pi_dim=4, resolution=32)
    params32 = agent32.init(jax.random.key(0))
    o = jnp.zeros((2, 32, 32, 1))
    mean, _ = agent32.encode(params32, o)
    po = agent32.decode(params32, mean)
    assert po.shape == (2, 32, 32, 1)


def test_habitual_net_and_imagination(agent, params):
    o = jax.random.uniform(jax.random.key(6), (4, 64, 64, 1))
    q_pi = agent.habitual_net(params, o)
    assert q_pi.shape == (4, 4)
    np.testing.assert_allclose(np.asarray(q_pi.sum(-1)), 1.0, rtol=1e-5)
    pi = jnp.tile(jnp.eye(4)[0], (4, 1))
    po1 = agent.imagine_future_from_o(params, jax.random.key(7), o, pi)
    assert po1.shape == (4, 64, 64, 1)


def test_check_reward_prefers_good_frames(agent, params):
    good = np.zeros((1, 64, 64, 1), np.float32)
    good[:, 0:3, 0:32] = 1.0
    bad = np.zeros((1, 64, 64, 1), np.float32)
    bad[:, 0:3, 32:64] = 1.0
    r_good = float(agent.check_reward(jnp.asarray(good))[0])
    r_bad = float(agent.check_reward(jnp.asarray(bad))[0])
    assert r_good > r_bad
    np.testing.assert_allclose(r_good, 0.0, atol=1e-3)  # 10*mean(log(1+eps))~0
