"""Property tests for the dynamic-dSprites environment against the reference
rules (SURVEY.md §2.1, /root/reference/src/game_environment.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deep_active_inference_mc_tpu.envs import dsprites as env
from deep_active_inference_mc_tpu.envs import raster

pytestmark = pytest.mark.smoke  # pre-commit tier: `pytest -m smoke`


@pytest.fixture(scope="module")
def lut():
    return raster.build_sprite_lut()


def make_state(shape=0, scale=3, orient=5, pos_x=10, pos_y=20, score=0.0, last_r=0.0):
    return env.EnvState(
        latents=jnp.asarray([[0, shape, scale, orient, pos_x, pos_y]], jnp.int32),
        score=jnp.asarray([score], jnp.float32),
        last_r=jnp.asarray([last_r], jnp.float32),
    )


def step1(state, action, seed=0):
    new, scored = env.step(
        jax.random.key(seed), state, jnp.asarray([action], jnp.int32)
    )
    return new, bool(scored[0])


def test_movement_semantics():
    s = make_state(pos_x=10, pos_y=20)
    up, _ = step1(s, 0)
    assert int(up.latents[0, 5]) == 21
    down, _ = step1(s, 1)
    assert int(down.latents[0, 5]) == 19
    left, _ = step1(s, 2)  # "left" increments posX (swapped axis naming)
    assert int(left.latents[0, 4]) == 11
    right, _ = step1(s, 3)
    assert int(right.latents[0, 4]) == 9


def test_movement_clamping():
    s = make_state(pos_x=31, pos_y=0)
    left, _ = step1(s, 2)
    assert int(left.latents[0, 4]) == 31
    down, _ = step1(s, 1)
    assert int(down.latents[0, 5]) == 0
    s = make_state(pos_x=0)
    right, _ = step1(s, 3)
    assert int(right.latents[0, 4]) == 0


def test_reward_decay_every_action():
    s = make_state(last_r=1.0)
    for a in range(4):
        new, _ = step1(s, a)
        np.testing.assert_allclose(float(new.last_r[0]), 0.95, rtol=1e-6)


def test_scoring_square_left_positive():
    # Square at posX=4 crossing the top: reward (16-4)/16 = 0.75
    s = make_state(shape=0, pos_x=4, pos_y=31, score=1.0)
    new, scored = step1(s, 0)
    assert scored
    np.testing.assert_allclose(float(new.last_r[0]), 0.75, rtol=1e-6)
    np.testing.assert_allclose(float(new.score[0]), 1.75, rtol=1e-6)


def test_scoring_square_right_negative():
    # Square at posX=20: reward (15-20)/16 = -0.3125
    s = make_state(shape=0, pos_x=20, pos_y=31)
    new, scored = step1(s, 0)
    assert scored
    np.testing.assert_allclose(float(new.last_r[0]), -0.3125, rtol=1e-6)


def test_scoring_ellipse_mirrored():
    # Ellipse (shape=1) at posX=20: reward (20-15)/16 = +0.3125
    s = make_state(shape=1, pos_x=20, pos_y=31)
    new, scored = step1(s, 0)
    assert scored
    np.testing.assert_allclose(float(new.last_r[0]), 0.3125, rtol=1e-6)
    # Heart (shape=2) at posX=4: (4-16)/16 = -0.75
    s = make_state(shape=2, pos_x=4, pos_y=31)
    new, _ = step1(s, 0)
    np.testing.assert_allclose(float(new.last_r[0]), -0.75, rtol=1e-6)


def test_scoring_respawns_object_keeps_score():
    s = make_state(shape=0, scale=5, orient=39, pos_x=4, pos_y=31, score=2.0)
    seeds = [step1(s, 0, seed=i)[0] for i in range(8)]
    # Score carried over in all respawns.
    for new in seeds:
        np.testing.assert_allclose(float(new.score[0]), 2.75, rtol=1e-6)
    # Latents re-randomized: not all respawns identical.
    lat = np.stack([np.asarray(n.latents[0]) for n in seeds])
    assert len(np.unique(lat, axis=0)) > 1
    for n in seeds:
        for i in range(6):
            assert 0 <= int(n.latents[0, i]) < env.LATENT_SIZES[i]


def test_no_score_when_not_at_edge():
    s = make_state(pos_y=30)
    new, scored = step1(s, 0)
    assert not scored
    assert int(new.latents[0, 5]) == 31


def test_step_repeated_aborts_on_scoring():
    # posY=29, up x5: steps to 30, 31, then scores on the 3rd repeat; the
    # remaining repeats must not run (respawned object doesn't move/tick).
    s = make_state(pos_x=0, pos_y=29, last_r=1.0)
    new, scored = env.step_repeated(
        jax.random.key(3), s, jnp.asarray([0], jnp.int32), repeats=5
    )
    assert bool(scored[0])
    np.testing.assert_allclose(float(new.score[0]), 1.0, rtol=1e-6)
    np.testing.assert_allclose(float(new.last_r[0]), 1.0, rtol=1e-6)  # = reward


def test_step_repeated_full_when_no_scoring():
    s = make_state(pos_x=10, pos_y=0, last_r=1.0)
    new, scored = env.step_repeated(
        jax.random.key(4), s, jnp.asarray([2], jnp.int32), repeats=5
    )
    assert not bool(scored[0])
    assert int(new.latents[0, 4]) == 15
    np.testing.assert_allclose(float(new.last_r[0]), 0.95**5, rtol=1e-5)


def test_randomize_ranges():
    state = env.reset(jax.random.key(0), 512)
    state = env.randomize(jax.random.key(1), state)
    score = np.asarray(state.score)
    last_r = np.asarray(state.last_r)
    assert score.min() >= -10 and score.max() <= 10 and score.std() > 3
    assert last_r.min() >= -1 and last_r.max() <= 1 and last_r.std() > 0.3
    lat = np.asarray(state.latents)
    for i, n in enumerate(env.LATENT_SIZES):
        assert lat[:, i].min() >= 0 and lat[:, i].max() < n


def test_render_shapes_and_strip(lut):
    state = env.EnvState(
        latents=jnp.asarray(
            [[0, 0, 5, 0, 16, 16], [0, 1, 5, 0, 16, 16]], jnp.int32
        ),
        score=jnp.zeros((2,), jnp.float32),
        last_r=jnp.asarray([0.5, -0.5], jnp.float32),
    )
    o = np.asarray(env.render(lut, state))
    assert o.shape == (2, 64, 64, 1)
    assert o.min() >= 0.0 and o.max() <= 1.0
    # env 0: positive reward -> left half of strip = 0.5, right half untouched.
    np.testing.assert_allclose(o[0, 0:3, 0:32, 0], 0.5)
    assert o[0, 0:3, 32:64, 0].max() == 0.0  # sprite nowhere near top rows
    # env 1: negative reward -> right half = 0.5.
    np.testing.assert_allclose(o[1, 0:3, 32:64, 0], 0.5)
    # Sprite visible around its center (16+posY, 16+posX) = (32, 32).
    assert o[0, 28:37, 28:37, 0].sum() > 4
    # Square covers more pixels than the ellipse at the same scale.
    assert o[0, 3:, :, 0].sum() > o[1, 3:, :, 0].sum()


def test_render_translation_consistency(lut):
    """Moving the sprite must translate pixels exactly."""
    s1 = make_state(shape=2, scale=4, orient=7, pos_x=10, pos_y=10)
    s2 = make_state(shape=2, scale=4, orient=7, pos_x=12, pos_y=15)
    o1 = np.asarray(env.render(lut, s1))[0, :, :, 0]
    o2 = np.asarray(env.render(lut, s2))[0, :, :, 0]
    # shift: rows by +5 (posY), cols by +2 (posX)
    np.testing.assert_allclose(o1[10:50, 10:50], o2[15:55, 12:52])


def test_sprites_fit_in_frame(lut):
    """No sprite may clip the frame edge at any extreme position/scale."""
    for shape in range(3):
        for orient in (0, 5, 13, 39):
            state = env.EnvState(
                latents=jnp.asarray(
                    [[0, shape, 5, orient, 0, 0], [0, shape, 5, orient, 31, 31]],
                    jnp.int32,
                ),
                score=jnp.zeros((2,), jnp.float32),
                last_r=jnp.zeros((2,), jnp.float32),
            )
            o = np.asarray(env.render(lut, state))
            assert o[:, :, 0, 0].max() == 0.0, (shape, orient)
            assert o[:, :, -1, 0].max() == 0.0, (shape, orient)
            assert o[:, -1, :, 0].max() == 0.0, (shape, orient)
            # sprite itself is non-empty
            assert o[0].sum() > 10


def test_expert_policy_and_autoplay_improves_score(lut):
    """The ground-truth expert must accumulate positive score on average."""
    state = env.reset(jax.random.key(0), 256)

    @jax.jit
    def rollout(key, state):
        def body(carry, k):
            st, _ = carry
            st, a = env.auto_play(k, st, randomness=0.4)
            return (st, a), None

        (state, _), _ = jax.lax.scan(
            body,
            (state, jnp.zeros((state.batch,), jnp.int32)),
            jax.random.split(key, 300),
        )
        return state

    final = rollout(jax.random.key(1), state)
    assert float(np.mean(np.asarray(final.score))) > 1.0


def test_jit_vmap_composability(lut):
    """step must be jit-able and stable under scan (fixed shapes)."""
    state = env.reset(jax.random.key(0), 64)

    @jax.jit
    def many(key, state):
        def body(st, k):
            a = jax.random.randint(k, (64,), 0, 4)
            st, sc = env.step(k, st, a)
            return st, sc

        return jax.lax.scan(body, state, jax.random.split(key, 50))

    final, scored = many(jax.random.key(5), state)
    assert final.latents.shape == (64, 6)
    assert scored.shape == (50, 64)


def test_pin_edge_fraction():
    from deep_active_inference_mc_tpu.envs import data as data_lib

    key = jax.random.key(7)
    state = env.randomize(key, env.reset(key, 512))
    pinned_all = data_lib.pin_edge_fraction(jax.random.key(8), state, 1.0)
    posy = np.asarray(pinned_all.latents[:, 5])
    assert posy.min() >= 28 and posy.max() <= 31
    # Only posY is touched.
    np.testing.assert_array_equal(
        np.asarray(pinned_all.latents[:, :5]), np.asarray(state.latents[:, :5])
    )
    # frac=0.5 pins about half, leaves the rest untouched.
    pinned_half = data_lib.pin_edge_fraction(jax.random.key(9), state, 0.5)
    moved = np.asarray(pinned_half.latents[:, 5]) != np.asarray(state.latents[:, 5])
    at_edge = np.asarray(pinned_half.latents[:, 5]) >= 28
    assert 0.3 < at_edge.mean() < 0.75
    assert np.all(at_edge | ~moved)
