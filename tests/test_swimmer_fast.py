"""Closed-form swimmer dynamics + Pallas swimmer kernel validation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mujoco_maze_tpu as mmt
from mujoco_maze_tpu.models.swimmer import SwimmerRobot, build_swimmer_model
from mujoco_maze_tpu.ops import swimmer_math as sw
from mujoco_maze_tpu.physics import engine


@pytest.fixture(scope="module")
def model():
    return engine.prepare(build_swimmer_model())


def test_closed_form_matches_engine(model):
    """qacc of the hand-derived planar dynamics vs the generic engine
    (which is MuJoCo-exact) — float64."""
    jax.config.update("jax_enable_x64", True)
    try:
        ks = sw.spec_from_model(model)
        rng = np.random.RandomState(0)
        for _ in range(6):
            q = rng.uniform(-0.8, 0.8, 5)
            v = rng.uniform(-2, 2, 5)
            c = rng.uniform(-1.2, 1.2, 2)
            ref = np.asarray(
                engine.forward(model, jnp.asarray(q), jnp.asarray(v), jnp.asarray(c))
            )
            fast = np.asarray(
                sw.forward_swimmer(
                    ks,
                    tuple(jnp.asarray(x) for x in q),
                    tuple(jnp.asarray(x) for x in v),
                    tuple(jnp.asarray(x) for x in c),
                )
            )
            np.testing.assert_allclose(fast, ref, atol=1e-9)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_closed_form_trajectory(model):
    jax.config.update("jax_enable_x64", True)
    try:
        ks = sw.spec_from_model(model)
        rng = np.random.RandomState(3)
        q = tuple(jnp.asarray(x) for x in rng.uniform(-0.3, 0.3, 5))
        v = tuple(jnp.asarray(x) for x in rng.uniform(-0.5, 0.5, 5))
        qe = jnp.asarray([float(a) for a in q])
        ve = jnp.asarray([float(a) for a in v])
        for _ in range(50):
            c = rng.uniform(-1, 1, 2)
            q, v = sw.rk4_step_swimmer(ks, q, v, tuple(jnp.asarray(x) for x in c))
            qe, ve = engine.rk4_step(model, qe, ve, jnp.asarray(c))
        np.testing.assert_allclose(
            np.asarray([float(a) for a in q]), np.asarray(qe), atol=1e-10
        )
    finally:
        jax.config.update("jax_enable_x64", False)


def test_swimmer_env_uses_closed_form():
    """The env dynamic path routes through the closed form and matches the
    engine path bit-for-behavior."""
    env = mmt.make_batched("SwimmerUMaze-v0", num_envs=8, auto_reset=False)
    state, _ = env.reset(jax.random.PRNGKey(0))
    a = jnp.full((8, 2), 0.5, jnp.float32)
    res_fast = env.step(state, a)
    try:
        SwimmerRobot.USE_CLOSED_FORM = False
        env2 = mmt.make_batched("SwimmerUMaze-v0", num_envs=8, auto_reset=False)
        state2, _ = env2.reset(jax.random.PRNGKey(0))
        res_ref = env2.step(state2, a)
    finally:
        SwimmerRobot.USE_CLOSED_FORM = True
    np.testing.assert_allclose(
        np.asarray(res_fast.obs), np.asarray(res_ref.obs), atol=2e-5
    )


def test_swimmer_pallas_step_matches_env():
    from mujoco_maze_tpu.ops import swimmer_pallas as sp

    B = 128
    env = mmt.make_batched("SwimmerUMaze-v0", num_envs=B, auto_reset=False)
    es = sp.spec_from_env(env.spec)
    step_k = sp.build_step_kernel(es, B, tile=B)
    state, _ = env.reset(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    actions = jnp.asarray(rng.uniform(-1, 1, (B, 2)), jnp.float32)
    res = env.step(state, actions)
    qp, qv, tt, rew, term = step_k(state.qpos, state.qvel, state.t, actions)
    np.testing.assert_allclose(np.asarray(qp), np.asarray(res.state.qpos), atol=1e-4)
    np.testing.assert_allclose(np.asarray(rew), np.asarray(res.reward), atol=1e-4)
    assert bool((term == res.terminated).all())


def test_reacher_closed_form_matches_engine():
    """2-link reacher through the generalized closed form (n=4 coords)
    tracks the generic engine to machine epsilon over 40 RK4 steps."""
    import numpy as np

    from mujoco_maze_tpu.models.reacher import build_reacher_model
    from mujoco_maze_tpu.ops import swimmer_math as sw
    from mujoco_maze_tpu.physics import engine

    jax.config.update("jax_enable_x64", True)
    try:
        model = build_reacher_model()
        ks = sw.spec_from_model(model)
        assert (ks.n_act, ks.n_links) == (1, 2)
        rng = np.random.RandomState(3)
        q = jnp.asarray(rng.uniform(-1, 1, 4))
        v = jnp.asarray(rng.uniform(-1, 1, 4))
        c = jnp.asarray(rng.uniform(-1, 1, 1))
        q_ref, v_ref = q, v
        qt = tuple(q[i][None] for i in range(4))
        vt = tuple(v[i][None] for i in range(4))
        for _ in range(40):
            q_ref, v_ref = engine.rk4_step(model, q_ref, v_ref, c)
            qt, vt = sw.rk4_step_swimmer(ks, qt, vt, (c[0][None],))
        got = np.asarray([float(x[0]) for x in qt])
        assert np.abs(got - np.asarray(q_ref)).max() < 1e-10
    finally:
        jax.config.update("jax_enable_x64", False)
