"""Generic fused engine kernel (`ops/engine_pallas`) for custom robots.

The extension-API story: a robot composed through ``Robot.build_bodies``
gets the same single-launch fused treatment as the built-in robots.  The
differential reference is the vmapped XLA env path.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(__file__), "..", "examples"))


@pytest.fixture(scope="module")
def roller_env():
    from custom_robot import make_roller_umaze

    return make_roller_umaze(num_envs=8, auto_reset=False)


def test_custom_robot_runs_on_engine(roller_env):
    """Sanity: the custom robot falls onto the floor and can be driven."""
    env = roller_env
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (8, 7)  # 6 robot + t channel
    for _ in range(6):
        res = env.step(state, jnp.zeros((8, 2)))
        state = res.state
    # sphere (r=0.4) settles toward the floor from its 0.75 start
    z = np.asarray(state.qpos)[:, 2] + 0.75
    assert (z < 0.7).all() and (z > 0.2).all()


def test_generic_kernel_matches_xla(roller_env):
    from mujoco_maze_tpu.ops import engine_pallas as ep

    env = roller_env
    es = ep.spec_from_env(env.spec)
    step_k = ep.build_step_kernel(es, 8, tile=8)
    state, _ = env.reset(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    for it in range(3):
        a = jnp.asarray(rng.uniform(-1, 1, (8, 2)), jnp.float32)
        res = env.step(state, a)
        qp, qv, tt, rew, term = step_k(state.qpos, state.qvel, state.t, a)
        np.testing.assert_allclose(
            np.asarray(qp), np.asarray(res.state.qpos), atol=1e-5,
            err_msg=f"it{it}")
        np.testing.assert_allclose(
            np.asarray(qv), np.asarray(res.state.qvel), atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(rew), np.asarray(res.reward), atol=1e-5)
        assert bool((term == res.terminated).all())
        state = res.state


def test_make_fast_step_dispatches_custom_robot(roller_env):
    """ops.make_fast_step routes unknown engine robots to the generic
    kernel (build-only on CPU)."""
    from mujoco_maze_tpu import ops

    kern = ops.make_fast_step(roller_env, tile=8)
    assert kern is not None


def test_lane_engine_matches_engine_on_ball_world():
    """The generic lane engine reproduces the vmapped engine on the
    hardest composed world (free ball + contacts + pairs)."""
    import mujoco_maze_tpu as mmt
    from mujoco_maze_tpu.ops import lane_engine as le
    from mujoco_maze_tpu.physics import contact as contact_mod
    from mujoco_maze_tpu.physics import engine as eng

    spec = mmt.make_spec("AntSmallBilliard-v0")
    model = spec.dynamic_model
    cset = spec.contact_set
    _, chain_mask, _, _ = eng.get_masks(model)
    lw = le.world_from_spec(spec)

    def extra_ref(kd, qacc0, Minv, qvel_now):
        qf = contact_mod.contact_qfrc(
            model, cset, kd, qvel_now, qacc0, Minv, chain_mask)
        return qf + spec.engine_support_qfrc(kd, qacc0, Minv, qvel_now)

    cols = lambda x: tuple(jnp.asarray(x)[i][None] for i in range(len(x)))
    rng = np.random.RandomState(0)
    qp = np.asarray(model.qpos0).copy()
    qp[:15] += rng.uniform(-0.08, 0.08, 15)
    qp[3:7] /= np.linalg.norm(qp[3:7])
    qp[15:17] = qp[:2] + rng.uniform(-0.5, 0.5, 2)  # ball touching the ant
    qv = rng.randn(model.nv) * 0.3
    ct = rng.uniform(-30, 30, 8)
    ref = eng.forward(model, jnp.asarray(qp), jnp.asarray(qv),
                      jnp.asarray(ct), extra_qfrc=extra_ref)
    got = le.forward_lane(lw, cols(qp), cols(qv), cols(ct))
    got = np.asarray([np.asarray(x)[0] for x in got])
    rel = np.abs(got - np.asarray(ref)).max() / (1 + float(np.abs(ref).max()))
    assert rel < 1e-5, f"rel err {rel}"
