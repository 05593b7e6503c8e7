"""Batch-last engine (`physics/engine_batched`) vs the vmapped per-env path.

The batch-last layout is a pure transposition of the same pipeline, so the
two paths must agree to float32 roundoff on every stage — including the
full contact solve and the frame_skip × RK4 dynamics step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mujoco_maze_tpu as mmt
from mujoco_maze_tpu.physics import contact as contact_mod
from mujoco_maze_tpu.physics import engine as eng
from mujoco_maze_tpu.physics import engine_batched as engb


def test_swimmer_forward_and_rk4_match_vmap():
    from mujoco_maze_tpu.models.swimmer import build_swimmer_model

    m = eng.prepare(build_swimmer_model())
    rng = np.random.RandomState(0)
    B = 4
    qp = jnp.asarray(rng.uniform(-0.5, 0.5, (m.nq, B)), jnp.float32)
    qv = jnp.asarray(rng.randn(m.nv, B) * 0.5, jnp.float32)
    ct = jnp.asarray(rng.uniform(-1, 1, (m.nu, B)), jnp.float32)
    ref = jax.vmap(lambda q, v, c: eng.forward(m, q, v, c),
                   in_axes=(1, 1, 1), out_axes=1)(qp, qv, ct)
    got = engb.forward_b(m, qp, qv, ct)
    # qacc reaches ~1e2 under gear-150 torque; 1e-3 abs ≈ 1e-5 relative
    assert float(jnp.abs(got - ref).max()) < 1e-3
    r_q, r_v = jax.vmap(lambda q, v, c: eng.rk4_step(m, q, v, c),
                        in_axes=(1, 1, 1), out_axes=1)(qp, qv, ct)
    g_q, g_v = engb.rk4_step_b(m, qp, qv, ct)
    assert float(jnp.abs(g_q - r_q).max()) < 1e-6
    assert float(jnp.abs(g_v - r_v).max()) < 1e-4


@pytest.fixture(scope="module")
def ant_env():
    return mmt.make_batched("AntUMaze-v0", num_envs=4, auto_reset=False)


def _ant_state(spec, B, seed=0):
    model = spec.dynamic_model
    rng = np.random.RandomState(seed)
    qp = np.tile(np.asarray(model.qpos0)[:, None], (1, B))
    qp[:15] += rng.uniform(-0.08, 0.08, (15, B))
    qp[3:7] /= np.linalg.norm(qp[3:7], axis=0, keepdims=True)
    qv = rng.randn(model.nv, B) * 0.3
    ct = rng.uniform(-30, 30, (8, B))
    return (jnp.asarray(qp, jnp.float32), jnp.asarray(qv, jnp.float32),
            jnp.asarray(ct, jnp.float32))


def test_ant_contact_forward_matches_vmap(ant_env):
    spec = ant_env.spec
    model = spec.dynamic_model
    cset = spec.contact_set
    _, chain_mask, _, _ = eng.get_masks(model)
    qp, qv, ct = _ant_state(spec, B=4)

    def extra_ref(kd, qacc0, Minv, qvel_now):
        q = contact_mod.contact_qfrc(
            model, cset, kd, qvel_now, qacc0, Minv, chain_mask)
        return q + spec.engine_support_qfrc(kd, qacc0, Minv, qvel_now)

    ref = jax.vmap(
        lambda q, v, c: eng.forward(model, q, v, c, extra_qfrc=extra_ref),
        in_axes=(1, 1, 1), out_axes=1)(qp, qv, ct)

    def extra_b(kd, qacc0, Minv, qvel_now):
        return engb.contact_qfrc_b(
            model, cset, kd, qvel_now, qacc0, Minv, chain_mask)

    got = engb.forward_b(model, qp, qv, ct, extra_qfrc=extra_b)
    rel = float(jnp.abs(got - ref).max()) / (1.0 + float(jnp.abs(ref).max()))
    assert rel < 1e-5, f"rel err {rel}"


def test_ant_dynamics_step_matches_vmap(ant_env):
    """build_dynamics_step (frame_skip × RK4 with contacts + block support)
    == vmap(robot.dynamics_step) to float32 roundoff."""
    spec = ant_env.spec
    qp, qv, ct = _ant_state(spec, B=2, seed=1)
    step_b = engb.build_dynamics_step(spec)
    gq, gv = step_b(qp.T, qv.T, ct.T)
    rq, rv = jax.vmap(lambda q, v, a: spec.robot.dynamics_step(spec, q, v, a))(
        qp.T, qv.T, ct.T)
    assert float(jnp.abs(gq - rq).max()) < 1e-5
    assert float(jnp.abs(gv - rv).max()) < 1e-3


def test_batched_env_engine_kern_matches_vmap(ant_env):
    """The BatchedMazeEnv wiring (engine_batched=True) reproduces the
    vmapped env step: state, obs, reward, termination."""
    B = 2
    ref = mmt.make_batched("AntUMaze-v0", num_envs=B, auto_reset=False)
    fast = mmt.make_batched("AntUMaze-v0", num_envs=B, auto_reset=False,
                            fast_step=False, engine_batched=True)
    assert fast._fast is not None
    state, obs0 = ref.reset(jax.random.PRNGKey(0))
    fstate, fobs0 = fast.reset(jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(obs0), np.asarray(fobs0))
    rng = np.random.RandomState(2)
    actions = jnp.asarray(rng.uniform(-30, 30, (B, 8)), jnp.float32)
    r1 = ref.step(state, actions)
    r2 = fast.step(fstate, actions)
    np.testing.assert_allclose(
        np.asarray(r2.state.qpos), np.asarray(r1.state.qpos), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(r2.obs), np.asarray(r1.obs), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(r2.reward), np.asarray(r1.reward), atol=1e-4)
    assert bool((r2.terminated == r1.terminated).all())
