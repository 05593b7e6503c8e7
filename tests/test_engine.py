"""Differential validation of the rigid-body engine against MuJoCo 3.

The in-repo engine (physics/engine.py) is validated at three levels on the
swimmer/reacher models: forward dynamics (qacc from mj_forward), full RK4
rollouts (mj_step trajectories), and joint-limit behavior.  Everything runs
in float64 to separate algorithmic error from precision.
"""

import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")

import jax
import jax.numpy as jnp


@pytest.fixture(autouse=True)
def _x64():
    """x64 scoped to this module so the f32 env tests are unaffected."""
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)

from mujoco_maze_tpu.models.reacher import build_reacher_model
from mujoco_maze_tpu.models.swimmer import build_swimmer_model
from mujoco_maze_tpu.physics import engine

SWIMMER_XML = (
    open("/root/reference/mujoco_maze/assets/swimmer.xml")
    .read()
    .replace('collision="predefined" ', "")
    .replace("0 0s 1.3", "0 0 1.3")
)
REACHER_XML = (
    open("/root/reference/mujoco_maze/assets/reacher.xml")
    .read()
    .replace('collision="predefined" ', "")
    .replace("0 0s 1.3", "0 0 1.3")
)


def _mj(xml):
    m = mujoco.MjModel.from_xml_string(xml)
    # reference semantics: collision="predefined" with no pairs → no contacts
    m.opt.disableflags |= mujoco.mjtDisableBit.mjDSBL_CONTACT
    return m, mujoco.MjData(m)


@pytest.fixture(scope="module")
def swimmer():
    m, d = _mj(SWIMMER_XML)
    return m, d, engine.prepare(build_swimmer_model())


@pytest.fixture(scope="module")
def reacher():
    m, d = _mj(REACHER_XML)
    return m, d, engine.prepare(build_reacher_model())


def test_model_build_matches_mujoco(swimmer):
    m, d, model = swimmer
    assert (m.nq, m.nv, m.nu) == (model.nq, model.nv, model.nu)
    np.testing.assert_allclose(m.body_mass[1:], model.body_mass, rtol=1e-9)
    for i in range(model.nbody):
        np.testing.assert_allclose(
            np.sort(m.body_inertia[1 + i]),
            np.sort(np.linalg.eigvalsh(model.body_inertia[i])),
            rtol=1e-9,
        )


@pytest.mark.parametrize("robot", ["swimmer", "reacher"])
def test_qacc_matches_mj_forward(robot, request):
    m, d, model = request.getfixturevalue(robot)
    rng = np.random.RandomState(0)
    fwd = jax.jit(lambda q, v, c: engine.forward(model, q, v, c))
    for _ in range(10):
        qpos = rng.uniform(-0.6, 0.6, m.nq)
        qvel = rng.uniform(-2, 2, m.nv)
        ctrl = rng.uniform(-1, 1, m.nu)
        d.qpos[:] = qpos
        d.qvel[:] = qvel
        d.ctrl[:] = ctrl
        mujoco.mj_forward(m, d)
        qacc = np.asarray(fwd(jnp.asarray(qpos), jnp.asarray(qvel), jnp.asarray(ctrl)))
        np.testing.assert_allclose(qacc, d.qacc, rtol=1e-8, atol=1e-8)


@pytest.mark.parametrize("robot", ["swimmer", "reacher"])
def test_rollout_matches_mj_step(robot, request):
    """400 random-action RK4 steps stay machine-close to mj_step (no limit
    contact in this regime)."""
    m, d, model = request.getfixturevalue(robot)
    rng = np.random.RandomState(3)
    mujoco.mj_resetData(m, d)
    d.qpos[:] = rng.uniform(-0.1, 0.1, m.nq)
    d.qvel[:] = rng.uniform(-0.1, 0.1, m.nv)
    mujoco.mj_forward(m, d)
    step = jax.jit(lambda q, v, c: engine.rk4_step(model, q, v, c))
    q = jnp.asarray(d.qpos.copy())
    v = jnp.asarray(d.qvel.copy())
    for t in range(400):
        ctrl = rng.uniform(-1, 1, m.nu)
        d.ctrl[:] = ctrl
        mujoco.mj_step(m, d)
        q, v = step(q, v, jnp.asarray(ctrl))
        if t == 199:
            # limit-free regime: machine-close
            np.testing.assert_allclose(np.asarray(q), d.qpos, atol=1e-10)
    # full horizon may graze joint limits, where the constraint model is
    # ~1e-3-accurate; bound the accumulated divergence
    np.testing.assert_allclose(np.asarray(q), d.qpos, atol=2e-2)


def test_joint_limits_match_mujoco(swimmer):
    """Pressing both tail joints into their ±100° limits with full torque:
    resting violation within 3e-3 rad of MuJoCo's constraint solver."""
    m, d, model = swimmer
    mujoco.mj_resetData(m, d)
    step = jax.jit(lambda q, v, c: engine.rk4_step(model, q, v, c))
    q = jnp.zeros(5)
    v = jnp.zeros(5)
    for _ in range(300):
        d.ctrl[:] = [1.0, 1.0]
        mujoco.mj_step(m, d)
        q, v = step(q, v, jnp.ones(2))
    assert np.abs(np.asarray(q) - d.qpos).max() < 3e-3


def test_energy_sane_without_drag():
    """No actuation, no drag, no gravity work (planar): KE is conserved."""
    import dataclasses

    model = dataclasses.replace(
        build_swimmer_model(), viscosity=0.0, fluid_density=0.0
    )
    engine.prepare(model)
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.uniform(-0.3, 0.3, 5))
    v = jnp.asarray(rng.uniform(-1, 1, 5))

    def ke(q, v):
        kd = engine.kin_dyn(model, q, v)
        M = engine.crb_mass_matrix(model, kd)
        return 0.5 * float(v @ M @ v)

    e0 = ke(q, v)
    step = jax.jit(lambda q, v: engine.rk4_step(model, q, v, jnp.zeros(2)))
    for _ in range(200):
        q, v = step(q, v)
    e1 = ke(q, v)
    assert abs(e1 - e0) / e0 < 1e-6
