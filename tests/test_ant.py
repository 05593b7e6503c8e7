"""Ant: engine differential tests (vs MuJoCo) + env contracts.

The smooth (contact-free) dynamics are machine-exact vs MuJoCo; with
contacts, the projected-Jacobi impedance solver tracks MuJoCo's coupled
solver through the initial drop transient and reaches an equilibrium within
a few cm — asserted as behavioral bounds (contact trajectories are chaotic;
bit-parity is not a meaningful target there).
"""

import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")

import jax
import jax.numpy as jnp

from mujoco_maze_tpu.models.ant import build_ant_model
from mujoco_maze_tpu.physics import contact, engine

ANT_XML = open("/root/reference/mujoco_maze/assets/ant.xml").read()


@pytest.fixture(autouse=True)
def _x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


@pytest.fixture(scope="module")
def ant():
    m = mujoco.MjModel.from_xml_string(ANT_XML)
    d = mujoco.MjData(m)
    model = engine.prepare(build_ant_model())
    return m, d, model


def test_ant_model_matches(ant):
    m, d, model = ant
    assert (m.nq, m.nv, m.nu) == (model.nq, model.nv, model.nu)
    np.testing.assert_allclose(m.body_mass.sum(), model.body_mass.sum(), rtol=1e-9)
    np.testing.assert_allclose(m.qpos0, model.qpos0, atol=1e-12)


def test_ant_smooth_qacc_exact(ant):
    """Contact- and limit-free forward dynamics: machine precision parity
    (validates the FREE-joint path: world-linear/body-angular qvel, body-
    fixed rotational cdof and its velocity product)."""
    m, d, model = ant
    import dataclasses

    m.opt.disableflags |= mujoco.mjtDisableBit.mjDSBL_CONSTRAINT
    limited = model.jnt_limited.copy()
    model.jnt_limited[:] = False
    try:
        rng = np.random.RandomState(0)
        fwd = jax.jit(lambda q, v, c: engine.forward(model, q, v, c))
        for _ in range(6):
            qpos = m.qpos0.copy()
            qpos[:3] += rng.uniform(-0.5, 0.5, 3)
            quat = rng.randn(4)
            qpos[3:7] = quat / np.linalg.norm(quat)
            qpos[7:] = rng.uniform(-0.5, 0.5, 8)
            qvel = rng.uniform(-2, 2, m.nv)
            ctrl = rng.uniform(-30, 30, 8)
            d.qpos[:] = qpos
            d.qvel[:] = qvel
            d.ctrl[:] = ctrl
            mujoco.mj_forward(m, d)
            qacc = np.asarray(
                fwd(jnp.asarray(qpos), jnp.asarray(qvel), jnp.asarray(ctrl))
            )
            np.testing.assert_allclose(qacc, d.qacc, rtol=1e-9, atol=1e-9)
    finally:
        model.jnt_limited[:] = limited
        m.opt.disableflags &= ~int(mujoco.mjtDisableBit.mjDSBL_CONSTRAINT)


def _contact_step(model):
    cset = contact.build_contact_set(model)
    _, chain_mask, _, _ = engine.get_masks(model)

    def extra_cb(kd, qacc0, Minv, qvel_now):
        return contact.contact_qfrc(
            model, cset, kd, qvel_now, qacc0, Minv, chain_mask
        )

    return jax.jit(lambda q, v, c: engine.rk4_step(model, q, v, c, extra_qfrc=extra_cb))


def test_ant_drop_tracks_mujoco_through_transient(ant):
    """First 10 steps of a free drop match MuJoCo to ~1e-3 (contacts +
    out-of-range ankle limits active from step 0)."""
    m, d, model = ant
    step = _contact_step(model)
    mujoco.mj_resetData(m, d)
    d.qpos[:] = m.qpos0
    mujoco.mj_forward(m, d)
    q = jnp.asarray(m.qpos0.copy())
    v = jnp.zeros(14)
    for t in range(10):
        d.ctrl[:] = 0
        mujoco.mj_step(m, d)
        q, v = step(q, v, jnp.zeros(8))
        np.testing.assert_allclose(
            np.asarray(q), d.qpos, atol=5e-3, err_msg=f"t={t}"
        )


def test_ant_settles_near_mujoco_equilibrium(ant):
    """After the (chaotic) bounce, both engines rest standing at similar
    height with bent legs."""
    m, d, model = ant
    step = _contact_step(model)
    mujoco.mj_resetData(m, d)
    d.qpos[:] = m.qpos0
    mujoco.mj_forward(m, d)
    q = jnp.asarray(m.qpos0.copy())
    v = jnp.zeros(14)
    for _ in range(200):
        d.ctrl[:] = 0
        mujoco.mj_step(m, d)
        q, v = step(q, v, jnp.zeros(8))
    assert abs(float(q[2]) - d.qpos[2]) < 0.06          # standing height
    assert abs(float(jnp.linalg.norm(v))) < 0.2         # at rest
    assert float(q[8]) > 0.55                           # legs bent (not splayed)


def test_ant_holds_static_equilibrium(ant):
    """Starting from MuJoCo's settled pose, the contact solver holds it."""
    m, d, model = ant
    step = _contact_step(model)
    mujoco.mj_resetData(m, d)
    d.qpos[:] = m.qpos0
    mujoco.mj_forward(m, d)
    for _ in range(200):
        d.ctrl[:] = 0
        mujoco.mj_step(m, d)
    q = jnp.asarray(d.qpos.copy())
    v = jnp.asarray(d.qvel.copy())
    z0 = float(q[2])
    for _ in range(100):
        q, v = step(q, v, jnp.zeros(8))
    assert abs(float(q[2]) - z0) < 0.06
