"""Scalar-component ant pipeline (`ops/ant_math`) vs the generic engine.

The closed-form path re-derives ant_v3 dynamics (reference
`ant_maze_env.py` robot, MuJoCo `ant.xml`) as per-dof scalar lane math so
the whole step fuses into one Pallas kernel.  These tests pin it against
the generic Featherstone engine (`physics/engine.py`), which is itself
validated against MuJoCo 3.10 goldens in test_engine/test_ant.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mujoco_maze_tpu as mmt
from mujoco_maze_tpu.ops.ant_math import (
    consts_from_model,
    forward_ant,
    fk_ant,
    integrate_ant,
    rk4_step_ant,
    world_from_spec,
)
from mujoco_maze_tpu.physics import contact as _cm
from mujoco_maze_tpu.physics import engine as eng


@pytest.fixture(scope="module")
def ant_setup():
    env = mmt.make_batched("AntUMaze-v0", num_envs=4, auto_reset=False)
    spec = env.spec
    ac = consts_from_model(spec.dynamic_model)
    aw = world_from_spec(spec)
    return env, spec, ac, aw


def _rand_state(spec, key, scale_v=0.3):
    kq, kv = jax.random.split(key)
    qpos = jnp.asarray(spec.dynamic_model.qpos0) + jax.random.uniform(
        kq, (15,), minval=-0.08, maxval=0.08
    )
    quat = qpos[3:7] / jnp.linalg.norm(qpos[3:7])
    qpos = qpos.at[3:7].set(quat)
    qvel = jax.random.normal(kv, (14,)) * scale_v
    return qpos, qvel


def _cols(x):
    return tuple(x[i][None] for i in range(x.shape[0]))


def test_forward_matches_engine(ant_setup):
    from mujoco_maze_tpu.physics import contact as contact_mod

    env, spec, ac, aw = ant_setup
    model = spec.dynamic_model
    cset = spec.contact_set
    _, chain_mask, _, _ = eng.get_masks(model)

    def extra_cb(kd, qacc0, Minv, qvel_now):
        qfrc = contact_mod.contact_qfrc(
            model, cset, kd, qvel_now, qacc0, Minv, chain_mask
        )
        return qfrc + spec.engine_support_qfrc(kd, qacc0, Minv, qvel_now)

    for seed in range(3):
        qpos, qvel = _rand_state(spec, jax.random.PRNGKey(seed))
        ctrl = jax.random.uniform(
            jax.random.PRNGKey(100 + seed), (8,), minval=-30, maxval=30
        )
        qacc_ref = eng.forward(model, qpos, qvel, ctrl, extra_qfrc=extra_cb)
        qacc = forward_ant(
            ac, aw, _cols(qpos), _cols(qvel), _cols(ctrl), solver_iters=_cm.CONTACT_SOLVER_ITERS
        )
        qacc = jnp.stack([a[0] for a in qacc])
        err = float(jnp.abs(qacc - qacc_ref[:14]).max())
        rel = err / (1.0 + float(jnp.abs(qacc_ref).max()))
        assert rel < 5e-5, f"seed {seed}: rel err {rel}"


def test_fk_matches_engine(ant_setup):
    env, spec, ac, aw = ant_setup
    model = spec.dynamic_model
    qpos, _ = _rand_state(spec, jax.random.PRNGKey(7))
    fk_ref = eng.fk(model, qpos)
    fk = fk_ant(ac, _cols(qpos))
    for b in range(13):
        ref_p = fk_ref.body_pos[b]
        got = jnp.asarray([fk.pos[b].x[0], fk.pos[b].y[0], fk.pos[b].z[0]])
        assert float(jnp.abs(got - ref_p).max()) < 1e-5, f"body {b}"


def test_integrate_quat_norm(ant_setup):
    env, spec, ac, aw = ant_setup
    qpos, qvel = _rand_state(spec, jax.random.PRNGKey(3), scale_v=2.0)
    q2 = integrate_ant(_cols(qpos), _cols(qvel), np.float32(0.01))
    nrm = np.sqrt(sum(float(q2[i][0]) ** 2 for i in range(3, 7)))
    assert abs(nrm - 1.0) < 1e-6


def test_trajectory_matches_env(ant_setup):
    """One full env step (5 RK4 substeps, contacts active) stays glued to
    the generic-engine env path."""
    env, spec, ac, aw = ant_setup
    state, _ = env.reset(jax.random.PRNGKey(0))
    qpos = state.qpos[0]
    qvel = state.qvel[0]
    q = _cols(qpos)
    v = _cols(qvel)
    rng = np.random.RandomState(0)
    def step_fn(q, v, c):
        return rk4_step_ant(ac, aw, q, v, c, solver_iters=_cm.CONTACT_SOLVER_ITERS)
    for step in range(1):
        ctrl = jnp.asarray(rng.uniform(-30, 30, (4, 8)), jnp.float32)
        res = env.step(state, ctrl)
        state = res.state
        cc = _cols(ctrl[0])
        for _ in range(spec.robot.frame_skip):
            q, v = step_fn(q, v, cc)
    ref_q = np.asarray(state.qpos[0])
    got_q = np.asarray([q[i][0] for i in range(15)])
    assert np.abs(got_q - ref_q).max() < 5e-4


def test_kernel_spec_guards():
    """The fused kernel covers maze, movable-block AND object-ball worlds
    (every registered Ant env ID)."""
    from mujoco_maze_tpu.ops import ant_pallas as ap

    env = mmt.make_batched("AntSmallBilliard-v0", num_envs=2)
    es = ap.spec_from_env(env.spec)
    assert es.nq == 22 and es.nv == 20 and len(es.aw.balls) == 1
    assert es.aw.balls[0].qadr == 15 and es.aw.balls[0].vadr == 14
    assert es.obs_offset == 3  # Billiard heads anchor on the ball
    # block worlds (AntPush/AntFall — the BASELINE benchmark configs) build
    env = mmt.make_batched("AntPush-v0", num_envs=2)
    es = ap.spec_from_env(env.spec)
    assert es.nq == 17 and es.nv == 16 and len(es.aw.blocks) == 1


@pytest.mark.parametrize("env_id", ["AntPush-v0", "AntFall-v0"])
def test_block_forward_matches_engine(env_id):
    """Block-world forward dynamics (sphere-vs-moving-box contacts, slide
    travel limits, falling-block floor support) vs the generic engine.

    Reference analog: the movable-block world synthesis at
    `maze_env.py:563-633` is first-class for Ant (AntPush/AntFall)."""
    from mujoco_maze_tpu.physics import contact as contact_mod

    env = mmt.make_batched(env_id, num_envs=2, auto_reset=False)
    spec = env.spec
    ac = consts_from_model(spec.dynamic_model)
    aw = world_from_spec(spec)
    model = spec.dynamic_model
    cset = spec.contact_set
    _, chain_mask, _, _ = eng.get_masks(model)

    def extra_cb(kd, qacc0, Minv, qvel_now):
        qfrc = contact_mod.contact_qfrc(
            model, cset, kd, qvel_now, qacc0, Minv, chain_mask
        )
        return qfrc + spec.engine_support_qfrc(kd, qacc0, Minv, qvel_now)

    rng = np.random.RandomState(0)
    for seed in range(2):
        qpos = np.asarray(spec.dynamic_model.qpos0, np.float64).copy()
        qpos[:15] += rng.uniform(-0.08, 0.08, 15)
        qpos[3:7] /= np.linalg.norm(qpos[3:7])
        qpos[15:] += rng.uniform(-0.05, 0.05, spec.nq - 15)
        qvel = rng.randn(spec.nv) * 0.3
        ctrl = rng.uniform(-30, 30, 8)
        qpos, qvel, ctrl = jnp.asarray(qpos), jnp.asarray(qvel), jnp.asarray(ctrl)
        qacc_ref = eng.forward(model, qpos, qvel, ctrl, extra_qfrc=extra_cb)
        qacc = forward_ant(
            ac, aw, _cols(qpos), _cols(qvel), _cols(ctrl), solver_iters=_cm.CONTACT_SOLVER_ITERS
        )
        qacc = jnp.stack([a[0] for a in qacc])
        err = float(jnp.abs(qacc - qacc_ref).max())
        rel = err / (1.0 + float(jnp.abs(qacc_ref).max()))
        # 1e-4 (vs the 5e-5 smooth-path bound): the round-5 coupled
        # platform support (contact.falling_support_force) is near-rigid
        # (k ~ 628/s^2), so the ~1e-7 f32 difference between the engine's
        # FK-accumulated block height and the kernel's direct q[z] read
        # amplifies to ~7e-5 in qacc at the deep-overlap reset state
        assert rel < 1e-4, f"seed {seed}: rel err {rel}"


def test_ball_forward_matches_engine():
    """Ball-world forward dynamics (AntSmallBilliard: free-jointed sphere —
    6x6 mass block, gravity/gyroscopic bias, ball-vs-floor/wall contacts and
    all 37 robot-sphere-vs-ball pair rows) vs the generic engine.

    Reference analog: the freejoint object-ball synthesis at
    `maze_env.py:539-560` (Ant's OBJBALL_TYPE)."""
    from mujoco_maze_tpu.physics import contact as contact_mod

    spec = mmt.make_spec("AntSmallBilliard-v0")
    model = spec.dynamic_model
    cset = spec.contact_set
    _, chain_mask, _, _ = eng.get_masks(model)
    ac = consts_from_model(model)
    aw = world_from_spec(spec)
    assert len(aw.balls) == 1 and not aw.blocks

    def extra_cb(kd, qacc0, Minv, qvel_now):
        qfrc = contact_mod.contact_qfrc(
            model, cset, kd, qvel_now, qacc0, Minv, chain_mask
        )
        return qfrc + spec.engine_support_qfrc(kd, qacc0, Minv, qvel_now)

    rng = np.random.RandomState(0)
    for trial in range(3):
        qpos = np.asarray(model.qpos0, np.float64).copy()
        qpos[:15] += rng.uniform(-0.08, 0.08, 15)
        qpos[3:7] /= np.linalg.norm(qpos[3:7])
        if trial == 0:
            # ball overlapping the robot → pair rows active
            qpos[15:17] = qpos[:2] + rng.uniform(-0.5, 0.5, 2)
        else:
            qpos[15:17] += rng.uniform(-0.5, 0.5, 2)
        qpos[17] = 0.4 + rng.uniform(-0.05, 0.1)
        bq = rng.randn(4)
        qpos[18:22] = bq / np.linalg.norm(bq)
        qvel = rng.randn(20) * 0.3
        ctrl = rng.uniform(-30, 30, 8)
        qpos, qvel, ctrl = (jnp.asarray(qpos), jnp.asarray(qvel),
                            jnp.asarray(ctrl))
        qacc_ref = eng.forward(model, qpos, qvel, ctrl, extra_qfrc=extra_cb)
        qacc = forward_ant(
            ac, aw, _cols(qpos), _cols(qvel), _cols(ctrl), solver_iters=_cm.CONTACT_SOLVER_ITERS
        )
        qacc = jnp.stack([a[0] for a in qacc])
        rel = float(jnp.abs(qacc - qacc_ref).max()) / (
            1.0 + float(jnp.abs(qacc_ref).max()))
        assert rel < 5e-5, f"trial {trial}: rel err {rel}"


def test_block_trajectory_matches_env():
    """One full AntPush env step (contacts + block coupling active) stays
    glued to the generic-engine env path."""
    env = mmt.make_batched("AntPush-v0", num_envs=2, auto_reset=False)
    spec = env.spec
    ac = consts_from_model(spec.dynamic_model)
    aw = world_from_spec(spec)
    state, _ = env.reset(jax.random.PRNGKey(0))
    q = _cols(state.qpos[0])
    v = _cols(state.qvel[0])
    rng = np.random.RandomState(0)
    ctrl = jnp.asarray(rng.uniform(-30, 30, (2, 8)), jnp.float32)
    res = env.step(state, ctrl)
    cc = _cols(ctrl[0])
    for _ in range(spec.robot.frame_skip):
        q, v = rk4_step_ant(ac, aw, q, v, cc, solver_iters=_cm.CONTACT_SOLVER_ITERS)
    ref_q = np.asarray(res.state.qpos[0])
    got_q = np.asarray([q[i][0] for i in range(spec.nq)])
    assert np.abs(got_q - ref_q).max() < 5e-4


@pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="ant kernel interpret mode is impractically slow on CPU; "
    "validated on TPU (qpos 5e-5 / qvel 5e-4 vs f64 engine truth, "
    "60-90x tighter than the f32 XLA env path)",
)
@pytest.mark.parametrize("env_id", ["AntUMaze-v0", "AntPush-v0"])
def test_step_kernel_tpu_differential(env_id):
    from mujoco_maze_tpu.ops import ant_pallas as ap

    B = 256
    env = mmt.make_batched(env_id, num_envs=B, auto_reset=False)
    es = ap.spec_from_env(env.spec, solver_iters=_cm.CONTACT_SOLVER_ITERS)
    step_k = ap.build_step_kernel(es, B, tile=B)
    state, _ = env.reset(jax.random.PRNGKey(0))
    actions = jnp.asarray(
        np.random.RandomState(0).uniform(-30, 30, (B, 8)), jnp.float32
    )
    qp, qv, tt, rew, term = step_k(state.qpos, state.qvel, state.t, actions)
    res = env.step(state, actions)
    assert float(jnp.abs(qp - res.state.qpos).max()) < 5e-3
    assert float(jnp.abs(rew - res.reward).max()) < 1e-3
    assert bool((term == res.terminated).all())
    assert bool((tt == res.state.t).all())
