"""SPIN block dynamics (PUT_SPIN_NEAR_AGENT hook).

No stock task enables it (the reference marks it "Unused now",
maze_task.py:66), but the hook is part of the task contract: a thin
near-massless box on an undamped rotary joint placed on the robot's cell
(maze_env.py:563-578,649-660; our synthesis: maze/structure.py,
envs/env.py _spin_blocks).  The tests pin the z-hinge reduction's physics
invariants: torque sign from the lever arm, no-contact persistence, zero
state without contact, and engine-path (Ant) construction.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_maze_tpu.envs.env import MazeEnvSpec
from mujoco_maze_tpu.models.point import PointRobot
from mujoco_maze_tpu.tasks.library import GoalRewardSimpleRoom


class SpinRoom(GoalRewardSimpleRoom):
    PUT_SPIN_NEAR_AGENT = True
    OBSERVE_BLOCKS = True


def _spec():
    return MazeEnvSpec(PointRobot(), SpinRoom, maze_size_scaling=4.0)


def _place(spec, state, x, y):
    qpos = jnp.zeros_like(state.qpos).at[0].set(x).at[1].set(y)
    return state._replace(qpos=qpos, qvel=jnp.zeros_like(state.qvel))


def test_spin_block_built():
    spec = _spec()
    (b,) = spec.block_runtimes
    assert b.spin and b.qpos_idx[3] >= 0
    # reference geometry: offset +0.25*scale, half extent 0.05*scale
    assert np.allclose(np.asarray(b.body_pos)[:2], [1.0, 0.0])
    assert np.isclose(float(b.half[0]), 0.2)
    # spin block is observed as a block com (OBSERVE_BLOCKS):
    # 6 robot dims + 3 block dims + 1 time channel
    assert spec.obs_dim == 6 + 3 + 1


def test_spin_torque_sign_and_persistence():
    spec = _spec()
    state0, _ = spec.reset(jax.random.PRNGKey(0))
    step = jax.jit(spec.step)
    idx = spec.block_runtimes[0].qpos_idx[3]

    # robot above the block center moving +x → clockwise (negative) spin
    st = _place(spec, state0, 0.45, 0.12)
    for _ in range(4):
        st = step(st, jnp.asarray([0.9, 0.0], jnp.float32)).state
    om_above = float(st.qvel[idx])
    assert om_above < -1e-3, f"expected cw spin, got {om_above}"

    # mirrored approach → counter-clockwise
    st = _place(spec, state0, 0.45, -0.12)
    for _ in range(4):
        st = step(st, jnp.asarray([0.9, 0.0], jnp.float32)).state
    om_below = float(st.qvel[idx])
    assert om_below > 1e-3

    # contact ended (robot driven away): ω persists undamped, θ integrates
    om0 = float(st.qvel[idx])
    th0 = float(st.qpos[idx])
    st = st._replace(qpos=st.qpos.at[0].set(-1.2).at[1].set(0.0))
    st2 = step(st, jnp.asarray([0.0, 0.0], jnp.float32)).state
    assert np.isclose(float(st2.qvel[idx]), om0)
    assert np.isclose(float(st2.qpos[idx]), th0 + om0 * spec.robot.dt,
                      atol=1e-6)


def test_spin_untouched_stays_zero():
    spec = _spec()
    state0, _ = spec.reset(jax.random.PRNGKey(0))
    step = jax.jit(spec.step)
    idx = spec.block_runtimes[0].qpos_idx[3]
    st = _place(spec, state0, -1.5, 0.0)
    for _ in range(5):
        st = step(st, jnp.asarray([-0.3, 0.2], jnp.float32)).state
    assert float(st.qpos[idx]) == 0.0
    assert float(st.qvel[idx]) == 0.0


def test_spin_direction_matches_mujoco():
    """Behavior-class differential vs real MuJoCo: an off-center strike
    spins the reference's ball-jointed plate the same direction as our
    z-hinge rolling-contact model (sign of ω_z).  Magnitudes are not
    comparable — the reference block can also tumble about x/y and the
    contact is a soft penetration, so this pins the torque sign only."""
    import xml.etree.ElementTree as ET

    mujoco = __import__("pytest").importorskip("mujoco")
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import golden_gen as gg

    from mujoco_maze_tpu.maze.structure import analyze_maze

    task = SpinRoom(4.0)
    ms = analyze_maze(task.create_maze(), 4.0, 0.5, True)
    root = gg._point_skeleton()
    gg._add_world_geoms(root, ms, objball_type="hinge")
    model = mujoco.MjModel.from_xml_string(ET.tostring(root, encoding="unicode"))
    (blk,) = ms.movable_blocks
    jadr = model.joint(f"spin_{blk.name}").dofadr[0]

    def mj_spin(y_off):
        data = mujoco.MjData(model)
        data.qpos[0], data.qpos[1], data.qpos[2] = 0.3, y_off, 0.0
        mujoco.mj_forward(model, data)
        for _ in range(6):
            q = data.qpos.copy()
            q[0] += 0.15  # heading 0, forward action 0.15 (point.py:44-57)
            data.qpos[:] = q
            data.qvel[:] = np.clip(data.qvel, -10, 10)
            mujoco.mj_step(model, data)
        return float(data.qvel[jadr + 2])  # ball-joint ω_z

    spec = _spec()
    state0, _ = spec.reset(jax.random.PRNGKey(0))
    step = jax.jit(spec.step)
    idx = spec.block_runtimes[0].qpos_idx[3]

    def ours_spin(y_off):
        st = _place(spec, state0, 0.3, y_off)
        for _ in range(6):
            st = step(st, jnp.asarray([0.15, 0.0], jnp.float32)).state
        return float(st.qvel[idx])

    for y in (0.12, -0.12):
        mj = mj_spin(y)
        us = ours_spin(y)
        assert abs(mj) > 1e-4 and abs(us) > 1e-4, (y, mj, us)
        assert np.sign(mj) == np.sign(us), (y, mj, us)


def test_spin_engine_world_ant():
    """Ant path: the spin block lowers to a ball-jointed engine body
    (envs/env.py _build_engine_world) and the composed world steps."""
    from mujoco_maze_tpu.models.ant import AntRobot

    class AntSpinRoom(GoalRewardSimpleRoom):
        PUT_SPIN_NEAR_AGENT = True
        MAZE_SIZE_SCALING = GoalRewardSimpleRoom.MAZE_SIZE_SCALING

    spec = MazeEnvSpec(AntRobot(), AntSpinRoom, maze_size_scaling=8.0)
    assert spec.dynamic_model is not None
    state, obs = spec.reset(jax.random.PRNGKey(0))
    res = jax.jit(spec.step)(
        state, jnp.zeros(spec.action_bounds()[0].shape, jnp.float32))
    assert np.isfinite(np.asarray(res.obs)).all()
