"""Kinematic ball robot ("Point").

TPU-native port of the reference PointEnv
(`/root/reference/mujoco_maze/point.py`): 2 actions (forward gain, rotation
delta), direct qpos integration, velocity clipping, manual wall collision
(owned by the env layer).  The reference additionally calls ``mj_step`` once
per step (point.py:58-59); measured against MuJoCo 3 that residual is exactly
``qpos += qvel * dt`` plus a small contact-friction decay of the slide
velocities (the ball's sphere rests on the floor plane), which we model with
a calibrated multiplicative decay — millimeter-scale relative to the
kinematic action updates.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .base import Robot


class PointRobot(Robot):
    NAME = "Point"
    MANUAL_COLLISION = True
    ORI_IND = 2
    RADIUS = 0.4
    OBJBALL_TYPE = "hinge"

    VELOCITY_LIMITS: float = 10.0

    nq = 3  # slide x, slide y, hinge rot  (point.xml:29-31)
    nv = 3
    action_dim = 2
    frame_skip = 1      # point.py:42
    timestep = 0.02     # point.xml:3
    obs_dim = 6         # qpos[:3] + qvel[:3]  (point.py:63-69)

    # Contact-friction decay of slide qvel per mj_step, calibrated against
    # MuJoCo 3 rollouts of assets/point.xml (see tests/test_point_golden.py).
    FRICTION_DECAY: float = 0.10
    # Wall-contact ejection: the body sphere (0.5, point.xml:22) is larger
    # than the manual-collision inflation RADIUS (0.4, point.py:31), so
    # pressing against a wall overlaps the geoms by up to 0.1 and MuJoCo
    # ejects with a large outward qvel.  margin = 0.5 - RADIUS; gain
    # calibrated on goldens.
    WALL_CONTACT_MARGIN: float = 0.1
    WALL_EJECT_GAIN: float = 2.0

    def action_bounds(self) -> Tuple[np.ndarray, np.ndarray]:
        # Dummy-actuator ctrl ranges (point.xml:29-32).
        high = np.array([1.0, 0.25], dtype=np.float64)
        return -high, high

    def init_qpos(self, height_offset: float) -> np.ndarray:
        return np.zeros(3, dtype=np.float64)

    def obs_bounds(self) -> Tuple[np.ndarray, np.ndarray]:
        # point.py:37-41
        high = np.full(6, np.inf, dtype=np.float64)
        high[3:] = self.VELOCITY_LIMITS * 1.2
        high[self.ORI_IND] = np.pi
        return -high, high

    def reset_noise(self, key, nq_total, nv_total):
        # point.py:71-75: qpos ~ U(-0.1, 0.1); qvel ~ U(0, 0.1).
        kq, kv = jax.random.split(key)
        qpos_noise = jax.random.uniform(kq, (nq_total,), minval=-0.1, maxval=0.1)
        qvel_noise = jax.random.uniform(kv, (nv_total,), minval=0.0, maxval=0.1)
        return qpos_noise, qvel_noise

    ZERO_WORLD_DOFS_ON_RESET = True  # point.py:78-79

    def kinematic_step(
        self, qpos: jnp.ndarray, qvel: jnp.ndarray, action: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """The reference's direct qpos write + velocity clip (point.py:44-57).

        Operates on the robot's leading 3 dofs of the full state; clips the
        FULL qvel (the reference clips ``self.data.qvel`` wholesale).
        """
        ori = qpos[2] + action[1]
        # Single-branch wrap (point.py:48-51) — not a modulo.
        ori = jnp.where(ori < -jnp.pi, ori + 2 * jnp.pi, ori)
        ori = jnp.where(ori > jnp.pi, ori - 2 * jnp.pi, ori)
        qpos = qpos.at[2].set(ori)
        qpos = qpos.at[0].add(jnp.cos(ori) * action[0])
        qpos = qpos.at[1].add(jnp.sin(ori) * action[0])
        qvel = jnp.clip(qvel, -self.VELOCITY_LIMITS, self.VELOCITY_LIMITS)
        return qpos, qvel

    def residual_step(
        self, qpos: jnp.ndarray, qvel: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """The mj_step residual: drift by qvel, decay slide qvel by friction."""
        qpos = qpos.at[:3].add(qvel[:3] * self.timestep)
        decay = 1.0 - self.FRICTION_DECAY
        qvel = qvel.at[0].mul(decay)
        qvel = qvel.at[1].mul(decay)
        return qpos, qvel

    def observe(self, qpos: jnp.ndarray, qvel: jnp.ndarray) -> jnp.ndarray:
        return jnp.concatenate([qpos[:3], qvel[:3]])

    def get_ori(self, qpos: jnp.ndarray) -> jnp.ndarray:
        return qpos[self.ORI_IND]
