"""Kinematic ball robot ("Point").

TPU-native port of the reference PointEnv
(`/root/reference/mujoco_maze/point.py`): 2 actions (forward gain, rotation
delta), direct qpos integration, velocity clipping, manual wall collision
(owned by the env layer).  The reference additionally calls ``mj_step`` once
per step (point.py:58-59); probed against MuJoCo 3 that residual is exactly
``qpos += qvel * dt`` plus the centrifugal slide acceleration from the
off-axis COM under hinge spin (closed form below), plus — only when the body
sphere overlaps a wall — the impedance ejection response modeled in
``ops/segments.impedance_eject``.  All constants are derived from the model,
none calibrated.
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
    # float64 specs route the residual through the exact mj_step replica
    # (physics/point_world.py); float32 keeps the closed-form fast path.
    USES_POINT_WORLD = True

    VELOCITY_LIMITS: float = 10.0

    nq = 3  # slide x, slide y, hinge rot  (point.xml:29-31)
    nv = 3
    action_dim = 2
    frame_skip = 1      # point.py:42
    timestep = 0.02     # point.xml:3
    obs_dim = 6         # qpos[:3] + qvel[:3]  (point.py:63-69)

    # --- derived mj_step residual constants (no calibration) -----------
    # Probing MuJoCo 3 on the composed world shows the floor contact exerts
    # NO force on the slide dofs (z is not a dof, dist stays exactly 0, so
    # the normal force — and with it sliding friction — is zero): slide
    # velocities persist exactly.  The only smooth residual is the
    # centrifugal coupling from the hinge spin, because the arrow box
    # (1.0x0.2x0.2 @ x=+0.6, point.xml:23) puts the COM off the rotation
    # axis:  m_sphere = rho*(4/3)*pi*0.5^3 = 52.360, m_box = rho*0.04 = 4.0
    # (rho = 100, point.xml geom density) ->
    # r_com = m_box*0.6/(m_box+m_sphere) = 0.042584.
    COM_OFFSET: float = 4.0 * 0.6 / (4.0 + 100.0 * (4.0 / 3.0) * np.pi * 0.125)

    # Wall-contact ejection: the body sphere (0.5, point.xml:22) is larger
    # than the manual-collision inflation RADIUS (0.4, point.py:31), so
    # pressing against a wall overlaps the geoms by up to margin =
    # 0.5 - RADIUS.  MuJoCo's response is the critically damped impedance
    # map (ops/segments.impedance_eject) with rate lam = 1/tc_eff where
    # tc_eff = max(solref_tc, 2*dt) = max(0.02, 0.04) (solref default 0.02,
    # clamped by mjMINVAL rule to two timesteps) and slide friction mu = 1.0
    # (point.xml default friction).
    WALL_CONTACT_MARGIN: float = 0.1
    CONTACT_LAM: float = 1.0 / 0.04      # = 1/max(0.02, 2*0.02)
    CONTACT_MU: float = 1.0

    # Arrow-box wall contact (ops/segments.tip_impedance_eject): the box
    # reaches 1.1 past the body origin (pos 0.6 + half 0.5, point.xml:23) —
    # far beyond the 0.4 manual-collision radius — so pressing ori-first
    # into a wall produces large slide *and hinge* responses.  Leading
    # corners in body frame:
    ARROW_TIPS = ((1.1, 0.1), (1.1, -0.1))
    # Body mass matrix constants, derived from point.xml geom densities
    # (rho=100): m = m_sphere + m_box; slide-rot coupling a = m_box*0.6;
    # hinge inertia about origin I = 2/5*m_s*r² + m_b*(L²+W²)/12 + m_b*0.6²;
    # COM spin inertia I' = I - a²/m.  All probed equal to MuJoCo's qM.
    _M_SPH = 100.0 * (4.0 / 3.0) * np.pi * 0.125   # 52.35988
    _M_BOX = 100.0 * (1.0 * 0.2 * 0.2)             # 4.0
    BODY_MASS: float = _M_SPH + _M_BOX             # 56.35988
    COUPLE_ARM: float = _M_BOX * 0.6               # 2.4
    SPIN_INERTIA_PRIME: float = (
        0.4 * _M_SPH * 0.25 + _M_BOX * (1.0**2 + 0.2**2) / 12.0
        + _M_BOX * 0.6**2
    ) - (_M_BOX * 0.6) ** 2 / (_M_SPH + _M_BOX)    # 6.92045

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
        """The smooth mj_step residual, in closed form.

        Drift by qvel plus the exact centrifugal slide acceleration from the
        off-axis COM under hinge spin ``w``:  a(s) = w^2 * r_com *
        (cos(th + w s), sin(th + w s)), integrated analytically over the
        step (matches MuJoCo RK4 to ~1e-7 per step; see COM_OFFSET note).
        Slide velocities are NOT decayed — the floor contact is forceless
        (z is not a dof).  Wall-contact response lives in the env layer
        (ops/segments.impedance_eject).
        """
        dt = self.timestep
        th = qpos[2]
        w = qvel[2]
        r = self.COM_OFFSET
        # dv = w*r*[sin(th+w*dt)-sin(th)], -w*r*[cos(th+w*dt)-cos(th)]
        dvx = w * r * (jnp.sin(th + w * dt) - jnp.sin(th))
        dvy = -w * r * (jnp.cos(th + w * dt) - jnp.cos(th))
        # position drift: integral of v(s); centrifugal double integral
        #   dx = r*[cos(th)-cos(th+w*dt)] - w*r*sin(th)*dt  (and y analog)
        ddx = r * (jnp.cos(th) - jnp.cos(th + w * dt)) - w * r * jnp.sin(th) * dt
        ddy = r * (jnp.sin(th) - jnp.sin(th + w * dt)) + w * r * jnp.cos(th) * dt
        qpos = qpos.at[:3].add(qvel[:3] * dt)
        qpos = qpos.at[0].add(ddx)
        qpos = qpos.at[1].add(ddy)
        qvel = qvel.at[0].add(dvx)
        qvel = qvel.at[1].add(dvy)
        return qpos, qvel

    def observe(self, qpos: jnp.ndarray, qvel: jnp.ndarray) -> jnp.ndarray:
        return jnp.concatenate([qpos[:3], qvel[:3]])

    def get_ori(self, qpos: jnp.ndarray) -> jnp.ndarray:
        return qpos[self.ORI_IND]
