"""3-link planar swimmer.

TPU-native port of the reference SwimmerEnv
(`/root/reference/mujoco_maze/swimmer.py` + `assets/swimmer.xml`): slide-x,
slide-y, hinge chain with viscous fluid drag (viscosity 0.1, fluid density
4000), RK4 at dt=0.01 × frame_skip 4, gear-150 actuators on the two tail
hinges.  Dynamics run on the in-repo rigid-body engine
(:mod:`mujoco_maze_tpu.physics.engine`), differentially validated against
MuJoCo 3 (tests/test_engine.py).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..physics import engine
from ..physics.model import (
    HINGE,
    SLIDE,
    Actuator,
    Body,
    Geom,
    Joint,
    build_model,
)
from .base import Robot

_DEG = np.pi / 180.0


def build_swimmer_model():
    """Content parity: assets/swimmer.xml."""
    torso = Body(
        name="torso",
        parent=-1,
        pos=(0.0, 0.0, 0.0),
        joints=[
            Joint(SLIDE, axis=(1, 0, 0), armature=0.1, name="slider1"),
            Joint(SLIDE, axis=(0, 1, 0), armature=0.1, name="slider2"),
            Joint(HINGE, axis=(0, 0, 1), armature=0.1, name="rot"),
        ],
        geoms=[Geom.capsule_fromto((1.5, 0, 0), (0.5, 0, 0), 0.1, density=1000.0)],
    )
    mid = Body(
        name="mid",
        parent=0,
        pos=(0.5, 0.0, 0.0),
        joints=[
            Joint(
                HINGE,
                axis=(0, 0, 1),
                armature=0.1,
                limited=True,
                range=(-100 * _DEG, 100 * _DEG),
                name="rot2",
            )
        ],
        geoms=[Geom.capsule_fromto((0, 0, 0), (-1, 0, 0), 0.1, density=1000.0)],
    )
    back = Body(
        name="back",
        parent=1,
        pos=(-1.0, 0.0, 0.0),
        joints=[
            Joint(
                HINGE,
                axis=(0, 0, 1),
                armature=0.1,
                limited=True,
                range=(-100 * _DEG, 100 * _DEG),
                name="rot3",
            )
        ],
        geoms=[Geom.capsule_fromto((0, 0, 0), (-1, 0, 0), 0.1, density=1000.0)],
    )
    return build_model(
        [torso, mid, back],
        [
            Actuator("rot2", gear=150.0, ctrlrange=(-1, 1)),
            Actuator("rot3", gear=150.0, ctrlrange=(-1, 1)),
        ],
        timestep=0.01,
        viscosity=0.1,
        fluid_density=4000.0,
    )


class SwimmerRobot(Robot):
    NAME = "Swimmer"
    MANUAL_COLLISION = False
    ORI_IND = 2
    RADIUS = None
    OBJBALL_TYPE = None

    nq = 5
    nv = 5
    action_dim = 2
    frame_skip = 4      # swimmer.py:30
    timestep = 0.01     # swimmer.xml:3
    obs_dim = 10        # full qpos + qvel (swimmer.py:49-53)

    FORWARD_REWARD_WEIGHT = 1.0   # swimmer.py:23
    CTRL_COST_WEIGHT = 1e-4       # swimmer.py:24

    def __init__(self) -> None:
        self.model = engine.prepare(build_swimmer_model())

    def action_bounds(self) -> Tuple[np.ndarray, np.ndarray]:
        high = np.ones(self.action_dim, dtype=np.float64)
        return -high, high

    def init_qpos(self, height_offset: float) -> np.ndarray:
        return self.model.qpos0[: self.nq].copy()

    def obs_bounds(self) -> Tuple[np.ndarray, np.ndarray]:
        high = np.full(self.obs_dim, np.inf, dtype=np.float64)
        return -high, high

    def reset_noise(self, key, nq_total, nv_total):
        # swimmer.py:55-68: both qpos and qvel ~ U(-0.1, 0.1); world dofs
        # noised too (no zeroing in the reference).
        kq, kv = jax.random.split(key)
        qpos_noise = jax.random.uniform(kq, (nq_total,), minval=-0.1, maxval=0.1)
        qvel_noise = jax.random.uniform(kv, (nv_total,), minval=-0.1, maxval=0.1)
        return qpos_noise, qvel_noise

    ZERO_WORLD_DOFS_ON_RESET = False

    USE_CLOSED_FORM = True  # ops/swimmer_math (engine-exact, ~14x faster)

    def dynamics_step(self, spec, qpos, qvel, action):
        """frame_skip RK4 steps on the robot dofs (world dofs static for
        swimmer mazes — no OBSERVE_BLOCKS task registers a swimmer).

        Uses the closed-form planar dynamics (ops/swimmer_math, validated
        against the generic engine to 1e-12) unless USE_CLOSED_FORM is
        cleared for debugging."""
        ctrl = jnp.asarray(action, qpos.dtype)
        q, v = qpos[: self.nq], qvel[: self.nv]
        if self.USE_CLOSED_FORM and self.nq in (4, 5):
            from ..ops import swimmer_math as sw

            if not hasattr(self, "_ks"):
                self._ks = sw.spec_from_model(self.model)
            ctrl_t = tuple(ctrl[i] for i in range(self.action_dim))

            def body(carry, _):
                qt, vt = carry
                qt, vt = sw.rk4_step_swimmer(self._ks, qt, vt, ctrl_t)
                return (qt, vt), None

            (qt, vt), _ = jax.lax.scan(
                body,
                (
                    tuple(q[i] for i in range(self.nq)),
                    tuple(v[i] for i in range(self.nv)),
                ),
                None,
                length=self.frame_skip,
            )
            q = jnp.stack(qt)
            v = jnp.stack(vt)
        else:
            for _ in range(self.frame_skip):
                q, v = engine.rk4_step(self.model, q, v, ctrl)
        qpos = qpos.at[: self.nq].set(q)
        qvel = qvel.at[: self.nv].set(v)
        return qpos, qvel

    def inner_reward_terms(self, xy_before, xy_after, action):
        # swimmer.py:32-47: forward_reward_vnorm − ctrl cost; terms exposed
        # for info["reward_forward"/"reward_ctrl"] parity (swimmer.py:44-47).
        # (reward_forward is the UNWEIGHTED value in the reference dict)
        vel = (xy_after - xy_before) / self.dt
        forward = jnp.sqrt(jnp.sum(vel * vel))
        ctrl_cost = self.CTRL_COST_WEIGHT * jnp.sum(action * action)
        return forward, ctrl_cost

    def inner_reward(self, xy_before, xy_after, action):
        forward, ctrl_cost = self.inner_reward_terms(xy_before, xy_after, action)
        return self.FORWARD_REWARD_WEIGHT * forward - ctrl_cost

    def observe(self, qpos: jnp.ndarray, qvel: jnp.ndarray) -> jnp.ndarray:
        return jnp.concatenate([qpos[: self.nq], qvel[: self.nv]])

    def get_ori(self, qpos: jnp.ndarray) -> jnp.ndarray:
        return qpos[self.ORI_IND]
