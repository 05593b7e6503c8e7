"""Quadruped "Ant" robot with contact dynamics.

TPU-native port of the reference AntEnv
(`/root/reference/mujoco_maze/ant.py` + `assets/ant.xml`): 13-body tree with
a free root, 8 torque-controlled hinges (ctrlrange ±30), RK4 at dt=0.02 ×
frame_skip 5.  Unlike Point/Swimmer, the ant interacts with the maze through
the engine's contact pipeline, so its dynamics run on the *composed* world
model (robot + movable objects + static maze geoms) built by the env spec.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..physics import engine
from ..physics.model import (
    FREE,
    HINGE,
    Actuator,
    Body,
    Geom,
    Joint,
    build_model,
)
from .base import Robot

_DEG = np.pi / 180.0

# shared geom params (ant.xml default class)
_GEOM = dict(
    density=5.0,
    friction=(1.0, 0.5, 0.5),
    solref=(0.02, 1.0),
    solimp=(0.8, 0.8, 0.01),
    margin=0.01,
    contype=1,
    conaffinity=0,
)


def build_ant_bodies(torso_z: float = 0.75) -> Tuple[List[Body], List[Actuator]]:
    """The 13-body ant tree (content parity: assets/ant.xml:21-68)."""

    def capsule(p2):
        return Geom.capsule_fromto((0, 0, 0), p2, 0.08, **_GEOM)

    bodies = [
        Body(
            name="torso",
            parent=-1,
            pos=(0.0, 0.0, torso_z),
            joints=[Joint(FREE, name="root")],
            geoms=[Geom(gtype=0, size=(0.25,), **_GEOM)],  # sphere
        )
    ]
    actuators: List[Actuator] = []
    # leg layout: (name suffix, xy sign pair, ankle axis, hip range, ankle range)
    legs = [
        ("1", (+1, +1), (-1, 1, 0), (30, 70)),    # front_left
        ("2", (-1, +1), (1, 1, 0), (-70, -30)),   # front_right
        ("3", (-1, -1), (-1, 1, 0), (-70, -30)),  # back
        ("4", (+1, -1), (1, 1, 0), (30, 70)),     # right_back
    ]
    for name, (sx, sy), ankle_axis, ankle_range in legs:
        base = len(bodies)
        bodies.append(
            Body(
                name=f"leg_{name}",
                parent=0,
                pos=(0.0, 0.0, 0.0),
                geoms=[capsule((0.2 * sx, 0.2 * sy, 0.0))],
            )
        )
        bodies.append(
            Body(
                name=f"aux_{name}",
                parent=base,
                pos=(0.2 * sx, 0.2 * sy, 0.0),
                joints=[
                    Joint(
                        HINGE,
                        axis=(0, 0, 1),
                        armature=1.0,
                        damping=1.0,
                        limited=True,
                        range=(-30 * _DEG, 30 * _DEG),
                        name=f"hip_{name}",
                    )
                ],
                geoms=[capsule((0.2 * sx, 0.2 * sy, 0.0))],
            )
        )
        bodies.append(
            Body(
                name=f"foot_{name}",
                parent=base + 1,
                pos=(0.2 * sx, 0.2 * sy, 0.0),
                joints=[
                    Joint(
                        HINGE,
                        axis=ankle_axis,
                        armature=1.0,
                        damping=1.0,
                        limited=True,
                        range=(ankle_range[0] * _DEG, ankle_range[1] * _DEG),
                        name=f"ankle_{name}",
                    )
                ],
                geoms=[capsule((0.4 * sx, 0.4 * sy, 0.0))],
            )
        )
    # actuator order parity (hip_4, ankle_4, hip_1, ... — ant.xml:71-78)
    actuators = [
        Actuator(f"{kind}_{name}", gear=1.0, ctrlrange=(-30.0, 30.0))
        for name in ("4", "1", "2", "3")
        for kind in ("hip", "ankle")
    ]
    return bodies, actuators


def build_ant_model(torso_z: float = 0.75):
    """Stand-alone ant (no maze) — used by engine differential tests."""
    bodies, actuators = build_ant_bodies(torso_z)
    return build_model(
        bodies,
        actuators,
        timestep=0.02,
        static_geoms=[Geom(gtype=3, size=(), pos=(0, 0, 0), contype=1, conaffinity=1,
                           friction=(1.0, 0.5, 0.5), solref=(0.02, 1.0),
                           solimp=(0.8, 0.8, 0.01), margin=0.01)],
    )


class AntRobot(Robot):
    NAME = "Ant"
    MANUAL_COLLISION = False
    ORI_IND = 3
    RADIUS = None
    OBJBALL_TYPE = "freejoint"
    USES_WORLD_ENGINE = True

    nq = 15
    nv = 14
    action_dim = 8
    frame_skip = 5      # ant.py:54
    timestep = 0.02     # ant.xml:3
    obs_dim = 29        # qpos[:15] + qvel[:14] (ant.py:75-82)

    FORWARD_REWARD_WEIGHT = 1.0   # ant.py:47
    CTRL_COST_WEIGHT = 1e-4       # ant.py:48
    CONTACT_MARGIN = 0.01         # ant.xml default geom margin
    # default-class geom params applied to world geoms composed into the
    # ant's model (the reference XML defaults propagate to maze geoms)
    WORLD_GEOM_DEFAULTS = dict(
        density=5.0,
        friction=(1.0, 0.5, 0.5),
        solref=(0.02, 1.0),
        solimp=(0.8, 0.8, 0.01),
        margin=0.01,
    )

    def build_bodies(self, torso_z: float = 0.75):
        return build_ant_bodies(torso_z)

    def action_bounds(self) -> Tuple[np.ndarray, np.ndarray]:
        high = np.full(self.action_dim, 30.0)
        return -high, high

    def init_qpos(self, height_offset: float) -> np.ndarray:
        qpos = np.zeros(self.nq)
        qpos[2] = 0.75 + height_offset
        qpos[3] = 1.0
        return qpos

    def obs_bounds(self) -> Tuple[np.ndarray, np.ndarray]:
        high = np.full(self.obs_dim, np.inf)
        return -high, high

    def reset_noise(self, key, nq_total, nv_total):
        # ant.py:84-96: qpos ~ U(-0.1, 0.1), qvel ~ N(0, 0.1); world zeroed.
        kq, kv = jax.random.split(key)
        qpos_noise = jax.random.uniform(kq, (nq_total,), minval=-0.1, maxval=0.1)
        qvel_noise = jax.random.normal(kv, (nv_total,)) * 0.1
        return qpos_noise, qvel_noise

    ZERO_WORLD_DOFS_ON_RESET = True

    def dynamics_step(self, spec, qpos, qvel, action):
        """frame_skip RK4 steps on the composed world model (with contacts)."""
        from ..physics import contact as contact_mod

        model = spec.dynamic_model
        cset = spec.contact_set
        _, chain_mask, _, _ = engine.get_masks(model)
        ctrl = jnp.asarray(action, qpos.dtype)

        def extra_cb(kd, qacc0, Minv, qvel_now):
            qfrc = contact_mod.contact_qfrc(
                model, cset, kd, qvel_now, qacc0, Minv, chain_mask
            )
            return qfrc + spec.engine_support_qfrc(kd, qacc0, Minv, qvel_now)

        def body(carry, _):
            q, v = carry
            q, v = engine.rk4_step(model, q, v, ctrl, extra_qfrc=extra_cb)
            return (q, v), None

        (q, v), _ = jax.lax.scan(
            body, (qpos, qvel), None, length=self.frame_skip
        )
        return q, v

    def inner_reward_terms(self, xy_before, xy_after, action):
        # ant.py:56-73: vnorm forward reward − ctrl cost on raw action;
        # exposed separately for info["reward_forward"/"reward_ctrl"]
        # parity (ant.py:71-73).
        # (reward_forward is the UNWEIGHTED value in the reference dict)
        vel = (xy_after - xy_before) / self.dt
        forward = jnp.sqrt(jnp.sum(vel * vel))
        ctrl_cost = self.CTRL_COST_WEIGHT * jnp.sum(action * action)
        return forward, ctrl_cost

    def inner_reward(self, xy_before, xy_after, action):
        forward, ctrl_cost = self.inner_reward_terms(xy_before, xy_after, action)
        return self.FORWARD_REWARD_WEIGHT * forward - ctrl_cost

    def observe(self, qpos: jnp.ndarray, qvel: jnp.ndarray) -> jnp.ndarray:
        return jnp.concatenate([qpos[:15], qvel[:14]])

    def get_ori(self, qpos: jnp.ndarray) -> jnp.ndarray:
        """Heading: body-x axis projected on the xy plane (ant.py:98-103)."""
        from ..physics.math3d import quat_rotate

        rot = qpos[3:7]
        v = quat_rotate(rot, jnp.asarray([1.0, 0.0, 0.0], qpos.dtype))
        return jnp.arctan2(v[1], v[0])
