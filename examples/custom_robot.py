"""Custom robot through the extension API — and it still gets the fused path.

The reference's extension story is "subclass AgentModel + write an XML"
(`/root/reference/mujoco_maze/agent_model.py`, README.md:79-127).  Here the
analog is: subclass :class:`~mujoco_maze_tpu.models.base.Robot`, describe
the body tree programmatically (``build_bodies``), and compose it with any
maze task.  Because the robot runs on the in-repo engine, it automatically
gets:

* the composed contact world (maze walls, movable blocks, object balls),
* the vmapped XLA path AND the batch-last XLA path
  (physics/engine_batched), and
* the generic fused Pallas step kernel (ops/engine_pallas) on TPU — the
  same single-launch treatment the built-in robots get.

The demo robot is a "Roller": a force-actuated sphere on x/y/z slides that
falls onto the floor and rolls around the UMaze under contact dynamics.

Run:  python examples/custom_robot.py
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_maze_tpu.envs.batched import BatchedMazeEnv
from mujoco_maze_tpu.envs.env import MazeEnvSpec
from mujoco_maze_tpu.models.base import Robot
from mujoco_maze_tpu.physics import engine
from mujoco_maze_tpu.physics.model import SLIDE, Actuator, Body, Geom, Joint
from mujoco_maze_tpu.tasks.library import GoalRewardUMaze


class RollerRobot(Robot):
    """Force-actuated sphere on x/y/z slides (full contact dynamics)."""

    NAME = "Roller"
    MANUAL_COLLISION = False
    ORI_IND = None
    RADIUS = None
    OBJBALL_TYPE = "freejoint"
    USES_WORLD_ENGINE = True

    nq = 3
    nv = 3
    action_dim = 2
    frame_skip = 5
    timestep = 0.02
    obs_dim = 6

    FORWARD_REWARD_WEIGHT = 1.0
    CTRL_COST_WEIGHT = 1e-4
    WORLD_GEOM_DEFAULTS = dict(
        density=5.0,
        friction=(1.0, 0.5, 0.5),
        solref=(0.02, 1.0),
        solimp=(0.8, 0.8, 0.01),
        margin=0.01,
    )

    def build_bodies(self, torso_z: float = 0.75):
        body = Body(
            name="roller",
            parent=-1,
            pos=(0.0, 0.0, torso_z),
            joints=[
                Joint(SLIDE, axis=(1, 0, 0), name="roller_x"),
                Joint(SLIDE, axis=(0, 1, 0), name="roller_y"),
                Joint(SLIDE, axis=(0, 0, 1), name="roller_z"),
            ],
            geoms=[Geom(gtype=0, size=(0.4,), contype=1, conaffinity=1,
                        **self.WORLD_GEOM_DEFAULTS)],
        )
        actuators = [
            Actuator("roller_x", gear=100.0, ctrlrange=(-1, 1)),
            Actuator("roller_y", gear=100.0, ctrlrange=(-1, 1)),
        ]
        return [body], actuators

    def action_bounds(self) -> Tuple[np.ndarray, np.ndarray]:
        high = np.ones(2)
        return -high, high

    def init_qpos(self, height_offset: float) -> np.ndarray:
        return np.zeros(3)

    def obs_bounds(self) -> Tuple[np.ndarray, np.ndarray]:
        high = np.full(self.obs_dim, np.inf)
        return -high, high

    def reset_noise(self, key, nq_total, nv_total):
        kq, kv = jax.random.split(key)
        return (jax.random.uniform(kq, (nq_total,), minval=-0.1, maxval=0.1),
                jax.random.normal(kv, (nv_total,)) * 0.1)

    ZERO_WORLD_DOFS_ON_RESET = True

    def dynamics_step(self, spec, qpos, qvel, action):
        """frame_skip RK4 steps with contacts (AntRobot.dynamics_step
        pattern — the engine drives any composed world)."""
        from mujoco_maze_tpu.physics import contact as contact_mod

        model = spec.dynamic_model
        cset = spec.contact_set
        _, chain_mask, _, _ = engine.get_masks(model)
        ctrl = jnp.asarray(action, qpos.dtype)

        def extra_cb(kd, qacc0, Minv, qvel_now):
            qfrc = contact_mod.contact_qfrc(
                model, cset, kd, qvel_now, qacc0, Minv, chain_mask)
            return qfrc + spec.engine_support_qfrc(kd, qacc0, Minv, qvel_now)

        def body(carry, _):
            q, v = carry
            q, v = engine.rk4_step(model, q, v, ctrl, extra_qfrc=extra_cb)
            return (q, v), None

        (q, v), _ = jax.lax.scan(body, (qpos, qvel), None,
                                 length=self.frame_skip)
        return q, v

    def inner_reward_terms(self, xy_before, xy_after, action):
        vel = (xy_after - xy_before) / self.dt
        forward = jnp.sqrt(jnp.sum(vel * vel))
        return forward, self.CTRL_COST_WEIGHT * jnp.sum(action * action)

    def inner_reward(self, xy_before, xy_after, action):
        fwd, cc = self.inner_reward_terms(xy_before, xy_after, action)
        return self.FORWARD_REWARD_WEIGHT * fwd - cc

    def observe(self, qpos: jnp.ndarray, qvel: jnp.ndarray) -> jnp.ndarray:
        return jnp.concatenate([qpos[:3], qvel[:3]])

    def get_ori(self, qpos: jnp.ndarray) -> jnp.ndarray:
        return jnp.zeros_like(qpos[0])


def make_roller_umaze(num_envs: int = 64, **kwargs) -> BatchedMazeEnv:
    """Compose the custom robot with the stock UMaze task."""
    spec = MazeEnvSpec(
        robot=RollerRobot(),
        maze_task=GoalRewardUMaze,
        maze_size_scaling=4.0,
        inner_reward_scaling=GoalRewardUMaze.INNER_REWARD_SCALING,
    )
    return BatchedMazeEnv(spec, num_envs, **kwargs)


if __name__ == "__main__":
    env = make_roller_umaze(num_envs=64)
    fast = "fused engine kernel" if env._fast is not None else "XLA path"
    print(f"RollerUMaze: {env.num_envs} envs on the {fast}")
    state, obs = env.reset(jax.random.PRNGKey(0))
    final, (O, R, T) = env.rollout(
        state, env.random_policy(), 100, jax.random.PRNGKey(1))
    print("rollout:", O.shape, "mean reward", float(R.mean()),
          "final height", float(final.qpos[:, 2].mean()))
