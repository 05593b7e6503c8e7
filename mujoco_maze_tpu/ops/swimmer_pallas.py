"""Pallas TPU kernel: fused Swimmer-maze rollout.

Same architecture as :mod:`.point_pallas` — the whole rollout in one
``pallas_call`` with env state in VMEM and the batch on lanes — but the
step body is real physics: frame_skip × RK4 over the closed-form planar
swimmer dynamics (:mod:`.swimmer_math`, engine-exact to 1e-12), plus the
maze env layer (inner locomotion reward, task heads, truncation,
auto-reset with the swimmer's ±0.1 uniform noise law).

Swimmer mazes have no robot-wall interaction (the reference model defines
no contact pairs — SURVEY quirk list), so no collision stage is needed.

Also serves the 2-link Reacher (nq=4, one actuator) — the closed form
(:mod:`.swimmer_math`) is generic over the link count.

Object worlds (SwimmerPush/Fall/MultiFall — registered by the reference's
mechanical walk even though its tests skip them, __init__.py:67-78): the
swimmer path has no robot↔object coupling (parity with
``MazeEnvSpec._step_dynamic``, which steps only the robot dofs), so world
dofs ride the kernel as pass-through lanes: reset noise per the swimmer law
(reference swimmer.py:55-68 noises the FULL qpos/qvel, nothing zeroed),
constant during the episode.

Built on the :mod:`.lane_env` template: this module supplies only the
dynamics body and the action/reset noise laws.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from .lane_env import LaneEnvKernel, goal_heads, uniform
from .swimmer_math import SwimmerKernelSpec, rk4_step_swimmer, spec_from_model


class SwimmerEnvKernelSpec(NamedTuple):
    dyn: SwimmerKernelSpec
    goal_pos: np.ndarray       # (G, 3)
    goal_dim_mask: np.ndarray  # (G, 3)
    goal_threshold: np.ndarray
    goal_scale: np.ndarray
    goal_valid: np.ndarray
    reward_type: str
    penalty: float
    scale: float
    inner_scale: float
    frame_skip: int
    episode_limit: int
    n_world: int = 0           # pass-through world dofs (blocks/balls)
    dynamic_goals: bool = False  # sample_goals() task: goal lane operand


def spec_from_env(spec) -> SwimmerEnvKernelSpec:
    assert spec.robot.NAME in ("Swimmer", "Reacher"), "swimmer-family kernel"
    # Object worlds: the swimmer path never couples to blocks/balls — world
    # dofs are pass-through lanes.  Tasks with OBS_OFFSET != 0 would put the
    # reward head on an object we don't move; no swimmer-registered task
    # does (BlockCarry/Billiard gate swimmer=None).
    assert spec.task.OBS_OFFSET == 0, "swimmer kernel: robot-position heads"
    assert spec.nq == spec.nv, "world layout is 1 qpos per dof here"
    g = spec.heads.goals
    return SwimmerEnvKernelSpec(
        dyn=spec_from_model(spec.robot.model),
        goal_pos=np.asarray(g.pos, np.float32),
        goal_dim_mask=np.asarray(g.dim_mask, np.float32),
        goal_threshold=np.asarray(g.threshold, np.float32),
        goal_scale=np.asarray(g.reward_scale, np.float32),
        goal_valid=np.asarray(g.valid),
        reward_type=spec.task.REWARD_TYPE,
        penalty=float(spec.task.PENALTY or 0.0),
        scale=float(spec.task.scale),
        inner_scale=float(spec.inner_reward_scaling),
        frame_skip=int(spec.robot.frame_skip),
        episode_limit=1000,
        n_world=int(spec.nq - spec.robot.nq),
        dynamic_goals=bool(spec.task.sample_goals()),
    )


def _make_kernel(es: SwimmerEnvKernelSpec) -> LaneEnvKernel:
    ks = es.dyn
    nq = 3 + ks.n_links - 1
    nq_total = nq + es.n_world
    nu = ks.n_act
    dt_outer = np.float32(ks.timestep * es.frame_skip)

    def env_step(q_full, v_full, t, ctrl, goal=None):
        """One outer env step (frame_skip RK4 + env layer); world dofs
        (q_full[nq:]) are pass-through — the swimmer path has no
        robot↔object coupling (MazeEnvSpec._step_dynamic parity)."""
        q, v = q_full[:nq], v_full[:nq]
        x0, y0 = q[0], q[1]
        for _ in range(es.frame_skip):
            q, v = rk4_step_swimmer(ks, q, v, ctrl)
        # inner locomotion reward (swimmer.py:32-47)
        velx = (q[0] - x0) / dt_outer
        vely = (q[1] - y0) / dt_outer
        forward = jnp.sqrt(velx * velx + vely * vely)
        ctrl_cost = np.float32(1e-4) * sum(a * a for a in ctrl)
        inner = forward - ctrl_cost
        t = t + 1
        # heads see obs[:3] = (x, y, first joint angle) — the reference's
        # MazeGoal.euc_dist compares obs[2] against a 3D goal's z for the
        # elevated Fall/MultiFall worlds (a reference quirk the XLA path
        # replicates; round-4 registry sweep caught the kernel dropping it:
        # SwimmerFall reward err 2.28)
        outer, term = goal_heads(es, q[0], q[1], q[2], goal=goal)
        reward = np.float32(es.inner_scale) * inner + outer
        trunc = t >= es.episode_limit
        return (tuple(q) + q_full[nq:], tuple(v) + v_full[nq:],
                t, reward, term, trunc)

    def sample_ctrl(tile):
        return tuple(
            uniform((tile,), np.float32(-1.0), np.float32(1.0))
            for _ in range(nu)
        )

    def sample_reset(q, v, tile):
        # swimmer reset noise law: qpos AND qvel ~ U(-0.1, 0.1), applied to
        # the FULL state incl. world dofs (reference swimmer.py:55-68;
        # ZERO_WORLD_DOFS_ON_RESET is False for this family)
        q_r = tuple(
            uniform((tile,), np.float32(-0.1), np.float32(0.1))
            for _ in range(nq_total)
        )
        v_r = tuple(
            uniform((tile,), np.float32(-0.1), np.float32(0.1))
            for _ in range(nq_total)
        )
        return q_r, v_r

    return LaneEnvKernel(
        nq_total, nq_total, nu, env_step, sample_ctrl, sample_reset,
        default_tile=1024,
        n_goal=len(es.goal_valid) if es.dynamic_goals else 0,
    )


def build_rollout_kernel(es: SwimmerEnvKernelSpec, num_envs: int,
                         num_steps: int, tile: int = 1024,
                         interpret: bool = None):
    """jit-able: (qpos(B,nq), qvel(B,nq), t(B,), seed ()) →
    (qpos', qvel', t', reward_sum (), episodes ())."""
    return _make_kernel(es).build_rollout(num_envs, num_steps, tile, interpret)


def build_step_kernel(es: SwimmerEnvKernelSpec, num_envs: int,
                      tile: int = 1024, interpret: bool = None):
    """Single-step mode with explicit actions, no auto-reset — the
    differential-testing surface against MazeEnvSpec.step."""
    return _make_kernel(es).build_step(num_envs, tile, interpret)
