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


def spec_from_env(spec) -> SwimmerEnvKernelSpec:
    assert spec.robot.NAME in ("Swimmer", "Reacher"), "swimmer-family kernel"
    assert not spec.block_runtimes and not spec.ball_runtimes
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
    )


def _make_kernel(es: SwimmerEnvKernelSpec) -> LaneEnvKernel:
    ks = es.dyn
    nq = 3 + ks.n_links - 1
    nu = ks.n_act
    dt_outer = np.float32(ks.timestep * es.frame_skip)

    def env_step(q, v, t, ctrl):
        """One outer env step (frame_skip RK4 + env layer)."""
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
        outer, term = goal_heads(es, q[0], q[1])
        reward = np.float32(es.inner_scale) * inner + outer
        trunc = t >= es.episode_limit
        return q, v, t, reward, term, trunc

    def sample_ctrl(tile):
        return tuple(
            uniform((tile,), np.float32(-1.0), np.float32(1.0))
            for _ in range(nu)
        )

    def sample_reset(q, v, tile):
        # swimmer reset noise law: qpos AND qvel ~ U(-0.1, 0.1)
        q_r = tuple(
            uniform((tile,), np.float32(-0.1), np.float32(0.1))
            for _ in range(nq)
        )
        v_r = tuple(
            uniform((tile,), np.float32(-0.1), np.float32(0.1))
            for _ in range(nq)
        )
        return q_r, v_r

    return LaneEnvKernel(
        nq, nq, nu, env_step, sample_ctrl, sample_reset, default_tile=1024
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
