"""Generic fused step kernel: any engine-world robot in one pallas_call.

The hand-written kernels (:mod:`.point_pallas`, :mod:`.swimmer_pallas`,
:mod:`.ant_pallas`) cover every *registered* env ID.  This module covers
everything else: a robot composed through the extension API
(``Robot.USES_WORLD_ENGINE`` with ``build_bodies``) gets its frame_skip ×
RK4 contact dynamics fused into a single kernel via the generic scalar-lane
engine (:mod:`.lane_engine`), instead of falling back to the
dispatch-bound XLA path (see physics/engine_batched.py for the measured
analysis).

Only the *step* kernel is built (explicit actions, no auto-reset): reset
laws are robot-specific jax.random code, so the public
``BatchedMazeEnv._build_fast_step`` wrapper folds resets in XLA around the
kernel — exactly as it does for the named kernels.

Inner reward is the standard locomotion law (``FORWARD_REWARD_WEIGHT *
‖Δxy‖/dt − CTRL_COST_WEIGHT·‖a‖²`` — ant.py:61-73 / swimmer.py:32-47
semantics); task heads anchor at OBS_OFFSET (robot qpos[:3], or the first
observed object for BlockCarry/Billiard-style tasks).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from .lane_engine import (
    LaneWorld,
    forward_lane,
    integrate_lane,
    world_from_spec,
)
from .lane_env import LaneEnvKernel, goal_heads

_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


class EngineEnvKernelSpec(NamedTuple):
    lw: LaneWorld
    nq: int
    nv: int
    nu: int
    goal_pos: np.ndarray
    goal_dim_mask: np.ndarray
    goal_threshold: np.ndarray
    goal_scale: np.ndarray
    goal_valid: np.ndarray
    reward_type: str
    penalty: float
    scale: float
    inner_scale: float
    frame_skip: int
    episode_limit: int
    solver_iters: int
    fwd_weight: float
    ctrl_cost: float
    obs_offset: int
    head_qadr: tuple   # qpos indices of the heads anchor (3,)
    head_base: tuple   # static offsets added to the anchor components
    dynamic_goals: bool = False  # sample_goals() task: goal lane operand


def spec_from_env(spec, solver_iters: int | None = None) -> EngineEnvKernelSpec:
    if solver_iters is None:
        from ..physics.contact import CONTACT_SOLVER_ITERS

        solver_iters = CONTACT_SOLVER_ITERS  # kernel == engine parity
    robot = spec.robot
    assert getattr(robot, "USES_WORLD_ENGINE", False), (
        "generic engine kernel serves engine-world robots"
    )
    # heads anchor: robot qpos[:3], or the first observed object
    if spec.task.OBS_OFFSET == 0:
        head_qadr, head_base = (0, 1, 2), (0.0, 0.0, 0.0)
    else:
        if spec.ball_runtimes:
            ob = spec.ball_runtimes[0]
            if ob.kind == "free":
                a = ob.qpos_idx[0]
                head_qadr, head_base = (a, a + 1, a + 2), (0.0, 0.0, 0.0)
            else:
                head_qadr = (ob.qpos_idx[0], ob.qpos_idx[1], -1)
                head_base = (float(ob.body_pos[0]), float(ob.body_pos[1]),
                             0.0)
        else:
            b = spec.block_runtimes[0]
            head_qadr = tuple(b.qpos_idx[:3])
            head_base = tuple(float(x) for x in np.asarray(b.body_pos))
    g = spec.heads.goals
    return EngineEnvKernelSpec(
        lw=world_from_spec(spec),
        nq=int(spec.nq), nv=int(spec.nv), nu=int(robot.action_dim),
        goal_pos=np.asarray(g.pos, np.float32),
        goal_dim_mask=np.asarray(g.dim_mask, np.float32),
        goal_threshold=np.asarray(g.threshold, np.float32),
        goal_scale=np.asarray(g.reward_scale, np.float32),
        goal_valid=np.asarray(g.valid),
        reward_type=spec.task.REWARD_TYPE,
        penalty=float(spec.task.PENALTY or 0.0),
        scale=float(spec.task.scale),
        inner_scale=float(spec.inner_reward_scaling),
        frame_skip=int(robot.frame_skip),
        episode_limit=1000,
        solver_iters=solver_iters,
        fwd_weight=float(getattr(robot, "FORWARD_REWARD_WEIGHT", 1.0)),
        ctrl_cost=float(getattr(robot, "CTRL_COST_WEIGHT", 0.0)),
        obs_offset=int(spec.task.OBS_OFFSET),
        head_qadr=head_qadr,
        head_base=head_base,
        dynamic_goals=bool(spec.task.sample_goals()),
    )


def _head_anchor(es: EngineEnvKernelSpec, q):
    px = q[es.head_qadr[0]] + np.float32(es.head_base[0])
    py = q[es.head_qadr[1]] + np.float32(es.head_base[1])
    if es.head_qadr[2] >= 0:
        pz = q[es.head_qadr[2]] + np.float32(es.head_base[2])
    else:
        pz = jnp.zeros_like(px) + np.float32(es.head_base[2])
    return px, py, pz


def _make_kernel(es: EngineEnvKernelSpec, tile: int | None) -> LaneEnvKernel:
    model = es.lw.model
    h = np.float32(model.timestep)
    dt_outer = np.float32(model.timestep * es.frame_skip)
    hs_tab = jnp.asarray([0.0, h / 2, h / 2, h], jnp.float32)
    ws_tab = jnp.asarray([1.0, 2.0, 2.0, 1.0], jnp.float32)

    def rk4_scan(q, v, ctrl, hs_read, ws_read):
        zero_v = tuple(jnp.zeros_like(x) for x in v)

        def stage(i, carry):
            prev_v, prev_a, acc_v, acc_a = carry
            hs = hs_read(i)
            w = ws_read(i)
            q_s = integrate_lane(model, q, prev_v, hs)
            v_s = tuple(vv + aa * hs for vv, aa in zip(v, prev_a))
            a_s = forward_lane(es.lw, q_s, v_s, ctrl, es.solver_iters)
            return (v_s, a_s,
                    tuple(av + w * vs for av, vs in zip(acc_v, v_s)),
                    tuple(aa + w * as_ for aa, as_ in zip(acc_a, a_s)))

        _, _, acc_v, acc_a = jax.lax.fori_loop(
            0, 4, stage, (v, zero_v, zero_v, zero_v))
        q_out = integrate_lane(model, q, tuple(x / 6.0 for x in acc_v), h)
        v_out = tuple(vv + (aa / 6.0) * h for vv, aa in zip(v, acc_a))
        return q_out, v_out

    def env_step(q, v, t, ctrl, hs_read, ws_read, goal=None):
        x0, y0 = q[0], q[1]

        def body(_, carry):
            q_, v_ = carry
            return rk4_scan(q_, v_, ctrl, hs_read, ws_read)

        q, v = jax.lax.fori_loop(0, es.frame_skip, body, (q, v))
        velx = (q[0] - x0) / dt_outer
        vely = (q[1] - y0) / dt_outer
        forward = jnp.sqrt(velx * velx + vely * vely)
        cost = np.float32(es.ctrl_cost) * sum(c * c for c in ctrl)
        inner = np.float32(es.fwd_weight) * forward - cost
        t = t + 1
        px, py, pz = _head_anchor(es, q)
        outer, term = goal_heads(es, px, py, pz, goal=goal)
        reward = np.float32(es.inner_scale) * inner + outer
        trunc = t >= es.episode_limit
        return q, v, t, reward, term, trunc

    def _no_rollout(*a, **k):  # pragma: no cover
        raise NotImplementedError(
            "generic engine kernel is step-only; resets fold in XLA "
            "(BatchedMazeEnv._build_fast_step)")

    return LaneEnvKernel(
        es.nq, es.nv, es.nu, env_step, _no_rollout, _no_rollout,
        smem_tables=(hs_tab, ws_tab),
        default_tile=tile or 256,
        compiler_params=_VMEM_LIMIT,
        n_goal=len(es.goal_valid) if es.dynamic_goals else 0,
    )


def build_step_kernel(es: EngineEnvKernelSpec, num_envs: int,
                      tile: int | None = None, interpret: bool = None):
    """Single-step fused kernel with explicit actions, no auto-reset."""
    return _make_kernel(es, tile).build_step(num_envs, tile or 256,
                                             interpret)
