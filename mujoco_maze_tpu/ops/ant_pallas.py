"""Pallas TPU kernel: fused Ant-maze rollout.

The flagship contact-dynamics kernel: frame_skip × RK4 over the
scalar-component ant pipeline (:mod:`.ant_math` — FK, Jacobian-form mass
matrix, RNE bias, impedance limits, torso-proximity-pruned contacts with a
projected-Jacobi solver, all engine-exact to ~1e-11) plus the maze env
layer, running entirely inside one ``pallas_call`` with the batch on lanes.

The XLA scan path pays ~1000 kernel launches per env step (≈20K HLO ops);
here the whole rollout is one launch.

Built on the :mod:`.lane_env` template; the RK4 stage coefficients ride
SMEM tables (pallas kernels cannot capture array constants).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from .ant_math import (
    AntConsts,
    AntWorld,
    consts_from_model,
    forward_ant,
    integrate_ant,
    world_from_spec,
)
from .lane_env import LaneEnvKernel, goal_heads, normal, uniform

NQ, NV, NU = 15, 14, 8  # ant-only dof counts; worlds with blocks add dofs

# Block worlds add 9 sphere-vs-moving-box contact rows per block to the live
# set, growing the kernel's scoped-VMEM stack past the 16 MiB default
# (measured 20.2M @ tile=512 with 1 block on v5e; VMEM is 128 MiB/core).
_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _default_tile(aw, tile):
    """Lane tile: 1024 saturates the VPU (tile-sweep on v5e: 512→1024
    doubles AntUMaze 549K→1048K and AntPush 395K→764K env-steps/s; 2048 is
    flat), halved once per two blocks (9 extra live rows each) and once per
    ball (~120 extra rows) to bound scoped-VMEM stack growth."""
    if tile is not None:
        return tile
    return max(128, 1024 >> (len(aw.blocks) // 2 + len(aw.balls)))


class AntEnvKernelSpec(NamedTuple):
    ac: AntConsts
    aw: AntWorld
    nq: int                  # 15 + block slide dofs
    nv: int                  # 14 + block slide dofs
    qpos0: np.ndarray
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
    obs_offset: int = 0      # 0 = robot heads; 3 = first object (Billiard)
    dynamic_goals: bool = False  # sample_goals() task: goal lane operand


def spec_from_env(spec, solver_iters: int | None = None) -> AntEnvKernelSpec:
    assert spec.robot.NAME == "Ant"
    if solver_iters is None:
        from ..physics.contact import CONTACT_SOLVER_ITERS

        solver_iters = CONTACT_SOLVER_ITERS  # kernel == engine parity
    g = spec.heads.goals
    return AntEnvKernelSpec(
        ac=consts_from_model(spec.dynamic_model),
        aw=world_from_spec(spec),  # asserts slide-only blocks (no SPIN)
        nq=int(spec.nq),
        nv=int(spec.nv),
        qpos0=np.asarray(spec.dynamic_model.qpos0, np.float32),
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
        solver_iters=solver_iters,
        obs_offset=int(spec.task.OBS_OFFSET),
        dynamic_goals=bool(spec.task.sample_goals()),
    )


def _rk4_scan(es: AntEnvKernelSpec, q, v, ctrl, hs_read, ws_read):
    """RK4 via a 4-stage fori_loop: ONE forward-dynamics instance in the IR.

    Stage coefficients come from SMEM tables (``hs_read(i)``/``ws_read(i)``
    — pallas kernels cannot capture array constants)."""
    ac = es.ac
    h = np.float32(ac.timestep)
    xf = tuple((bl.qadr, bl.vadr) for bl in es.aw.balls)

    zero_v = tuple(jnp.zeros_like(x) for x in v)

    def stage(i, carry):
        prev_v, prev_a, acc_v, acc_a = carry
        hs = hs_read(i)
        w = ws_read(i)
        q_s = integrate_ant(q, prev_v, hs, xf)
        v_s = tuple(vv + aa * hs for vv, aa in zip(v, prev_a))
        a_s = forward_ant(ac, es.aw, q_s, v_s, ctrl, es.solver_iters)
        return (
            v_s,
            a_s,
            tuple(av + w * vs for av, vs in zip(acc_v, v_s)),
            tuple(aa + w * as_ for aa, as_ in zip(acc_a, a_s)),
        )

    _, _, acc_v, acc_a = jax.lax.fori_loop(
        0, 4, stage, (v, zero_v, zero_v, zero_v)
    )
    q_out = integrate_ant(q, tuple(x / 6.0 for x in acc_v), h, xf)
    v_out = tuple(vv + (aa / 6.0) * h for vv, aa in zip(v, acc_a))
    return q_out, v_out


def _make_kernel(es: AntEnvKernelSpec,
                 tile: int | None = None) -> LaneEnvKernel:
    nq, nv = es.nq, es.nv
    dt_outer = np.float32(es.ac.timestep * es.frame_skip)

    def env_step(q, v, t, ctrl, hs_read, ws_read, goal=None):
        x0, y0 = q[0], q[1]

        def body(_, carry):
            q, v = carry
            return _rk4_scan(es, q, v, ctrl, hs_read, ws_read)

        q, v = jax.lax.fori_loop(0, es.frame_skip, body, (q, v))
        velx = (q[0] - x0) / dt_outer
        vely = (q[1] - y0) / dt_outer
        forward = jnp.sqrt(velx * velx + vely * vely)
        ctrl_cost = np.float32(1e-4) * sum(c * c for c in ctrl)
        inner = forward - ctrl_cost
        t = t + 1
        if es.obs_offset == 3 and es.aw.balls:
            # Billiard heads: first observed object = the ball's center3
            # (free-joint qpos, envs/env.py _ball_center3)
            a = es.aw.balls[0].qadr
            outer, term = goal_heads(es, q[a], q[a + 1], q[a + 2],
                                     goal=goal)
        elif es.obs_offset == 3 and es.aw.blocks:
            # BlockCarry heads: first observed object = the block's center
            # (body base + slide dofs; envs/env.py _block_center) — the
            # round-4 registry sweep caught the kernel anchoring on the
            # robot instead (reward err 1.05 on AntBlockCarry)
            bl = es.aw.blocks[0]
            like = q[0]
            c = [np.float32(bl.base[ax]) + jnp.zeros_like(like)
                 for ax in range(3)]
            for ax, d in zip(bl.axes, bl.vadr):
                c[ax] = c[ax] + q[d + 1]
            outer, term = goal_heads(es, c[0], c[1], c[2], goal=goal)
        else:
            outer, term = goal_heads(es, q[0], q[1], q[2], goal=goal)
        reward = np.float32(es.inner_scale) * inner + outer
        trunc = t >= es.episode_limit
        return q, v, t, reward, term, trunc

    def sample_ctrl(tile_):
        return tuple(
            uniform((tile_,), np.float32(-30.0), np.float32(30.0))
            for _ in range(NU)
        )

    def sample_reset(q, v, tile_):
        # reset: ant qpos0 + U(±0.1) (quat renormalized), qvel ~ N(0, 0.1);
        # world/block dofs zeroed (models/ant.py ZERO_WORLD_DOFS_ON_RESET
        # parity)
        q_r = [
            np.float32(es.qpos0[i]) + uniform(
                (tile_,), np.float32(-0.1), np.float32(0.1)
            )
            for i in range(NQ)
        ] + [
            q[i] * 0 + float(es.qpos0[i]) for i in range(NQ, nq)
        ]
        qn = jnp.sqrt(
            q_r[3] ** 2 + q_r[4] ** 2 + q_r[5] ** 2 + q_r[6] ** 2
        )
        for j in range(3, 7):
            q_r[j] = q_r[j] / qn
        v_r = [normal((tile_,)) * np.float32(0.1) for _ in range(NV)] + [
            v[i] * 0 for i in range(NV, nv)
        ]
        return tuple(q_r), tuple(v_r)

    h = np.float32(es.ac.timestep)
    hs_tab = jnp.asarray([0.0, h / 2, h / 2, h], jnp.float32)
    ws_tab = jnp.asarray([1.0, 2.0, 2.0, 1.0], jnp.float32)

    return LaneEnvKernel(
        nq, nv, NU, env_step, sample_ctrl, sample_reset,
        smem_tables=(hs_tab, ws_tab),
        default_tile=_default_tile(es.aw, tile),
        compiler_params=_VMEM_LIMIT,
        n_goal=len(es.goal_valid) if es.dynamic_goals else 0,
    )


def build_rollout_kernel(es: AntEnvKernelSpec, num_envs: int, num_steps: int,
                         tile: int | None = None, interpret: bool = None):
    return _make_kernel(es, tile).build_rollout(
        num_envs, num_steps, tile, interpret)


def build_step_kernel(es: AntEnvKernelSpec, num_envs: int,
                      tile: int | None = None, interpret: bool = None):
    """Single-step with explicit actions, no auto-reset (differential
    testing vs MazeEnvSpec.step)."""
    return _make_kernel(es, tile).build_step(num_envs, tile, interpret)
