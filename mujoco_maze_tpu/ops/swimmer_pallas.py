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
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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


def _uniform(shape, lo, hi):
    bits = pltpu.prng_random_bits((1,) + tuple(shape))[0]
    u = (bits >> 8).astype(jnp.float32) * np.float32(2.0**-24)
    return lo + u * (hi - lo)


def build_rollout_kernel(es: SwimmerEnvKernelSpec, num_envs: int,
                         num_steps: int, tile: int = 1024,
                         interpret: bool = None):
    """jit-able: (qpos(B,5), qvel(B,5), t(B,), seed ()) →
    (qpos', qvel', t', reward_sum (), episodes ())."""
    tile = min(tile, num_envs)
    assert num_envs % tile == 0
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    grid = (num_envs // tile,)
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
        # task heads on (x, y)
        if es.reward_type == "dist":
            gp = es.goal_pos[0]
            dm = es.goal_dim_mask[0]
            ddx = (q[0] - np.float32(gp[0])) * np.float32(dm[0])
            ddy = (q[1] - np.float32(gp[1])) * np.float32(dm[1])
            outer = -jnp.sqrt(ddx * ddx + ddy * ddy) / np.float32(es.scale)
        elif es.reward_type == "goal":
            outer = jnp.full_like(q[0], np.float32(es.penalty))
        else:
            outer = jnp.zeros_like(q[0])
        term = jnp.zeros_like(q[0], dtype=jnp.bool_)
        for gi in reversed(range(len(es.goal_valid))):
            if not es.goal_valid[gi]:
                continue
            gp = es.goal_pos[gi]
            dm = es.goal_dim_mask[gi]
            ddx = (q[0] - np.float32(gp[0])) * np.float32(dm[0])
            ddy = (q[1] - np.float32(gp[1])) * np.float32(dm[1])
            near = ddx * ddx + ddy * ddy <= np.float32(es.goal_threshold[gi] ** 2)
            term = term | near
            if es.reward_type == "goal":
                outer = jnp.where(near, np.float32(es.goal_scale[gi]), outer)
        reward = np.float32(es.inner_scale) * inner + outer
        trunc = t >= es.episode_limit
        return q, v, t, reward, term, trunc

    def kernel(qpos_ref, qvel_ref, t_ref, seed_ref, out_qpos, out_qvel,
               out_t, out_rew, out_eps):
        pid = pl.program_id(0)
        pltpu.prng_seed(seed_ref[0] + pid)
        q = tuple(qpos_ref[i, :] for i in range(nq))
        v = tuple(qvel_ref[i, :] for i in range(nq))
        t = t_ref[0, :]

        def body(i, carry):
            q, v, t, rew_sum, eps = carry
            ctrl = tuple(
                _uniform((tile,), np.float32(-1.0), np.float32(1.0))
                for _ in range(nu)
            )
            q, v, t, reward, term, trunc = env_step(q, v, t, ctrl)
            done = term | trunc
            # swimmer reset noise law: qpos AND qvel ~ U(-0.1, 0.1)
            q = tuple(
                jnp.where(done, _uniform((tile,), np.float32(-0.1), np.float32(0.1)), qi)
                for qi in q
            )
            v = tuple(
                jnp.where(done, _uniform((tile,), np.float32(-0.1), np.float32(0.1)), vi)
                for vi in v
            )
            t = jnp.where(done, 0, t)
            return q, v, t, rew_sum + reward, eps + done.astype(jnp.int32)

        q, v, t, rew_sum, eps = jax.lax.fori_loop(
            0, num_steps, body,
            (q, v, t, jnp.zeros((tile,), jnp.float32),
             jnp.zeros((tile,), jnp.int32)),
        )
        for i in range(nq):
            out_qpos[i, :] = q[i]
            out_qvel[i, :] = v[i]
        out_t[0, :] = t
        out_rew[0, :] = rew_sum
        out_eps[0, :] = eps

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((nq, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((nq, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nq, num_envs), jnp.float32),
            jax.ShapeDtypeStruct((nq, num_envs), jnp.float32),
            jax.ShapeDtypeStruct((1, num_envs), jnp.int32),
            jax.ShapeDtypeStruct((1, num_envs), jnp.float32),
            jax.ShapeDtypeStruct((1, num_envs), jnp.int32),
        ],
        interpret=interpret,
    )

    @jax.jit
    def rollout(qpos, qvel, t, seed):
        qp, qv, tt, rew, eps = call(
            qpos.T.astype(jnp.float32),
            qvel.T.astype(jnp.float32),
            t[None, :].astype(jnp.int32),
            seed[None].astype(jnp.int32),
        )
        return qp.T, qv.T, tt[0], jnp.sum(rew), jnp.sum(eps)

    return rollout


def build_step_kernel(es: SwimmerEnvKernelSpec, num_envs: int,
                      tile: int = 1024, interpret: bool = None):
    """Single-step mode with explicit actions, no auto-reset — the
    differential-testing surface against MazeEnvSpec.step."""
    tile = min(tile, num_envs)
    assert num_envs % tile == 0
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    grid = (num_envs // tile,)
    ks = es.dyn
    nq = 3 + ks.n_links - 1
    nu = ks.n_act
    dt_outer = np.float32(ks.timestep * es.frame_skip)

    def kernel(qpos_ref, qvel_ref, t_ref, act_ref, out_qpos, out_qvel,
               out_t, out_rew, out_term):
        q = tuple(qpos_ref[i, :] for i in range(nq))
        v = tuple(qvel_ref[i, :] for i in range(nq))
        t = t_ref[0, :]
        ctrl = tuple(act_ref[i, :] for i in range(nu))
        x0, y0 = q[0], q[1]
        for _ in range(es.frame_skip):
            q, v = rk4_step_swimmer(ks, q, v, ctrl)
        velx = (q[0] - x0) / dt_outer
        vely = (q[1] - y0) / dt_outer
        inner = jnp.sqrt(velx * velx + vely * vely) - np.float32(1e-4) * sum(
            a * a for a in ctrl
        )
        t = t + 1
        if es.reward_type == "dist":
            gp = es.goal_pos[0]
            dm = es.goal_dim_mask[0]
            ddx = (q[0] - np.float32(gp[0])) * np.float32(dm[0])
            ddy = (q[1] - np.float32(gp[1])) * np.float32(dm[1])
            outer = -jnp.sqrt(ddx * ddx + ddy * ddy) / np.float32(es.scale)
        elif es.reward_type == "goal":
            outer = jnp.full_like(q[0], np.float32(es.penalty))
        else:
            outer = jnp.zeros_like(q[0])
        term = jnp.zeros_like(q[0], dtype=jnp.bool_)
        for gi in reversed(range(len(es.goal_valid))):
            if not es.goal_valid[gi]:
                continue
            gp = es.goal_pos[gi]
            dm = es.goal_dim_mask[gi]
            ddx = (q[0] - np.float32(gp[0])) * np.float32(dm[0])
            ddy = (q[1] - np.float32(gp[1])) * np.float32(dm[1])
            near = ddx * ddx + ddy * ddy <= np.float32(es.goal_threshold[gi] ** 2)
            term = term | near
            if es.reward_type == "goal":
                outer = jnp.where(near, np.float32(es.goal_scale[gi]), outer)
        reward = np.float32(es.inner_scale) * inner + outer
        for i in range(nq):
            out_qpos[i, :] = q[i]
            out_qvel[i, :] = v[i]
        out_t[0, :] = t
        out_rew[0, :] = reward
        out_term[0, :] = term

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((nq, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((nu, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((nq, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nq, num_envs), jnp.float32),
            jax.ShapeDtypeStruct((nq, num_envs), jnp.float32),
            jax.ShapeDtypeStruct((1, num_envs), jnp.int32),
            jax.ShapeDtypeStruct((1, num_envs), jnp.float32),
            jax.ShapeDtypeStruct((1, num_envs), jnp.bool_),
        ],
        interpret=interpret,
    )

    @jax.jit
    def step(qpos, qvel, t, actions):
        qp, qv, tt, rew, term = call(
            qpos.T.astype(jnp.float32),
            qvel.T.astype(jnp.float32),
            t[None, :].astype(jnp.int32),
            actions.T.astype(jnp.float32),
        )
        return qp.T, qv.T, tt[0], rew[0], term[0]

    return step
