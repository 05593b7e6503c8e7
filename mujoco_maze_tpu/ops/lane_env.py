"""Generic lane-resident env-kernel template.

Every fused robot kernel in this package has the same shape: env state
lives in VMEM as per-dof lane vectors (batch-last ``(dof, tile)`` blocks on
the 128-wide VPU lanes), the whole rollout (or one step) runs inside a
single ``pallas_call``, actions/resets are sampled with the on-core PRNG,
and the maze-task heads (dist/goal reward + first-hit-wins termination,
`/root/reference/mujoco_maze/maze_task.py:357-360` semantics) close the
step.  This module is that shared scaffolding; a robot module supplies

* ``env_step(q, v, t, ctrl) -> (q, v, t, reward, term, trunc)`` — the
  dynamics + reward body on lane vectors (q/v are per-dof tuples),
* ``sample_ctrl(tile) -> ctrl tuple`` — the random-action law,
* ``sample_reset(q, v, tile) -> (q_r, v_r)`` — the reset-noise law,

and gets ``build_rollout`` / ``build_step`` for free.  This is the
extension API for new robots: write the dynamics body, reuse everything
else (see :mod:`.swimmer_pallas` for the minimal example).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def interpret_default() -> bool:
    """CPU/GPU fall back to the Pallas interpreter (tests, CI)."""
    return jax.default_backend() != "tpu"


def uniform(shape, lo, hi):
    """U(lo, hi) from the on-core PRNG (rank>=2 output requirement)."""
    bits = pltpu.prng_random_bits((1,) + tuple(shape))[0]
    u = (bits >> 8).astype(jnp.float32) * np.float32(2.0**-24)
    return lo + u * (hi - lo)


def normal(shape):
    """N(0, 1) via Box-Muller from two on-core uniforms."""
    u1 = uniform(shape, np.float32(1e-7), np.float32(1.0))
    u2 = uniform(shape, np.float32(0.0), np.float32(1.0))
    return jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(
        np.float32(2.0 * np.pi) * u2
    )


def goal_heads(es, px, py, po=None, goal=None):
    """Task heads on the (x, y[, ori/z]) observation prefix.

    ``es`` carries the lowered goal arrays (goal_pos/dim_mask/threshold/
    scale/valid + reward_type/penalty/scale): returns ``(outer_reward,
    terminated)`` with the reference's first-hit-wins goal ordering.
    ``po`` is the optional third masked component (Point ori, Ant z).

    ``goal`` carries per-env goal positions for ``sample_goals()`` tasks
    (the resampling hook the reference left latent, maze_task.py:375-376):
    a tuple of ``(gx, gy, gz)`` lane-vector triples, one per goal, which
    replace the baked ``es.goal_pos`` constants; dim masks / thresholds /
    scales / validity stay static (they are structural task data).
    """
    def comps(gi):
        dm = es.goal_dim_mask[gi]
        if goal is not None:
            gx, gy, gz = goal[gi]
        else:
            gp = es.goal_pos[gi]
            gx, gy, gz = (np.float32(gp[0]), np.float32(gp[1]),
                          np.float32(gp[2]))
        ddx = (px - gx) * np.float32(dm[0])
        ddy = (py - gy) * np.float32(dm[1])
        d2 = ddx * ddx + ddy * ddy
        if po is not None:
            ddo = (po - gz) * np.float32(dm[2])
            d2 = d2 + ddo * ddo
        return d2

    if es.reward_type == "dist":
        outer = -jnp.sqrt(comps(0)) / np.float32(es.scale)
    elif es.reward_type == "goal":
        outer = jnp.full_like(px, np.float32(es.penalty))
    else:
        outer = jnp.zeros_like(px)
    term = jnp.zeros_like(px, dtype=jnp.bool_)
    for gi in reversed(range(len(es.goal_valid))):
        if not es.goal_valid[gi]:
            continue
        near = comps(gi) <= np.float32(es.goal_threshold[gi] ** 2)
        term = term | near
        if es.reward_type == "goal":
            outer = jnp.where(near, np.float32(es.goal_scale[gi]), outer)
    return outer, term


def _lane_specs(rows: Sequence[int], tile: int, n_smem: int):
    specs = [
        pl.BlockSpec((r, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
        for r in rows
    ]
    specs += [pl.BlockSpec(memory_space=pltpu.SMEM)] * n_smem
    return specs


def _out_struct(rows: Sequence[int], dtypes, num_envs: int):
    return [
        jax.ShapeDtypeStruct((r, num_envs), dt)
        for r, dt in zip(rows, dtypes)
    ]


class LaneEnvKernel:
    """Factory for the rollout/step pallas_calls of one robot family.

    Parameters
    ----------
    nq, nv, nu : state / velocity / action dof counts (lane rows).
    env_step : the per-step body ``(q, v, t, ctrl, *smem_reads) ->
        (q, v, t, reward, term, trunc)`` on lane-vector tuples.
    sample_ctrl : ``tile -> ctrl tuple`` random-action law (rollout mode).
    sample_reset : ``(q, v, tile) -> (q_r tuple, v_r tuple)`` reset law.
    smem_tables : optional jnp arrays passed as SMEM refs; ``env_step``
        receives one scalar-read callable per table (``lambda i: ref[i]``).
    default_tile : lane tile; halved externally for VMEM-heavy worlds.
    compiler_params : optional ``pltpu.CompilerParams`` (VMEM limits).
    n_goal : when > 0, ``build_step`` takes an extra per-env goal operand
        ``goal (B, n_goal, 3)`` carried as ``3*n_goal`` lane rows, and
        ``env_step`` is called with ``goal=((gx, gy, gz), ...)`` lane
        triples — the ``sample_goals()`` fast path (``build_rollout`` has
        no goal operand: in-kernel auto-reset cannot run a task's
        arbitrary ``sample_goal_positions`` law, so goal-sampling tasks
        ride ``build_step`` with resets folded in XLA).
    """

    def __init__(
        self,
        nq: int,
        nv: int,
        nu: int,
        env_step: Callable,
        sample_ctrl: Callable,
        sample_reset: Callable,
        smem_tables: Sequence[jnp.ndarray] = (),
        default_tile: int = 1024,
        compiler_params: Optional[object] = None,
        n_goal: int = 0,
    ) -> None:
        self.nq, self.nv, self.nu = nq, nv, nu
        self.env_step = env_step
        self.sample_ctrl = sample_ctrl
        self.sample_reset = sample_reset
        self.smem_tables = tuple(smem_tables)
        self.default_tile = default_tile
        self.compiler_params = compiler_params
        self.n_goal = n_goal

    # ------------------------------------------------------------------
    def _call(self, kernel, in_rows, out_rows, out_dtypes, num_envs, tile,
              n_smem, interpret):
        kwargs = {}
        if self.compiler_params is not None:
            kwargs["compiler_params"] = self.compiler_params
        return pl.pallas_call(
            kernel,
            grid=(num_envs // tile,),
            in_specs=_lane_specs(in_rows, tile, n_smem),
            out_specs=_lane_specs(out_rows, tile, 0),
            out_shape=_out_struct(out_rows, out_dtypes, num_envs),
            interpret=interpret,
            **kwargs,
        )

    def _resolve(self, num_envs, tile, interpret):
        tile = min(tile or self.default_tile, num_envs)
        assert num_envs % tile == 0
        if interpret is None:
            interpret = interpret_default()
        return tile, interpret

    # ------------------------------------------------------------------
    def build_rollout(self, num_envs: int, num_steps: int,
                      tile: int | None = None, interpret: bool = None):
        """jit-able ``(qpos(B,nq), qvel(B,nv), t(B,), seed ()) ->
        (qpos', qvel', t', reward_sum (), episodes ())`` — the on-core
        random-policy rollout with auto-reset, zero host interchange."""
        tile, interpret = self._resolve(num_envs, tile, interpret)
        nq, nv = self.nq, self.nv
        n_smem = 1 + len(self.smem_tables)  # seed + tables

        def kernel(qpos_ref, qvel_ref, t_ref, seed_ref, *refs):
            smem_refs = refs[: len(self.smem_tables)]
            out_qpos, out_qvel, out_t, out_rew, out_eps = refs[
                len(self.smem_tables):]
            pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
            reads = tuple(
                (lambda r: (lambda i: r[i]))(r) for r in smem_refs
            )
            q = tuple(qpos_ref[i, :] for i in range(nq))
            v = tuple(qvel_ref[i, :] for i in range(nv))
            t = t_ref[0, :]

            def body(_, carry):
                q, v, t, rew_sum, eps = carry
                ctrl = self.sample_ctrl(tile)
                q, v, t, reward, term, trunc = self.env_step(
                    q, v, t, ctrl, *reads)
                done = term | trunc
                q_r, v_r = self.sample_reset(q, v, tile)
                q = tuple(jnp.where(done, a, b) for a, b in zip(q_r, q))
                v = tuple(jnp.where(done, a, b) for a, b in zip(v_r, v))
                t = jnp.where(done, 0, t)
                return q, v, t, rew_sum + reward, eps + done.astype(jnp.int32)

            q, v, t, rew_sum, eps = jax.lax.fori_loop(
                0, num_steps, body,
                (q, v, t, jnp.zeros((tile,), jnp.float32),
                 jnp.zeros((tile,), jnp.int32)),
            )
            for i in range(nq):
                out_qpos[i, :] = q[i]
            for i in range(nv):
                out_qvel[i, :] = v[i]
            out_t[0, :] = t
            out_rew[0, :] = rew_sum
            out_eps[0, :] = eps

        call = self._call(
            kernel,
            in_rows=[nq, nv, 1],
            out_rows=[nq, nv, 1, 1, 1],
            out_dtypes=[jnp.float32, jnp.float32, jnp.int32, jnp.float32,
                        jnp.int32],
            num_envs=num_envs, tile=tile, n_smem=n_smem,
            interpret=interpret,
        )
        tables = self.smem_tables

        @jax.jit
        def rollout(qpos, qvel, t, seed):
            qp, qv, tt, rew, eps = call(
                qpos.T.astype(jnp.float32),
                qvel.T.astype(jnp.float32),
                t[None, :].astype(jnp.int32),
                seed[None].astype(jnp.int32),
                *tables,
            )
            return qp.T, qv.T, tt[0], jnp.sum(rew), jnp.sum(eps)

        return rollout

    # ------------------------------------------------------------------
    def build_step(self, num_envs: int, tile: int | None = None,
                   interpret: bool = None):
        """Single-step mode with explicit actions, no auto-reset — the
        differential-testing surface and the public batched-API fast
        path (``BatchedMazeEnv._build_fast_step``)."""
        tile, interpret = self._resolve(num_envs, tile, interpret)
        nq, nv, nu, ng = self.nq, self.nv, self.nu, self.n_goal

        def kernel(qpos_ref, qvel_ref, t_ref, act_ref, *refs):
            if ng > 0:
                goal_ref, refs = refs[0], refs[1:]
            smem_refs = refs[: len(self.smem_tables)]
            out_qpos, out_qvel, out_t, out_rew, out_term = refs[
                len(self.smem_tables):]
            reads = tuple(
                (lambda r: (lambda i: r[i]))(r) for r in smem_refs
            )
            q = tuple(qpos_ref[i, :] for i in range(nq))
            v = tuple(qvel_ref[i, :] for i in range(nv))
            t = t_ref[0, :]
            ctrl = tuple(act_ref[i, :] for i in range(nu))
            kwargs = {}
            if ng > 0:
                kwargs["goal"] = tuple(
                    tuple(goal_ref[3 * g + c, :] for c in range(3))
                    for g in range(ng))
            q, v, t, reward, term, trunc = self.env_step(
                q, v, t, ctrl, *reads, **kwargs)
            for i in range(nq):
                out_qpos[i, :] = q[i]
            for i in range(nv):
                out_qvel[i, :] = v[i]
            out_t[0, :] = t
            out_rew[0, :] = reward
            out_term[0, :] = term

        call = self._call(
            kernel,
            in_rows=[nq, nv, 1, nu] + ([3 * ng] if ng > 0 else []),
            out_rows=[nq, nv, 1, 1, 1],
            out_dtypes=[jnp.float32, jnp.float32, jnp.int32, jnp.float32,
                        jnp.bool_],
            num_envs=num_envs, tile=tile, n_smem=len(self.smem_tables),
            interpret=interpret,
        )
        tables = self.smem_tables

        if ng > 0:
            @jax.jit
            def step(qpos, qvel, t, actions, goal):
                qp, qv, tt, rew, term = call(
                    qpos.T.astype(jnp.float32),
                    qvel.T.astype(jnp.float32),
                    t[None, :].astype(jnp.int32),
                    actions.T.astype(jnp.float32),
                    goal.reshape(goal.shape[0], 3 * ng).T.astype(jnp.float32),
                    *tables,
                )
                return qp.T, qv.T, tt[0], rew[0], term[0]

            return step

        @jax.jit
        def step(qpos, qvel, t, actions):
            qp, qv, tt, rew, term = call(
                qpos.T.astype(jnp.float32),
                qvel.T.astype(jnp.float32),
                t[None, :].astype(jnp.int32),
                actions.T.astype(jnp.float32),
                *tables,
            )
            return qp.T, qv.T, tt[0], rew[0], term[0]

        return step
