"""Batched lockstep environment: vmap + jit + in-kernel auto-reset.

This is the TPU-native replacement for the reference's single synchronous
``MazeEnv.step`` loop (`/root/reference/mujoco_maze/maze_env.py:448-481`) +
Gym ``TimeLimit`` wrapper: thousands of envs stepped as one fused kernel,
with per-env auto-reset folded in so the batch never leaves the device, and
``rollout`` driving whole trajectories under one ``lax.scan``.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from .env import EnvState, MazeEnvSpec, StepResult


class BatchedMazeEnv:
    """A fixed-size batch of identical envs stepped in lockstep."""

    def __init__(
        self, spec: MazeEnvSpec, num_envs: int, auto_reset: bool = True,
        fast_step: bool | None = None, engine_batched: bool | None = None,
    ) -> None:
        self.spec = spec
        self.num_envs = num_envs
        self.auto_reset = auto_reset

        self._reset_batch = jax.jit(jax.vmap(spec.reset))
        self._step_batch = jax.jit(jax.vmap(self._step_single))

        # fused Pallas step kernel (ops.make_fast_step): batch on VPU
        # lanes, whole frame_skip x RK4 x env-head step in one pallas_call.
        # Default on for float32 specs on TPU; pass fast_step=True to force
        # (interpret mode on CPU — slow, used by the differential tests).
        self._fast = None
        if fast_step is None:
            fast_step = (jax.default_backend() == "tpu"
                         and spec.dtype == jnp.float32)
        if fast_step:
            from ..ops import make_fast_step

            kern = make_fast_step(self)
            if kern is not None:
                self._fast = self._build_fast_step(kern)
        # batch-last XLA engine (physics/engine_batched): the fallback for
        # engine-world robots with no Pallas kernel (custom robots composed
        # through the extension API).  The vmapped per-env path leaves the
        # tiny per-env dims on the TPU lanes; the batch-last layout is the
        # same pipeline transposed.  Auto on TPU; opt in elsewhere
        # (engine_batched=True) — its one-time compile is heavy.
        if engine_batched is None:
            engine_batched = (jax.default_backend() == "tpu"
                              and spec.dtype == jnp.float32)
        if (self._fast is None and engine_batched
                and getattr(spec.robot, "USES_WORLD_ENGINE", False)
                and not spec.task.sample_goals()):
            self._fast = self._build_fast_step(self._engine_batched_kern())

    def _engine_batched_kern(self):
        """Adapter: the batch-last engine dynamics step exposed with the
        Pallas step-kernel signature (qpos, qvel, t, actions) →
        (qpos', qvel', t', reward, terminated)."""
        from ..physics import engine_batched as engb

        spec = self.spec
        heads = self.spec.heads
        dyn = engb.build_dynamics_step(spec)

        def kern(qpos, qvel, t, actions):
            a = actions.astype(spec.dtype)
            xy0 = qpos[:, :2]
            qp, qv = dyn(qpos.astype(spec.dtype), qvel.astype(spec.dtype), a)
            tt = t + 1

            def env_heads(q, v, t_, xy0_, act):
                st = EnvState(qpos=q, qvel=v, t=t_,
                              key=jax.random.PRNGKey(0), goal_pos=None)
                obs = spec._observe(st)
                fwd, cc = spec.robot.inner_reward_terms(xy0_, q[:2], act)
                inner = spec.robot.FORWARD_REWARD_WEIGHT * fwd - cc
                reward = (spec.inner_reward_scaling * inner
                          + heads.reward(obs, None)).astype(spec.dtype)
                return reward, heads.termination(obs, None)

            reward, term = jax.vmap(env_heads)(qp, qv, tt, xy0, a)
            return qp, qv, tt, reward, term

        return kern

    def _build_fast_step(self, kern):
        """Wrap the raw kernel with obs/info assembly + XLA auto-reset."""
        from .env import EPISODE_LIMIT

        spec = self.spec
        robot = spec.robot
        auto_reset = self.auto_reset
        # sample_goals() tasks: the kernel carries per-env goal positions
        # (ops.make_fast_step's fifth operand); resets below resample them
        # through spec.reset like every other state leaf
        takes_goal = spec.task.sample_goals()

        def fstep(state: EnvState, actions: jnp.ndarray) -> StepResult:
            xy0 = state.qpos[:, :2]
            if takes_goal:
                qp, qv, tt, rew, term = kern(
                    state.qpos, state.qvel, state.t, actions,
                    state.goal_pos)
            else:
                qp, qv, tt, rew, term = kern(
                    state.qpos, state.qvel, state.t, actions)
            qp = qp.astype(spec.dtype)
            qv = qv.astype(spec.dtype)
            trunc = tt >= EPISODE_LIMIT
            # exact obs parity with the XLA path (extras like observed
            # block/ball centers derive from qpos)
            obs = jax.vmap(
                lambda q, v, t, k, g: spec._observe(
                    EnvState(qpos=q, qvel=v, t=t, key=k, goal_pos=g))
            )(qp, qv, tt, state.key, state.goal_pos)
            info = {"position": qp[:, :2]}
            if not robot.MANUAL_COLLISION:
                fwd, cc = jax.vmap(robot.inner_reward_terms)(
                    xy0, qp[:, :2], actions.astype(spec.dtype))
                info = {"reward_forward": fwd, "reward_ctrl": -cc, **info}
            res = StepResult(
                state=EnvState(qpos=qp, qvel=qv, t=tt, key=state.key,
                               goal_pos=state.goal_pos),
                obs=obs, reward=rew.astype(spec.dtype),
                terminated=term, truncated=trunc, info=info,
            )
            if not auto_reset:
                return res
            done = term | trunc
            ks = jax.vmap(jax.random.split)(state.key)       # (B, 2, 2)
            reset_state, reset_obs = jax.vmap(spec.reset)(ks[:, 0])

            def fold(r, s):
                d = done.reshape(done.shape + (1,) * (r.ndim - 1))
                return jnp.where(d, r, s)

            new_state = jax.tree_util.tree_map(fold, reset_state, res.state)
            new_state = new_state._replace(
                key=fold(reset_state.key, ks[:, 1]))
            return res._replace(state=new_state, obs=fold(reset_obs, obs))

        return jax.jit(fstep)

    # -- single-env step with auto-reset folded in ------------------------
    def _step_single(self, state: EnvState, action: jnp.ndarray) -> StepResult:
        res = self.spec.step(state, action)
        if not self.auto_reset:
            return res
        done = res.terminated | res.truncated
        key_reset, key_carry = jax.random.split(res.state.key)
        reset_state, reset_obs = self.spec.reset(key_reset)
        # Branch-free fold: every env pays the (cheap) reset cost; the batch
        # stays on-device with static shapes.
        new_state = jax.tree_util.tree_map(
            lambda r, s: jnp.where(done, r, s), reset_state, res.state
        )
        new_state = new_state._replace(
            key=jnp.where(done, reset_state.key, key_carry)
        )
        obs = jnp.where(done, reset_obs, res.obs)
        return StepResult(
            state=new_state,
            obs=obs,
            reward=res.reward,
            terminated=res.terminated,
            truncated=res.truncated,
            info=res.info,
        )

    # -- public API --------------------------------------------------------
    def reset(self, key: jax.Array) -> Tuple[EnvState, jnp.ndarray]:
        keys = jax.random.split(key, self.num_envs)
        return self._reset_batch(keys)

    def step(self, state: EnvState, action: jnp.ndarray) -> StepResult:
        """state: batched EnvState; action: (num_envs, action_dim)."""
        if self._fast is not None:
            return self._fast(state, action)
        return self._step_batch(state, action)

    def rollout(
        self,
        state: EnvState,
        policy: Callable[[jnp.ndarray, jax.Array], jnp.ndarray],
        num_steps: int,
        key: jax.Array,
    ):
        """Scan ``num_steps`` lockstep steps on device.

        ``policy(obs_batch, key) -> action_batch``.  Returns the final state
        and stacked (obs, reward, terminated) trajectories.
        """
        obs0 = jax.vmap(self.spec._observe)(state)
        step_fn = self._fast if self._fast is not None else self._step_batch

        def body(carry, key_t):
            st, obs = carry
            actions = policy(obs, key_t)
            res = step_fn(st, actions)
            return (res.state, res.obs), (res.obs, res.reward, res.terminated)

        keys = jax.random.split(key, num_steps)
        (final_state, final_obs), traj = jax.lax.scan(body, (state, obs0), keys)
        return final_state, traj

    def rollout_metrics(
        self,
        state: EnvState,
        policy: Callable[[jnp.ndarray, jax.Array], jnp.ndarray],
        num_steps: int,
        key: jax.Array,
    ):
        """Scan without trajectory stacking: returns final state + summed
        reward / episode counts.  The benchmark path — nothing leaves the
        device until the final scalars."""
        obs0 = jax.vmap(self.spec._observe)(state)
        step_fn = self._fast if self._fast is not None else self._step_batch

        def body(carry, key_t):
            st, obs, rew_sum, ep_count = carry
            actions = policy(obs, key_t)
            res = step_fn(st, actions)
            done = res.terminated | res.truncated
            return (
                res.state,
                res.obs,
                rew_sum + jnp.sum(res.reward),
                ep_count + jnp.sum(done),
            ), None

        keys = jax.random.split(key, num_steps)
        init = (
            state,
            obs0,
            jnp.zeros((), self.spec.dtype),
            jnp.zeros((), jnp.int32),
        )
        (final_state, _, rew_sum, ep_count), _ = jax.lax.scan(body, init, keys)
        return final_state, rew_sum, ep_count

    def random_policy(self) -> Callable[[jnp.ndarray, jax.Array], jnp.ndarray]:
        low, high = self.spec.action_bounds()
        low = jnp.asarray(low, self.spec.dtype)
        high = jnp.asarray(high, self.spec.dtype)

        def policy(obs, key):
            return jax.random.uniform(
                key,
                (self.num_envs, self.spec.robot.action_dim),
                minval=low,
                maxval=high,
                dtype=self.spec.dtype,
            )

        return policy
