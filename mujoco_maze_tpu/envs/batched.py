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
        self, spec: MazeEnvSpec, num_envs: int, auto_reset: bool = True
    ) -> None:
        self.spec = spec
        self.num_envs = num_envs
        self.auto_reset = auto_reset

        self._reset_batch = jax.jit(jax.vmap(spec.reset))
        self._step_batch = jax.jit(jax.vmap(self._step_single))

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

        def body(carry, key_t):
            st, obs = carry
            actions = policy(obs, key_t)
            res = self._step_batch(st, actions)
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

        def body(carry, key_t):
            st, obs, rew_sum, ep_count = carry
            actions = policy(obs, key_t)
            res = self._step_batch(st, actions)
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
