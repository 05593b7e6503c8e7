"""Explicit shard_map rollout: per-device env shards + hand-placed psum.

Complement to the GSPMD-annotated path (`parallel/rollout.py`): here the
SPMD program is written explicitly — each device runs the scan over its own
slice of the env batch and the cross-device reward/episode aggregation is a
literal ``jax.lax.psum`` over the mesh axis. This is the style to reach for
when collective placement must be controlled by hand (e.g. to later swap the
psum for a Pallas ring collective); numerically identical to the annotated
path.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
try:  # jax >= 0.8: keyword-only API, check_rep renamed check_vma
    from jax import shard_map as _shard_map

    def shard_map(f, mesh, in_specs, out_specs, check_rep=True):
        return _shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_vma=check_rep)
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..envs.batched import BatchedMazeEnv
from ..envs.env import EnvState
from .mesh import DATA_AXIS


def make_shardmap_rollout(env: BatchedMazeEnv, mesh: Mesh, num_steps: int,
                          fast_step: bool | None = None):
    """Build jitted ``(state, key) -> (state', reward_sum, episodes)``.

    ``state`` is the batched EnvState (sharded or not — shardings are
    constrained inside); reward_sum/episodes are psum-reduced scalars
    replicated on every device.

    When the env has a fused Pallas step kernel (``env._fast``, the TPU
    default), each device shard runs its own per-shard kernel inside the
    shard_map body — the pallas_call sees only the local slice, so the
    fast path scales across chips without GSPMD having to partition the
    kernel.  Pass ``fast_step=False`` to force the vmapped XLA step (or
    ``True`` to force per-shard kernels, e.g. interpret mode in tests).
    """
    spec = env.spec
    n_dev = mesh.devices.size
    assert env.num_envs % n_dev == 0
    local = env.num_envs // n_dev

    if fast_step is None:
        fast_step = env._fast is not None
    local_step = None
    if fast_step:
        from ..ops import make_fast_step

        kern = make_fast_step(env, num_envs=local)
        if kern is not None:
            local_step = env._build_fast_step(kern)

    low, high = spec.action_bounds()
    low = jnp.asarray(low, spec.dtype)
    high = jnp.asarray(high, spec.dtype)

    def local_rollout(state: EnvState, key: jax.Array):
        """Runs on ONE device over its (local,) env slice."""
        # fold the device id into the key so shards decorrelate
        dev = jax.lax.axis_index(DATA_AXIS)
        key = jax.random.fold_in(key[0], dev)
        obs0 = jax.vmap(spec._observe)(state)

        def body(carry, key_t):
            st, obs = carry
            actions = jax.random.uniform(
                key_t, (local, spec.robot.action_dim),
                minval=low, maxval=high, dtype=spec.dtype,
            )
            if local_step is not None:
                res = local_step(st, actions)
            else:
                res = jax.vmap(env._step_single)(st, actions)
            done = res.terminated | res.truncated
            return (res.state, res.obs), (
                jnp.sum(res.reward), jnp.sum(done.astype(jnp.int32))
            )

        keys = jax.random.split(key, num_steps)
        (state, _), (rews, dones) = jax.lax.scan(body, (state, obs0), keys)
        # explicit cross-device reduction over the data axis
        rew_sum = jax.lax.psum(jnp.sum(rews), DATA_AXIS)
        episodes = jax.lax.psum(jnp.sum(dones), DATA_AXIS)
        return state, rew_sum, episodes

    state_spec = jax.tree_util.tree_map(lambda _: P(DATA_AXIS), EnvState(
        qpos=0, qvel=0, t=0, key=0
    ))
    fn = shard_map(
        local_rollout,
        mesh=mesh,
        in_specs=(state_spec, P(DATA_AXIS)),
        out_specs=(state_spec, P(), P()),
        check_rep=False,
    )

    @jax.jit
    def rollout(state: EnvState, key: jax.Array):
        keys = jax.random.split(key, n_dev)
        return fn(state, keys)

    return rollout
