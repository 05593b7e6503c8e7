"""Sharded rollout driver + host-scaling measurement.

The distributed execution surface the reference lacks entirely (its only
IPC is the viewer pipe — SURVEY §5): env batches sharded over the mesh
``data`` axis, rollouts running as one jitted scan with GSPMD-inserted
collectives for the aggregate metrics, per-host egress of only the local
shard, and a scaling-efficiency harness for the ≥90%-linear multi-host
target (BASELINE.md).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..envs.batched import BatchedMazeEnv
from ..envs.env import EnvState
from .mesh import env_sharding, shard_env_state


@dataclass
class ShardedRollout:
    """A batched env bound to a mesh: sharded reset/rollout entry points."""

    env: BatchedMazeEnv
    mesh: object

    def reset(self, key: jax.Array) -> Tuple[EnvState, jnp.ndarray]:
        state, obs = self.env.reset(key)
        return shard_env_state(state, self.mesh), obs

    def rollout_metrics(self, state: EnvState, num_steps: int, key: jax.Array):
        """On-device sharded rollout; returns (state', reward_sum, episodes).

        The reductions inside (jnp.sum over the batch) become psum over the
        ``data`` axis via GSPMD — the cross-host aggregation path.
        """
        policy = self.env.random_policy()
        roll = jax.jit(
            lambda s, k: self.env.rollout_metrics(s, policy, num_steps, k),
            out_shardings=(
                jax.tree_util.tree_map(
                    lambda _: env_sharding(self.mesh), state
                ),
                NamedSharding(self.mesh, P()),
                NamedSharding(self.mesh, P()),
            ),
        )
        return roll(state, key)

    def local_shard(self, state: EnvState):
        """This host's addressable slice of the batch as host numpy arrays
        (rollout egress — each host hands its own shard to its consumer)."""
        import numpy as np

        def take_local(x):
            shards = sorted(
                x.addressable_shards,
                key=lambda s: s.index[0].start or 0 if s.index else 0,
            )
            if not shards:
                return np.asarray(x)
            return np.concatenate([np.asarray(s.data) for s in shards], axis=0)

        return jax.tree_util.tree_map(take_local, state)


def scaling_efficiency(
    env_id: str,
    num_envs: int = 4096,
    steps: int = 256,
    device_counts: Optional[list] = None,
) -> dict:
    """Throughput vs number of devices (on-host mesh slices).

    On a multi-host pod the same harness measures host scaling — devices
    belonging to other hosts join through ``jax.distributed``.
    """
    from .. import make_batched
    from .mesh import make_mesh

    devices = jax.devices()
    if device_counts is None:
        device_counts = [n for n in (1, 2, 4, 8) if n <= len(devices)]
    results = {}
    for n in device_counts:
        mesh = make_mesh(n_data=n, n_model=1, devices=devices[:n])
        env = make_batched(env_id, num_envs=num_envs)
        runner = ShardedRollout(env, mesh)
        state, _ = runner.reset(jax.random.PRNGKey(0))
        out = runner.rollout_metrics(state, steps, jax.random.PRNGKey(1))
        jax.block_until_ready(out[0].qpos)
        t0 = time.perf_counter()
        out = runner.rollout_metrics(out[0], steps, jax.random.PRNGKey(2))
        jax.block_until_ready(out[0].qpos)
        dt = time.perf_counter() - t0
        results[n] = num_envs * steps / dt
    base = results[device_counts[0]] / device_counts[0]
    results["efficiency"] = {
        n: results[n] / (n * base) for n in device_counts
    }
    return results
