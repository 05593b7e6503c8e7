"""Throughput + profiling harness.

The reference has no profiling of any kind (SURVEY §5); this module is the
TPU build's observability surface: steps/s measurement with compile time
split out, optional ``jax.profiler`` traces for xprof, and a simple scaling
sweep across batch sizes.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass
from typing import Dict, List, Optional

import jax


@dataclass
class ThroughputResult:
    env_id: str
    num_envs: int
    steps: int
    compile_s: float
    run_s: float

    @property
    def env_steps_per_s(self) -> float:
        return self.num_envs * self.steps / self.run_s


def measure_throughput(
    env_id: str,
    num_envs: int = 4096,
    steps: int = 1024,
    reps: int = 3,
    seed: int = 0,
    trace_dir: Optional[str] = None,
) -> ThroughputResult:
    """On-device scan rollout throughput (no trajectory egress)."""
    from .. import make_batched

    env = make_batched(env_id, num_envs=num_envs)
    state, _ = env.reset(jax.random.PRNGKey(seed))
    policy = env.random_policy()
    roll = jax.jit(lambda s, k: env.rollout_metrics(s, policy, steps, k))

    t0 = time.perf_counter()
    out = roll(state, jax.random.PRNGKey(seed + 1))
    jax.block_until_ready(out[0].qpos)
    compile_s = time.perf_counter() - t0

    ctx = (
        jax.profiler.trace(trace_dir)
        if trace_dir is not None
        else contextlib.nullcontext()
    )
    best = float("inf")
    with ctx:
        for rep in range(reps):
            t0 = time.perf_counter()
            out = roll(out[0], jax.random.PRNGKey(seed + 2 + rep))
            jax.block_until_ready(out[0].qpos)
            best = min(best, time.perf_counter() - t0)
    return ThroughputResult(
        env_id=env_id, num_envs=num_envs, steps=steps,
        compile_s=compile_s, run_s=best,
    )


def scaling_sweep(
    env_id: str, batch_sizes: List[int], steps: int = 256
) -> Dict[int, float]:
    """env-steps/s across batch sizes (lane-utilization diagnostics)."""
    return {
        n: measure_throughput(env_id, n, steps, reps=2).env_steps_per_s
        for n in batch_sizes
    }
