"""Headline benchmark: PointUMaze env-steps/s/chip at 4096 parallel envs.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the driver north star of 1M env-steps/s/chip on PointUMaze @4096
envs (BASELINE.json; the reference publishes no perf numbers — BASELINE.md).

Two measurement paths over identical env semantics:
* the fused Pallas rollout kernel (state resident in VMEM, batch-on-lanes,
  on-core PRNG; bit-exact vs the XLA step — tests/test_pallas.py), and
* the generic XLA `lax.scan` path as fallback.
The reported number is the best of the paths that ran.
"""

from __future__ import annotations

import json
import time

NUM_ENVS = 4096
STEPS = 1024
REPS = 3
BASELINE_STEPS_PER_S = 1.0e6


def _bench_xla(env, state, key_base: int) -> float:
    import jax

    policy = env.random_policy()
    roll = jax.jit(lambda s, k: env.rollout_metrics(s, policy, STEPS, k))
    out = roll(state, jax.random.PRNGKey(key_base))
    jax.block_until_ready(out[0].qpos)
    best = 0.0
    for rep in range(REPS):
        t0 = time.perf_counter()
        out = roll(out[0], jax.random.PRNGKey(key_base + 1 + rep))
        jax.block_until_ready(out[0].qpos)
        best = max(best, NUM_ENVS * STEPS / (time.perf_counter() - t0))
    return best


def _bench_pallas(spec, state) -> float:
    import jax
    import jax.numpy as jnp

    from mujoco_maze_tpu.ops import point_pallas as pp

    ks = pp.spec_from_env(spec)
    roll = pp.build_rollout_kernel(ks, NUM_ENVS, STEPS)
    qp, qv, t, _, _ = roll(
        state.qpos, state.qvel, state.t, jnp.asarray(7, jnp.int32)
    )
    jax.block_until_ready(qp)
    best = 0.0
    for rep in range(REPS):
        t0 = time.perf_counter()
        qp, qv, t, _, _ = roll(qp, qv, t, jnp.asarray(rep, jnp.int32))
        jax.block_until_ready(qp)
        best = max(best, NUM_ENVS * STEPS / (time.perf_counter() - t0))
    return best


def main() -> None:
    import jax

    import mujoco_maze_tpu as mmt

    env = mmt.make_batched("PointUMaze-v0", num_envs=NUM_ENVS)
    state, _ = env.reset(jax.random.PRNGKey(0))

    results = {}
    try:
        results["pallas"] = _bench_pallas(env.spec, state)
    except Exception:
        pass
    results["xla"] = _bench_xla(env, state, key_base=1)

    best = max(results.values())
    print(
        json.dumps(
            {
                "metric": "PointUMaze-v0 env-steps/s/chip @4096 envs",
                "value": round(best, 0),
                "unit": "env-steps/s",
                "vs_baseline": round(best / BASELINE_STEPS_PER_S, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
