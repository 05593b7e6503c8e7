"""Headline benchmark: PointUMaze env-steps/s/chip at 4096 parallel envs.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the driver north star of 1M env-steps/s/chip on PointUMaze @4096
envs (BASELINE.json; the reference itself publishes no perf numbers —
BASELINE.md).  The rollout runs entirely on device (lax.scan, no trajectory
egress); timing excludes compilation, includes dispatch.
"""

from __future__ import annotations

import json
import time

NUM_ENVS = 4096
STEPS = 1024
REPS = 3
BASELINE_STEPS_PER_S = 1.0e6


def main() -> None:
    import jax

    import mujoco_maze_tpu as mmt

    env = mmt.make_batched("PointUMaze-v0", num_envs=NUM_ENVS)
    state, _ = env.reset(jax.random.PRNGKey(0))
    policy = env.random_policy()

    roll = jax.jit(lambda s, k: env.rollout_metrics(s, policy, STEPS, k))
    # warm up / compile
    out = roll(state, jax.random.PRNGKey(1))
    jax.block_until_ready(out[0].qpos)

    best = 0.0
    for rep in range(REPS):
        t0 = time.perf_counter()
        out = roll(out[0], jax.random.PRNGKey(2 + rep))
        jax.block_until_ready(out[0].qpos)
        dt = time.perf_counter() - t0
        best = max(best, NUM_ENVS * STEPS / dt)

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
