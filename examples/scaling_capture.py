"""Batch-axis scaling capture: fused-kernel throughput vs num_envs.

The BASELINE benchmark point (4096 envs) is not the chip's ceiling — the
lane kernels keep scaling until the VPU saturates.  This sweeps a list of
batch sizes for one env ID and writes
``examples/out/scaling_<env_id>.json`` (the artifact cited in DESIGN.md).

Run on the TPU chip::

    python examples/scaling_capture.py PointUMaze-v0 1024 4096 16384 65536
    python examples/scaling_capture.py AntUMaze-v0 1024 4096 8192 16384

Kernels are AOT-artifact-cached (utils/kernel_cache.py), so re-runs skip
the per-batch-size retrace.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    env_id = sys.argv[1] if len(sys.argv) > 1 else "PointUMaze-v0"
    sizes = [int(s) for s in sys.argv[2:]] or [1024, 4096, 16384, 65536]
    reps = int(os.environ.get("SCALING_REPS", "3"))

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )

    import mujoco_maze_tpu as mmt
    from mujoco_maze_tpu import ops

    steps = 1024 if "Point" in env_id or "Swimmer" in env_id else 128
    out = {}
    for b in sizes:
        env = mmt.make_batched(env_id, num_envs=b, fast_step=False)
        roll = ops.make_fast_rollout(env, steps)
        if roll is None:
            print(f"{env_id}: no fused kernel", file=sys.stderr)
            return
        state, _ = env.reset(jax.random.PRNGKey(0))
        carry = roll(state.qpos, state.qvel, state.t,
                     jnp.asarray(7, jnp.int32))
        jax.block_until_ready(carry[0])
        rates = []
        for rep in range(reps):
            t0 = time.perf_counter()
            carry = roll(carry[0], carry[1], carry[2],
                         jnp.asarray(rep, jnp.int32))
            jax.block_until_ready(carry[0])
            rates.append(int(b * steps / (time.perf_counter() - t0)))
        out[str(b)] = rates
        print(f"B={b}: {max(rates):,} env-steps/s", file=sys.stderr)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "out",
                        f"scaling_{env_id.replace('-', '_')}.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump({
            "config": f"{env_id} pallas rollout kernel, {steps} steps, "
                      "v5e chip",
            "envs_vs_steps_per_s": out,
        }, f, indent=1)
    print(path)


if __name__ == "__main__":
    main()
