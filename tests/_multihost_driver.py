"""Driver executed as one process of an N-process jax.distributed CPU
cluster (spawned by tests/test_multihost.py).

Exercises the real multi-host bootstrap path (`parallel/mesh.multihost_init`
→ `jax.distributed.initialize`) plus a sharded rollout whose metric
reductions cross process boundaries — the DCN analog the reference lacks
entirely (its only IPC is the viewer pipe, SURVEY §5).

Usage: python _multihost_driver.py <coordinator_port> <process_id> <nproc>
Prints one line: ``RESULT rew=<f> eps=<d> local=<d> ndev=<d>``.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    port, pid, nproc = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")

    from mujoco_maze_tpu.parallel.mesh import (
        env_sharding,
        make_mesh,
        multihost_init,
    )

    multihost_init(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 2 * nproc
    # idempotency: a second call must be a no-op, not a crash
    multihost_init()

    import mujoco_maze_tpu as mmt
    from mujoco_maze_tpu.parallel.rollout import ShardedRollout

    mesh = make_mesh()  # all 2*nproc global devices on the data axis
    env = mmt.make_batched("PointUMaze-v0", num_envs=32)
    runner = ShardedRollout(env, mesh)

    # Reset inside jit with global out_shardings: each process computes its
    # own shards (host-local device_put cannot span processes).
    sh = env_sharding(mesh)
    state, _ = jax.jit(env.reset, out_shardings=sh)(jax.random.PRNGKey(0))

    state, rew, eps = runner.rollout_metrics(state, 64, jax.random.PRNGKey(1))
    # The sums inside lower to psum over the data axis → a cross-process
    # collective; every process must see the identical replicated scalar.
    rew = float(rew)
    eps = int(eps)

    local = runner.local_shard(state)
    print(
        f"RESULT rew={rew:.6f} eps={eps} "
        f"local={int(local.qpos.shape[0])} ndev={len(jax.devices())}",
        flush=True,
    )

    if os.environ.get("MMT_MULTIHOST_BENCH", "") == "1":
        # weak-scaling probe: fixed per-host batch, so aggregate
        # throughput / (nproc x single-host) is the host-scaling
        # efficiency (the CPU-mesh proxy for the >=90% target).
        import time

        bench_envs = 256 * nproc  # 256 envs per host
        benv = mmt.make_batched("PointUMaze-v0", num_envs=bench_envs)
        brunner = ShardedRollout(benv, mesh)
        bsh = env_sharding(mesh)
        bstate, _ = jax.jit(benv.reset, out_shardings=bsh)(
            jax.random.PRNGKey(2))
        steps = 256
        out = brunner.rollout_metrics(bstate, steps, jax.random.PRNGKey(3))
        jax.block_until_ready(out[0].qpos)
        best = 0.0
        for rep in range(3):
            t0 = time.perf_counter()
            out = brunner.rollout_metrics(
                out[0], steps, jax.random.PRNGKey(4 + rep))
            jax.block_until_ready(out[0].qpos)
            best = max(best, bench_envs * steps / (time.perf_counter() - t0))
        print(f"THROUGHPUT steps_s={best:.1f} envs={bench_envs}", flush=True)


if __name__ == "__main__":
    main()
