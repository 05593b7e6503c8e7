"""Minimal native-API tour: batched env, scan rollout, pallas fast path.

Usage:  python examples/batched_rollout.py [env_id]
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

# allow running from a repo checkout without installation
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import mujoco_maze_tpu as mmt


def main() -> None:
    env_id = sys.argv[1] if len(sys.argv) > 1 else "PointUMaze-v0"
    env = mmt.make_batched(env_id, num_envs=2048)

    state, obs = env.reset(jax.random.PRNGKey(0))
    print(f"{env_id}: batch obs {obs.shape}")

    # single fused step
    actions = jnp.zeros((2048, env.spec.robot.action_dim), env.spec.dtype)
    res = env.step(state, actions)
    print("step reward mean:", float(res.reward.mean()))

    # whole rollout under one lax.scan
    t0 = time.time()
    final, (O, R, T) = env.rollout(
        state, env.random_policy(), num_steps=256, key=jax.random.PRNGKey(1)
    )
    jax.block_until_ready(final.qpos)
    print(f"rollout 256 steps: traj {O.shape} in {time.time()-t0:.2f}s")

    # pallas fast path (Point, object-free mazes)
    try:
        from mujoco_maze_tpu.ops import point_pallas as pp

        roll = pp.build_rollout_kernel(pp.spec_from_env(env.spec), 2048, 1024)
        qp, qv, t, rew, eps = roll(
            state.qpos, state.qvel, state.t, jnp.asarray(0, jnp.int32)
        )
        jax.block_until_ready(qp)
        t0 = time.time()
        qp, qv, t, rew, eps = roll(qp, qv, t, jnp.asarray(1, jnp.int32))
        jax.block_until_ready(qp)
        rate = 2048 * 1024 / (time.time() - t0)
        print(f"pallas rollout: {rate/1e6:.1f}M env-steps/s")
    except (AssertionError, Exception) as e:  # noqa: BLE001
        print("pallas path unavailable here:", type(e).__name__)


if __name__ == "__main__":
    main()
