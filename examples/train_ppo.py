"""Train PPO on a maze env, entirely on-device.

Usage:  python examples/train_ppo.py [env_id] [iterations]

Defaults train PointUMaze-v0 (dense distance reward) at 4096 envs.  Writes
a learning-curve JSON next to this script.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

# allow running from a repo checkout without installation
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import mujoco_maze_tpu as mmt
from mujoco_maze_tpu.parallel import ppo


def main() -> None:
    env_id = sys.argv[1] if len(sys.argv) > 1 else "PointUMaze-v0"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 300
    num_envs = 4096

    env = mmt.make_batched(env_id, num_envs=num_envs)
    cfg = ppo.PPOConfig(
        rollout_len=64, epochs=4, num_minibatches=8, lr=3e-4,
        ent_coef=1e-3, max_grad_norm=0.5,
    )
    state = ppo.init_ppo(env, jax.random.PRNGKey(0), hidden=256)
    step = ppo.make_ppo_step(env, cfg)

    curve = []
    t0 = time.time()
    for i in range(iters):
        state, metrics = step(state, jax.random.PRNGKey(1000 + i))
        if i % 10 == 0 or i == iters - 1:
            rew = float(metrics["mean_reward"])
            eps = int(metrics["episodes"])
            steps_done = (i + 1) * num_envs * cfg.rollout_len
            curve.append({"iter": i, "mean_reward": rew, "episodes": eps,
                          "env_steps": steps_done})
            print(
                f"iter {i:4d}  reward/step {rew:+.4f}  episodes {eps:6d}  "
                f"({steps_done/1e6:.1f}M steps, {time.time()-t0:.0f}s)",
                flush=True,
            )
    out = os.path.join(os.path.dirname(__file__), f"ppo_{env_id}.json")
    with open(out, "w") as f:
        json.dump(curve, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
