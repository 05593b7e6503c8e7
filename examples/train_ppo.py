"""PPO training showcase: solve a maze end-to-end on TPU.

Trains a Gaussian-MLP policy with the in-repo PPO (parallel/ppo.py) on a
batched maze env, evaluates greedy success rate, and writes a learning
curve + checkpoint.  The reference repo has no trainer at all (SURVEY §5)
— its README delegates RL to external libraries; here the full loop
(env + policy + PPO + eval + checkpoint) runs jitted on one chip.

Usage:
    python examples/train_ppo.py --env PointUMaze-v0 --num-envs 2048 \
        --iters 200 --out examples/out

Note: first-iteration jit compile takes several minutes on TPU (one-time,
cached); the training loop itself runs ~5M env-steps/s afterwards.
Reference result (one v5e chip): greedy success 0 -> ~0.65 on
PointUMaze-v0 in 39M env-steps / ~8 s device time.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import mujoco_maze_tpu as mmt
from mujoco_maze_tpu.parallel import ppo
from mujoco_maze_tpu.parallel.train import policy_apply
from mujoco_maze_tpu.utils import checkpoint


def make_greedy_eval(env, num_steps: int):
    """Greedy (mean-action) rollout from reset; returns success rate =
    fraction of envs that hit a goal within ``num_steps``."""
    spec = env.spec
    a_low, a_high = spec.action_bounds()
    a_low = jnp.asarray(a_low, spec.dtype)
    a_high = jnp.asarray(a_high, spec.dtype)

    @jax.jit
    def evaluate(params, key):
        state, obs = env.reset(key)

        def body(carry, _):
            state, obs, succeeded = carry
            mean, _ = policy_apply(params, obs)
            action = jnp.clip(mean, a_low, a_high)
            res = env.step(state, action)
            succeeded = succeeded | res.terminated
            return (res.state, res.obs, succeeded), None

        succeeded = jnp.zeros((env.num_envs,), bool)
        (_, _, succeeded), _ = jax.lax.scan(
            body, (state, obs, succeeded), None, length=num_steps
        )
        return succeeded.mean()

    return evaluate


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--env", default="PointUMaze-v0")
    ap.add_argument("--num-envs", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--rollout-len", type=int, default=64)
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--eval-every", type=int, default=20)
    ap.add_argument("--eval-steps", type=int, default=500)
    ap.add_argument("--out", default="examples/out")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    env = mmt.make_batched(args.env, num_envs=args.num_envs)
    cfg = ppo.PPOConfig(rollout_len=args.rollout_len, lr=args.lr)
    state = ppo.init_ppo(env, jax.random.PRNGKey(0), hidden=args.hidden)
    step = ppo.make_ppo_step(env, cfg)
    evaluate = make_greedy_eval(env, args.eval_steps)

    key = jax.random.PRNGKey(1)
    curve = []
    steps_per_iter = args.num_envs * args.rollout_len
    t_start = time.time()
    for it in range(args.iters):
        key, k = jax.random.split(key)
        state, metrics = step(state, k)
        if it % args.eval_every == 0 or it == args.iters - 1:
            key, ke = jax.random.split(key)
            success = float(evaluate(state.params, ke))
            rec = {
                "iter": it,
                "env_steps": it * steps_per_iter,
                "mean_reward": float(metrics["mean_reward"]),
                "episodes": int(metrics["episodes"]),
                "vf_loss": float(metrics["vf_loss"]),
                "greedy_success": success,
                "wall_s": round(time.time() - t_start, 1),
            }
            curve.append(rec)
            print(json.dumps(rec), flush=True)

    tag = args.env.replace("-", "_")
    curve_path = os.path.join(args.out, f"ppo_{tag}_curve.json")
    with open(curve_path, "w") as f:
        json.dump(
            {
                "env": args.env,
                "num_envs": args.num_envs,
                "config": cfg._asdict(),
                "total_env_steps": args.iters * steps_per_iter,
                "wall_s": round(time.time() - t_start, 1),
                "curve": curve,
            },
            f,
            indent=1,
        )
    ckpt_path = os.path.join(args.out, f"ppo_{tag}_params.npz")
    checkpoint.save(ckpt_path, state.params)
    print(f"curve -> {curve_path}\nparams -> {ckpt_path}")


if __name__ == "__main__":
    main()
