"""PPO on the lockstep engine: the on-device rollout consumer.

Complements the minimal A2C step in :mod:`.train` with the standard
production recipe — GAE(λ), clipped surrogate, entropy bonus, minibatched
epochs — all under one jit with the env batch sharded over the mesh ``data``
axis and the policy tensor-parallel over ``model``.  The rollout, advantage
computation, and optimization never leave the device.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..envs.batched import BatchedMazeEnv
from ..envs.env import EnvState
from .mesh import DATA_AXIS
from .train import (
    PolicyParams,
    _gaussian_logp,
    init_params,
    param_shardings,
    policy_apply,
)


class PPOConfig(NamedTuple):
    rollout_len: int = 64
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_eps: float = 0.2
    lr: float = 3e-4
    epochs: int = 4
    num_minibatches: int = 4
    vf_coef: float = 0.5
    ent_coef: float = 0.0
    max_grad_norm: float = 0.5


class PPOState(NamedTuple):
    params: PolicyParams
    opt_m: PolicyParams      # Adam first moment
    opt_v: PolicyParams      # Adam second moment
    opt_t: jnp.ndarray
    env_state: EnvState


def init_ppo(
    env: BatchedMazeEnv, key: jax.Array, hidden: int = 256
) -> PPOState:
    kp, ke = jax.random.split(key)
    params = init_params(
        kp, obs_dim=env.spec.obs_dim, act_dim=env.spec.robot.action_dim,
        hidden=hidden,
    )
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    env_state, _ = env.reset(ke)
    return PPOState(
        params=params, opt_m=zeros, opt_v=zeros,
        opt_t=jnp.zeros((), jnp.int32), env_state=env_state,
    )


def make_ppo_step(
    env: BatchedMazeEnv, cfg: PPOConfig = PPOConfig(), mesh: Optional[Mesh] = None
):
    """One PPO iteration: rollout → GAE → minibatched clipped updates.

    Returns a jitted ``(state: PPOState, key) -> (PPOState, metrics)``.
    """
    spec = env.spec
    a_low, a_high = spec.action_bounds()
    a_low = jnp.asarray(a_low, spec.dtype)
    a_high = jnp.asarray(a_high, spec.dtype)
    B = env.num_envs

    # the fused Pallas step when the env built one (TPU default)
    step_fn = (env._fast if getattr(env, "_fast", None) is not None
               else env._step_batch)

    def collect(params, env_state, key):
        obs0 = jax.vmap(spec._observe)(env_state)

        def body(carry, key_t):
            st, obs = carry
            mean, value = policy_apply(params, obs)
            action = mean + jnp.exp(params.log_std) * jax.random.normal(
                key_t, mean.shape, mean.dtype
            )
            action = jnp.clip(action, a_low, a_high)
            logp = _gaussian_logp(mean, params.log_std, action)
            res = step_fn(st, action)
            done = res.terminated | res.truncated
            out = (obs, action, logp, value, res.reward, done)
            return (res.state, res.obs), out

        keys = jax.random.split(key, cfg.rollout_len)
        (env_state, last_obs), traj = jax.lax.scan(body, (env_state, obs0), keys)
        _, last_value = policy_apply(params, last_obs)
        return env_state, traj, last_value

    def gae(values, rewards, dones, last_value):
        def body(carry, xs):
            adv_next, v_next = carry
            v, r, d = xs
            nd = 1.0 - d.astype(r.dtype)
            delta = r + cfg.gamma * v_next * nd - v
            adv = delta + cfg.gamma * cfg.gae_lambda * nd * adv_next
            return (adv, v), adv

        (_, _), advs = jax.lax.scan(
            body,
            (jnp.zeros_like(last_value), last_value),
            (values, rewards, dones),
            reverse=True,
        )
        return advs

    def loss_fn(params, batch):
        obs, action, logp_old, adv, ret = batch
        mean, value = policy_apply(params, obs)
        logp = _gaussian_logp(mean, params.log_std, action)
        ratio = jnp.exp(logp - logp_old)
        adv_n = (adv - adv.mean()) / (adv.std() + 1e-8)
        pg = -jnp.minimum(
            ratio * adv_n,
            jnp.clip(ratio, 1 - cfg.clip_eps, 1 + cfg.clip_eps) * adv_n,
        ).mean()
        vf = 0.5 * jnp.mean((value - ret) ** 2)
        ent = jnp.sum(params.log_std + 0.5 * jnp.log(2 * jnp.pi * jnp.e))
        return pg + cfg.vf_coef * vf - cfg.ent_coef * ent, (pg, vf)

    def adam(params, m, v, t, grads):
        b1, b2, eps = 0.9, 0.999, 1e-8
        t = t + 1
        m = jax.tree_util.tree_map(lambda a, g: b1 * a + (1 - b1) * g, m, grads)
        v = jax.tree_util.tree_map(lambda a, g: b2 * a + (1 - b2) * g * g, v, grads)
        # global-norm clip on the bias-corrected step direction
        mh = jax.tree_util.tree_map(lambda a: a / (1 - b1**t), m)
        vh = jax.tree_util.tree_map(lambda a: a / (1 - b2**t), v)
        step = jax.tree_util.tree_map(
            lambda a, b: a / (jnp.sqrt(b) + eps), mh, vh
        )
        gn = jnp.sqrt(
            sum(jnp.sum(x * x) for x in jax.tree_util.tree_leaves(step))
        )
        scale = jnp.minimum(1.0, cfg.max_grad_norm / (gn + 1e-8))
        params = jax.tree_util.tree_map(
            lambda p, s: p - cfg.lr * scale * s, params, step
        )
        return params, m, v, t

    def ppo_step(state: PPOState, key: jax.Array):
        k_roll, k_perm = jax.random.split(key)
        env_state, traj, last_value = collect(state.params, state.env_state, k_roll)
        obs, action, logp, value, reward, done = traj
        adv = gae(value, reward, done, last_value)
        ret = adv + value
        # flatten (T, B, ...) → (T*B, ...)
        flat = jax.tree_util.tree_map(
            lambda x: x.reshape((-1,) + x.shape[2:]), (obs, action, logp, adv, ret)
        )
        n = cfg.rollout_len * B
        mb = n // cfg.num_minibatches

        def epoch(carry, key_e):
            params, m, v, t = carry
            perm = jax.random.permutation(key_e, n)

            def minibatch(carry, idx):
                params, m, v, t = carry
                batch = jax.tree_util.tree_map(lambda x: x[idx], flat)
                grads, aux = jax.grad(loss_fn, has_aux=True)(params, batch)
                params, m, v, t = adam(params, m, v, t, grads)
                return (params, m, v, t), aux

            idxs = perm[: mb * cfg.num_minibatches].reshape(
                cfg.num_minibatches, mb
            )
            (params, m, v, t), aux = jax.lax.scan(
                minibatch, (params, m, v, t), idxs
            )
            return (params, m, v, t), aux

        keys_e = jax.random.split(k_perm, cfg.epochs)
        (params, m, v, t), aux = jax.lax.scan(
            epoch, (state.params, state.opt_m, state.opt_v, state.opt_t), keys_e
        )
        metrics = {
            "mean_reward": reward.mean(),
            "episodes": done.sum().astype(jnp.int32),
            "pg_loss": aux[0].mean(),
            "vf_loss": aux[1].mean(),
        }
        return (
            PPOState(params=params, opt_m=m, opt_v=v, opt_t=t, env_state=env_state),
            metrics,
        )

    if mesh is not None:
        p_shard = param_shardings(mesh)
        env_shard = NamedSharding(mesh, P(DATA_AXIS))
        rep = NamedSharding(mesh, P())
        state_shardings = PPOState(
            params=p_shard,
            opt_m=p_shard,
            opt_v=p_shard,
            opt_t=rep,
            env_state=jax.tree_util.tree_map(lambda _: env_shard, EnvState(
                qpos=None, qvel=None, t=None, key=None
            )),
        )
        return jax.jit(
            ppo_step,
            in_shardings=(state_shardings, rep),
            out_shardings=(state_shardings, rep),
        )
    return jax.jit(ppo_step)
