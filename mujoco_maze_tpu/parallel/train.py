"""Sharded actor-critic training step over the lockstep engine.

The reference is an env library with no trainer; the TPU build's rollout
consumer is on-device: an MLP actor-critic whose forward/backward runs on
the MXU, with the env batch sharded over the mesh ``data`` axis and the
network hidden dimension tensor-parallel over ``model``.  Sharding is
annotation-driven (GSPMD): parameters carry ``PartitionSpec``s and XLA
inserts the all-reduces.

This is both a usable baseline trainer (A2C-style) and the multi-chip
compile surface exercised by ``__graft_entry__.dryrun_multichip``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..envs.batched import BatchedMazeEnv
from ..envs.env import EnvState
from .mesh import DATA_AXIS, MODEL_AXIS


class PolicyParams(NamedTuple):
    """2-layer tanh MLP torso with Gaussian policy + value heads.

    Tensor-parallel layout: w1 column-sharded, w2/value row-sharded over
    ``model`` (Megatron-style), so the only cross-shard traffic is the
    all-reduce after the second matmul — inserted by GSPMD.
    """

    w1: jnp.ndarray      # (obs_dim, hidden)   P(None, "model")
    b1: jnp.ndarray      # (hidden,)           P("model")
    w2: jnp.ndarray      # (hidden, act_dim)   P("model", None)
    b2: jnp.ndarray      # (act_dim,)          P()
    wv: jnp.ndarray      # (hidden, 1)         P("model", None)
    bv: jnp.ndarray      # (1,)                P()
    log_std: jnp.ndarray  # (act_dim,)         P()


def init_params(
    key: jax.Array, obs_dim: int, act_dim: int, hidden: int = 256,
    dtype=jnp.float32,
) -> PolicyParams:
    k1, k2, k3 = jax.random.split(key, 3)
    scale1 = 1.0 / jnp.sqrt(obs_dim)
    scale2 = 1.0 / jnp.sqrt(hidden)
    return PolicyParams(
        w1=jax.random.normal(k1, (obs_dim, hidden), dtype) * scale1,
        b1=jnp.zeros((hidden,), dtype),
        w2=jax.random.normal(k2, (hidden, act_dim), dtype) * scale2,
        b2=jnp.zeros((act_dim,), dtype),
        wv=jax.random.normal(k3, (hidden, 1), dtype) * scale2,
        bv=jnp.zeros((1,), dtype),
        log_std=jnp.zeros((act_dim,), dtype),
    )


def param_pspecs() -> PolicyParams:
    return PolicyParams(
        w1=P(None, MODEL_AXIS),
        b1=P(MODEL_AXIS),
        w2=P(MODEL_AXIS, None),
        b2=P(),
        wv=P(MODEL_AXIS, None),
        bv=P(),
        log_std=P(),
    )


def param_shardings(mesh: Mesh) -> PolicyParams:
    return jax.tree_util.tree_map(
        lambda spec: NamedSharding(mesh, spec),
        param_pspecs(),
        is_leaf=lambda x: isinstance(x, P),
    )


def policy_apply(params: PolicyParams, obs: jnp.ndarray):
    """(B, obs_dim) → (mean (B, act), value (B,)). MXU path: keep batched."""
    h = jnp.tanh(
        jnp.dot(obs, params.w1, preferred_element_type=jnp.float32) + params.b1
    )
    mean = jnp.dot(h, params.w2, preferred_element_type=jnp.float32) + params.b2
    value = (
        jnp.dot(h, params.wv, preferred_element_type=jnp.float32) + params.bv
    )[..., 0]
    return mean, value


def _gaussian_logp(mean, log_std, action):
    var = jnp.exp(2 * log_std)
    return jnp.sum(
        -0.5 * ((action - mean) ** 2 / var + 2 * log_std + jnp.log(2 * jnp.pi)),
        axis=-1,
    )


class TrainMetrics(NamedTuple):
    loss: jnp.ndarray
    mean_reward: jnp.ndarray
    episodes: jnp.ndarray


def make_train_step(
    env: BatchedMazeEnv,
    mesh: Mesh,
    rollout_len: int = 16,
    lr: float = 3e-4,
    gamma: float = 0.99,
):
    """Build the jitted, mesh-sharded A2C train step.

    env batch axis → ``data``; MLP hidden → ``model``; grads all-reduced by
    GSPMD from the sharding annotations alone.
    """
    spec = env.spec
    a_low, a_high = spec.action_bounds()
    a_low = jnp.asarray(a_low, spec.dtype)
    a_high = jnp.asarray(a_high, spec.dtype)

    # the fused Pallas step when the env built one (TPU default)
    step_fn = (env._fast if getattr(env, "_fast", None) is not None
               else env._step_batch)

    def unroll(params: PolicyParams, state: EnvState, key: jax.Array):
        obs0 = jax.vmap(spec._observe)(state)

        def body(carry, key_t):
            st, obs = carry
            mean, value = policy_apply(params, obs)
            action = mean + jnp.exp(params.log_std) * jax.random.normal(
                key_t, mean.shape, mean.dtype
            )
            action = jnp.clip(action, a_low, a_high)
            res = step_fn(st, action)
            logp = _gaussian_logp(mean, params.log_std, action)
            done = res.terminated | res.truncated
            return (res.state, res.obs), (logp, value, res.reward, done)

        keys = jax.random.split(key, rollout_len)
        (state, obs), (logps, values, rewards, dones) = jax.lax.scan(
            body, (state, obs0), keys
        )
        # n-step discounted returns (backwards scan), bootstrapped off the
        # final value
        _, last_value = policy_apply(params, obs)

        def ret_body(carry, xs):
            reward, done = xs
            ret = reward + gamma * carry * (1.0 - done.astype(reward.dtype))
            return ret, ret

        _, returns = jax.lax.scan(
            ret_body, last_value, (rewards, dones), reverse=True
        )
        adv = returns - values
        pg_loss = -jnp.mean(logps * jax.lax.stop_gradient(adv))
        v_loss = 0.5 * jnp.mean(adv**2)
        loss = pg_loss + v_loss
        metrics = TrainMetrics(
            loss=loss,
            mean_reward=jnp.mean(rewards),
            episodes=jnp.sum(dones).astype(jnp.int32),
        )
        return loss, (state, metrics)

    def train_step(params: PolicyParams, state: EnvState, key: jax.Array):
        (loss, (state, metrics)), grads = jax.value_and_grad(
            unroll, has_aux=True
        )(params, state, key)
        params = jax.tree_util.tree_map(lambda p, g: p - lr * g, params, grads)
        return params, state, metrics

    p_shard = param_shardings(mesh)
    env_shard = NamedSharding(mesh, P(DATA_AXIS))
    state_shardings = EnvState(
        qpos=env_shard, qvel=env_shard, t=env_shard, key=env_shard
    )
    rep = NamedSharding(mesh, P())
    return jax.jit(
        train_step,
        in_shardings=(p_shard, state_shardings, rep),
        out_shardings=(p_shard, state_shardings, rep),
    )
