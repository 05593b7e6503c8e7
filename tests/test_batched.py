"""Batched lockstep semantics: vmap, auto-reset, scan rollout."""

import jax
import jax.numpy as jnp
import numpy as np

import mujoco_maze_tpu as mmt


def test_batched_shapes():
    batch = mmt.make_batched("PointUMaze-v0", num_envs=32)
    state, obs = batch.reset(jax.random.PRNGKey(0))
    assert obs.shape == (32, 7)
    res = batch.step(state, jnp.zeros((32, 2)))
    assert res.obs.shape == (32, 7)
    assert res.reward.shape == (32,)
    assert res.terminated.shape == (32,)


def test_reset_randomization():
    """Per-env keys give distinct reset noise."""
    batch = mmt.make_batched("PointUMaze-v0", num_envs=16)
    _, obs = batch.reset(jax.random.PRNGKey(0))
    assert np.asarray(obs).std(axis=0)[:3].min() > 0.0


def test_autoreset_on_termination():
    """An env that hits the goal restarts near the origin with t=0."""
    batch = mmt.make_batched("PointUMaze-v1", num_envs=4)
    state, _ = batch.reset(jax.random.PRNGKey(0))
    # Teleport env 0 next to the goal (0, 8)
    qpos = state.qpos.at[0, 0].set(0.0).at[0, 1].set(8.0)
    state = state._replace(qpos=qpos)
    res = batch.step(state, jnp.zeros((4, 2)))
    assert bool(res.terminated[0])
    # auto-reset: state restarted, obs is reset obs near origin
    assert int(res.state.t[0]) == 0
    assert abs(float(res.obs[0, 1])) < 0.5
    # env 1..3 unaffected
    assert int(res.state.t[1]) == 1


def test_truncation_at_episode_limit():
    batch = mmt.make_batched("PointUMaze-v0", num_envs=2)
    state, _ = batch.reset(jax.random.PRNGKey(0))
    state = state._replace(t=jnp.full((2,), 999, jnp.int32))
    res = batch.step(state, jnp.zeros((2, 2)))
    assert bool(res.truncated.all())
    assert int(res.state.t[0]) == 0  # auto-reset


def test_rollout_scan():
    batch = mmt.make_batched("PointUMaze-v0", num_envs=8)
    state, _ = batch.reset(jax.random.PRNGKey(0))
    policy = batch.random_policy()
    final, (obs, rew, term) = batch.rollout(state, policy, 50, jax.random.PRNGKey(1))
    assert obs.shape == (50, 8, 7)
    assert rew.shape == (50, 8)
    assert int(final.t.max()) <= 50
    # time channel advances deterministically
    np.testing.assert_allclose(np.asarray(obs[:, 0, -1])[:5],
                               (np.arange(1, 6) * 0.001), atol=1e-6)


def test_single_vs_batched_equivalence():
    """A batch of 1 matches the single-env pure functions exactly."""
    spec = mmt.make_spec("PointUMaze-v0")
    batch = mmt.make_batched("PointUMaze-v0", num_envs=1, auto_reset=False)
    key = jax.random.PRNGKey(7)
    s1, o1 = spec.reset(jax.random.split(key, 1)[0])
    sb, ob = batch.reset(key)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(ob[0]), atol=1e-6)
    a = jnp.asarray([[0.3, -0.1]])
    r1 = spec.step(s1, a[0])
    rb = batch.step(sb, a)
    np.testing.assert_allclose(np.asarray(r1.obs), np.asarray(rb.obs[0]), atol=1e-6)
    np.testing.assert_allclose(float(r1.reward), float(rb.reward[0]), atol=1e-6)
