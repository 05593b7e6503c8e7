"""Multi-device sharding tests on the virtual 8-device CPU mesh.

The standard way to validate pjit/GSPMD layouts without a pod: conftest
forces ``--xla_force_host_platform_device_count=8``.  Covers env-batch data
parallelism, the tensor-parallel train step, and cross-shard metric
reductions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mujoco_maze_tpu as mmt
from mujoco_maze_tpu.parallel import mesh as mesh_lib
from mujoco_maze_tpu.parallel import train


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return jax.devices()


def test_env_batch_sharding(eight_devices):
    mesh = mesh_lib.make_mesh(n_data=8, n_model=1)
    batch = mmt.make_batched("PointUMaze-v0", num_envs=64)
    state, obs = batch.reset(jax.random.PRNGKey(0))
    state = mesh_lib.shard_env_state(state, mesh)
    assert len(state.qpos.sharding.device_set) == 8
    res = batch.step(state, jnp.zeros((64, 2)))
    assert res.obs.shape == (64, 7)
    # metrics reduce across shards without host round-trips
    total = float(jnp.sum(res.reward))
    assert np.isfinite(total)


def test_sharded_rollout_matches_unsharded(eight_devices):
    """Sharding is a layout annotation — results must be identical."""
    mesh = mesh_lib.make_mesh(n_data=8, n_model=1)
    batch = mmt.make_batched("PointUMaze-v0", num_envs=32)
    state, _ = batch.reset(jax.random.PRNGKey(0))
    a = jnp.linspace(-1, 1, 64).reshape(32, 2)
    res_plain = batch.step(state, a)
    res_shard = batch.step(mesh_lib.shard_env_state(state, mesh), a)
    np.testing.assert_allclose(
        np.asarray(res_plain.obs), np.asarray(res_shard.obs), atol=1e-6
    )


@pytest.mark.parametrize("n_model", [1, 2])
def test_train_step_dp_tp(eight_devices, n_model):
    """Full A2C train step over data x model mesh shardings."""
    mesh = mesh_lib.make_mesh(n_data=8 // n_model, n_model=n_model)
    env = mmt.make_batched("PointUMaze-v0", num_envs=16)
    state, _ = env.reset(jax.random.PRNGKey(0))
    state = mesh_lib.shard_env_state(state, mesh)
    params = train.init_params(
        jax.random.PRNGKey(1), obs_dim=env.spec.obs_dim,
        act_dim=env.spec.robot.action_dim, hidden=64,
    )
    params = jax.tree_util.tree_map(
        jax.device_put, params, train.param_shardings(mesh)
    )
    step = train.make_train_step(env, mesh, rollout_len=4)
    p1, state, metrics = step(params, state, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics.loss))
    # parameters actually updated
    assert float(jnp.abs(p1.w1 - params.w1).max()) > 0.0
    # second step composes (state/params shardings preserved)
    p2, state, metrics2 = step(p1, state, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics2.loss))


def test_shardmap_rollout(eight_devices):
    """Explicit shard_map rollout with hand-placed psum over the data axis."""
    from mujoco_maze_tpu.parallel.shardmap_rollout import make_shardmap_rollout

    mesh = mesh_lib.make_mesh(n_data=8, n_model=1)
    env = mmt.make_batched("PointUMaze-v0", num_envs=32)
    state, _ = env.reset(jax.random.PRNGKey(0))
    state = mesh_lib.shard_env_state(state, mesh)
    roll = make_shardmap_rollout(env, mesh, num_steps=20)
    state2, rew, eps = roll(state, jax.random.PRNGKey(1))
    assert state2.qpos.shape == (32, state.qpos.shape[1])
    assert np.isfinite(float(rew))
    # dist reward is strictly negative away from the goal
    assert float(rew) < 0.0
    assert int(eps) >= 0


def test_tp_matches_single_device_numerics(eight_devices):
    """Tensor-parallel forward == replicated forward (GSPMD correctness)."""
    mesh1 = mesh_lib.make_mesh(n_data=8, n_model=1)
    mesh2 = mesh_lib.make_mesh(n_data=4, n_model=2)
    params = train.init_params(jax.random.PRNGKey(0), 7, 2, hidden=64)
    obs = jax.random.normal(jax.random.PRNGKey(1), (16, 7))
    out1 = train.policy_apply(
        jax.tree_util.tree_map(jax.device_put, params, train.param_shardings(mesh1)),
        obs,
    )
    out2 = train.policy_apply(
        jax.tree_util.tree_map(jax.device_put, params, train.param_shardings(mesh2)),
        obs,
    )
    np.testing.assert_allclose(np.asarray(out1[0]), np.asarray(out2[0]), atol=1e-5)


def test_scaling_efficiency_harness(eight_devices):
    """The host-scaling harness (parallel/rollout.py:scaling_efficiency)
    runs end-to-end on device-count slices of the virtual mesh and reports
    positive throughput + an efficiency map.  Virtual CPU devices share one
    socket, so no linearity assertion — the harness itself is the test;
    real-pod numbers come from running it on hardware."""
    from mujoco_maze_tpu.parallel.rollout import scaling_efficiency

    out = scaling_efficiency(
        "PointUMaze-v0", num_envs=64, steps=8, device_counts=[1, 2]
    )
    assert out[1] > 0 and out[2] > 0
    assert set(out["efficiency"]) == {1, 2}
    assert out["efficiency"][1] == pytest.approx(1.0)
    assert out["efficiency"][2] > 0


def test_shardmap_rollout_fast_step_matches(eight_devices):
    """Per-shard Pallas step kernels inside shard_map (interpret mode on
    CPU) must reproduce the vmapped-XLA shard_map rollout: same reward
    sum, episode count and final state."""
    from mujoco_maze_tpu.parallel.shardmap_rollout import make_shardmap_rollout

    mesh = mesh_lib.make_mesh(n_data=4, n_model=1, devices=jax.devices()[:4])
    env = mmt.make_batched("PointUMaze-v0", num_envs=32)
    state, _ = env.reset(jax.random.PRNGKey(0))
    state = mesh_lib.shard_env_state(state, mesh)
    roll_ref = make_shardmap_rollout(env, mesh, num_steps=8, fast_step=False)
    roll_fast = make_shardmap_rollout(env, mesh, num_steps=8, fast_step=True)
    s1, rew1, eps1 = roll_ref(state, jax.random.PRNGKey(1))
    s2, rew2, eps2 = roll_fast(state, jax.random.PRNGKey(1))
    np.testing.assert_allclose(
        np.asarray(s2.qpos), np.asarray(s1.qpos), atol=1e-4)
    np.testing.assert_allclose(float(rew2), float(rew1), rtol=1e-4)
    assert int(eps2) == int(eps1)
