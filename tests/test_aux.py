"""Aux subsystems: renderer, top-down view hook, action validation."""

import numpy as np
import pytest

import mujoco_maze_tpu as mmt
from mujoco_maze_tpu.maze.cells import MazeCell
from mujoco_maze_tpu.tasks.library import GoalRewardUMaze


def test_render_frame():
    env = mmt.make("PointUMaze-v0")
    env.reset(seed=0)
    frame = env.render()
    assert frame.dtype == np.uint8
    assert frame.ndim == 3 and frame.shape[2] == 3
    # maze structure visible: more than a handful of colors
    assert len(np.unique(frame.reshape(-1, 3), axis=0)) >= 4


def test_render_block_and_ball_envs():
    for env_id in ("PointPush-v0", "PointBilliard-v0"):
        env = mmt.make(env_id)
        env.reset(seed=0)
        frame = env.render()
        assert frame.shape[2] == 3


def test_action_shape_validated():
    env = mmt.make("PointUMaze-v0")
    env.reset(seed=0)
    with pytest.raises(ValueError, match="action shape"):
        env.step(np.zeros(5, np.float32))


class TopDownUMaze(GoalRewardUMaze):
    TOP_DOWN_VIEW = True


def test_top_down_view_obs():
    """The TOP_DOWN_VIEW hook (never enabled by stock tasks) extends obs by
    a flattened 5x5x3 egocentric occupancy map (maze_env.py:351-369)."""
    import jax

    from mujoco_maze_tpu.envs.env import MazeEnvSpec
    from mujoco_maze_tpu.models.point import PointRobot

    spec = MazeEnvSpec(PointRobot(), TopDownUMaze, maze_size_scaling=4.0)
    assert spec.obs_dim == 7 + 75
    state, obs = spec.reset(jax.random.PRNGKey(0))
    assert obs.shape == (82,)
    view = np.asarray(spec._top_down_view(state)).reshape(5, 5, 3)
    # walls visible around the robot's start corner; no chasms in UMaze
    assert view[:, :, 0].sum() > 1.0
    assert view[:, :, 1].sum() == 0.0
    # moving the robot shifts the egocentric view
    state2 = state._replace(qpos=state.qpos.at[0].add(4.0))
    view2 = np.asarray(spec._top_down_view(state2))
    assert np.abs(view2 - np.asarray(view)).max() > 0.1


def test_goal_resampling():
    """Per-episode sampled goals: the fixed version of the reference's
    latent sample_goals/set_marker hook."""
    import jax
    import jax.numpy as jnp

    from mujoco_maze_tpu.envs.env import MazeEnvSpec
    from mujoco_maze_tpu.models.point import PointRobot

    class ResampledUMaze(GoalRewardUMaze):
        def sample_goals(self):
            return True

        def sample_goal_positions(self, key):
            xy = jax.random.uniform(key, (2,), minval=-2.0, maxval=2.0)
            return jnp.concatenate([xy, jnp.zeros(1)])[None, :]  # (1, 3)

    spec = MazeEnvSpec(PointRobot(), ResampledUMaze, maze_size_scaling=4.0)
    s1, _ = spec.reset(jax.random.PRNGKey(0))
    s2, _ = spec.reset(jax.random.PRNGKey(1))
    assert s1.goal_pos is not None
    assert np.abs(np.asarray(s1.goal_pos) - np.asarray(s2.goal_pos)).max() > 1e-3
    # reward head follows the sampled goal: teleport onto it → terminated
    gx, gy = float(s1.goal_pos[0, 0]), float(s1.goal_pos[0, 1])
    st = s1._replace(qpos=s1.qpos.at[0].set(gx).at[1].set(gy))
    res = spec.step(st, jnp.zeros(2))
    assert bool(res.terminated)
    assert float(res.reward) == 1.0
    # batched autoreset resamples per env
    import mujoco_maze_tpu.envs.batched as B

    batch = B.BatchedMazeEnv(spec, num_envs=4)
    state, _ = batch.reset(jax.random.PRNGKey(2))
    assert state.goal_pos.shape == (4, 1, 3)
    res = batch.step(state, jnp.zeros((4, 2)))
    assert res.state.goal_pos.shape == (4, 1, 3)


def test_top_down_view_sees_blocks():
    import jax

    from mujoco_maze_tpu.envs.env import MazeEnvSpec
    from mujoco_maze_tpu.models.point import PointRobot
    from mujoco_maze_tpu.tasks.library import GoalRewardPush

    class TopDownPush(GoalRewardPush):
        TOP_DOWN_VIEW = True

    spec = MazeEnvSpec(PointRobot(), TopDownPush, maze_size_scaling=4.0)
    state, obs = spec.reset(jax.random.PRNGKey(0))
    view = np.asarray(spec._top_down_view(state)).reshape(5, 5, 3)
    assert view[:, :, 2].sum() > 0.1  # movable block channel populated


def test_checkpoint_roundtrip(tmp_path):
    """Env + trainer state checkpoint/resume (SURVEY §5 gap)."""
    import jax
    import jax.numpy as jnp

    from mujoco_maze_tpu.utils import checkpoint

    batch = mmt.make_batched("PointUMaze-v0", num_envs=8)
    state, _ = batch.reset(jax.random.PRNGKey(0))
    res = batch.step(state, jnp.zeros((8, 2)))
    path = str(tmp_path / "env_state.npz")
    checkpoint.save(path, res.state)
    restored = checkpoint.restore(path, res.state)
    np.testing.assert_allclose(
        np.asarray(restored.qpos), np.asarray(res.state.qpos)
    )
    assert int(restored.t[0]) == int(res.state.t[0])
    # resuming stepping from the restored state is identical
    res2a = batch.step(res.state, jnp.zeros((8, 2)))
    res2b = batch.step(restored, jnp.zeros((8, 2)))
    np.testing.assert_allclose(
        np.asarray(res2a.obs), np.asarray(res2b.obs), atol=1e-7
    )


def test_roofline_flop_accounting():
    """utils/roofline: XLA cost-model FLOPs/step and the jaxpr op census
    exist for the fused kernels and scale sanely (Ant >> Point)."""
    import mujoco_maze_tpu as mmt
    from mujoco_maze_tpu.utils import roofline

    point = mmt.make_batched("PointUMaze-v0", num_envs=64, fast_step=False)
    f_point = roofline.step_flops(point, tile=64)
    assert f_point is not None and 500 < f_point < 1e5
    census = roofline.op_census(point, tile=64)
    assert census["mul"] > 100
    ant = mmt.make_batched("AntUMaze-v0", num_envs=64, fast_step=False)
    f_ant = roofline.step_flops(ant, tile=64)
    assert f_ant > 10 * f_point  # contact dynamics dwarf the kinematic step
