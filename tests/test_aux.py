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
