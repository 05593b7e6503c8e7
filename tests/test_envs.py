"""Env contract tests: shapes, reward signs, registry parity.

Port of the reference smoke tests (`/root/reference/tests/test_envs.py`) to
the TPU build's single-env adapter, plus registry-level parity checks the
reference lacked.
"""

import numpy as np
import pytest

import mujoco_maze_tpu as mmt
from mujoco_maze_tpu.tasks.library import TaskRegistry

IMPLEMENTED_ROBOTS = ("Point", "Ant", "Swimmer", "Reacher")


def _registered(robot, maze_id, i):
    return f"{robot}{maze_id}-v{i}" in mmt.ENV_REGISTRY


def test_registry_parity():
    """Same ID set as walking the reference registry gates."""
    ids = mmt.env_ids()
    assert len(ids) == 145
    assert "PointUMaze-v0" in ids
    assert "AntFall-v0" in ids
    # Push keeps default swimmer=4.0 → SwimmerPush registered even though
    # untested upstream (reference quirk, __init__.py:51-78)
    assert "SwimmerPush-v0" in ids
    # MultiPush sets swimmer=None → gated out
    assert "SwimmerMultiPush-v0" not in ids
    assert "AntBilliard-v0" not in ids  # Billiard ant=None


def test_registry_thresholds():
    assert mmt.entry("PointUMaze-v1").reward_threshold == 0.9
    # intended dist-reward semantics (see tasks/library.py docstring)
    assert mmt.entry("PointUMaze-v0").reward_threshold == -1000.0
    assert mmt.entry("PointCorridor-v2").reward_threshold == 0.0
    assert mmt.entry("PointUMaze-v0").max_episode_steps == 1000


@pytest.mark.parametrize("maze_id", TaskRegistry.keys())
def test_point_maze(maze_id):
    for i in range(2):
        env_id = f"Point{maze_id}-v{i}"
        if env_id not in mmt.ENV_REGISTRY:
            continue
        env = mmt.make(env_id)
        s0, _ = env.reset(seed=0)
        a = env.action_space.sample()
        s, r, term, trunc, _ = env.step(a)
        if not env.has_extended_obs:
            assert s0.shape == (7,)
            assert s.shape == (7,)
        if env._observe_balls:
            assert s0.shape == (10,)
            assert s.shape == (10,)
        if i == 0:
            assert r != 0.0
        else:
            # f32 device rewards: compare to PENALTY at f32 precision
            assert r == pytest.approx(env._task.PENALTY, rel=1e-5)
            assert r < 0.0


@pytest.mark.parametrize("maze_id", TaskRegistry.keys())
def test_ant_maze(maze_id):
    """Every registered Ant (maze, reward-variant) combination builds,
    resets and steps (reference test_envs.py:7-18 smoke parity).

    Round 5: the one-variant-per-maze sampling (`break`) and the 5-family
    subset are gone — spec building is cached per family and an Ant step
    compiles in ~5 s on CPU, so the full matrix costs a few minutes; the
    TPU registry sweep artifact (145/145) remains the device-side
    compensating control."""
    if "Billiard" in maze_id:  # parity skip (test_envs.py:9-10)
        return
    for i in range(3):
        env_id = f"Ant{maze_id}-v{i}"
        if env_id not in mmt.ENV_REGISTRY:
            continue
        env = mmt.make(env_id)
        s0, _ = env.reset(seed=0)
        s, _, _, _, _ = env.step(env.action_space.sample())
        if not env.has_extended_obs:
            assert s0.shape == (30,)
            assert s.shape == (30,)


@pytest.mark.parametrize("maze_id", TaskRegistry.keys())
def test_swimmer_maze(maze_id):
    # parity with reference skips (test_envs.py:69-71)
    for inhibited in ["Fall", "Push", "Block", "Billiard"]:
        if inhibited in maze_id:
            return
    for i in range(2):
        env_id = f"Swimmer{maze_id}-v{i}"
        if env_id not in mmt.ENV_REGISTRY:
            continue
        env = mmt.make(env_id)
        s0, _ = env.reset(seed=0)
        s, _, _, _, _ = env.step(env.action_space.sample())
        if not env.has_extended_obs:
            assert s0.shape == (11,)
            assert s.shape == (11,)


@pytest.mark.parametrize("maze_id", TaskRegistry.keys())
def test_reacher_maze(maze_id):
    for inhibited in ["Fall", "Push", "Block", "Billiard"]:
        if inhibited in maze_id:
            return
    for i in range(2):
        env_id = f"Reacher{maze_id}-v{i}"
        if env_id not in mmt.ENV_REGISTRY:
            continue
        env = mmt.make(env_id)
        s0, _ = env.reset(seed=0)
        s, _, _, _, _ = env.step(env.action_space.sample())
        if not env.has_extended_obs:
            assert s0.shape == (9,)
            assert s.shape == (9,)


@pytest.mark.parametrize("maze_id", ["2Rooms", "4Rooms", "Billiard"])
def test_subgoal_envs(maze_id):
    env = mmt.make(f"Point{maze_id}-v2")
    s0, _ = env.reset(seed=0)
    s, r, _, _, _ = env.step(env.action_space.sample())
    if not env.has_extended_obs:
        assert s0.shape == (7,)
        assert s.shape == (7,)
    elif env._observe_balls:
        assert s0.shape == (10,)
        assert s.shape == (10,)
    assert len(env._task.goals) > 1


@pytest.mark.parametrize("v", [0, 1])
def test_maze_args(v):
    env = mmt.make(f"PointTRoom-v{v}", task_kwargs={"goal": (-2.0, -3.0)})
    s0, _ = env.reset(seed=0)
    assert s0.shape == (7,)
    s, _, _, _, _ = env.step(env.action_space.sample())
    assert s.shape == (7,)
    np.testing.assert_allclose(
        env._task.goals[0].pos, np.array([-2.0, -3.0]) * 4.0
    )


def test_point_kinematics_semantics():
    """The manual kinematic step: ori integrate+wrap, xy increment, collision."""
    env = mmt.make("PointUMaze-v0")
    obs, _ = env.reset(seed=3)
    x0, y0, ori0 = obs[0], obs[1], obs[2]
    a = np.array([0.5, 0.1], dtype=np.float32)
    obs1, _, _, _, _ = env.step(a)
    ori1 = ori0 + 0.1
    # pos moved roughly by cos/sin * gain (plus mm-scale drift)
    assert abs(obs1[2] - ori1) < 0.05
    assert abs(obs1[0] - (x0 + np.cos(ori1) * 0.5)) < 0.02
    assert abs(obs1[1] - (y0 + np.sin(ori1) * 0.5)) < 0.02
    # time channel
    assert abs(obs1[-1] - 0.001) < 1e-6


def test_point_walls_block():
    """Driving hard into a wall never escapes the maze interior."""
    env = mmt.make("PointUMaze-v0")
    env.reset(seed=0)
    low, high = env.observation_space.low, env.observation_space.high
    for t in range(200):
        obs, _, term, trunc, _ = env.step(np.array([1.0, 0.0], np.float32))
        assert low[0] - 1e-3 <= obs[0] <= high[0] + 1e-3
        assert low[1] - 1e-3 <= obs[1] <= high[1] + 1e-3
        if term or trunc:
            break


def test_goal_reward_and_termination():
    """Reaching the goal region yields reward 1.0 and terminates (v1)."""
    import jax
    import jax.numpy as jnp

    spec = mmt.make_spec("PointUMaze-v1")
    state, obs = spec.reset(jax.random.PRNGKey(0))
    # Teleport next to the goal (0, 2*scale) = (0, 8)
    qpos = state.qpos.at[0].set(0.1).at[1].set(8.0)
    state = state._replace(qpos=qpos)
    res = spec.step(state, jnp.zeros(2))
    assert bool(res.terminated)
    assert float(res.reward) == 1.0


def test_dist_reward_value():
    """v0 reward = -dist(goal)/scale (intended reference semantics)."""
    import jax
    import jax.numpy as jnp

    spec = mmt.make_spec("PointUMaze-v0")
    state, obs = spec.reset(jax.random.PRNGKey(0))
    res = spec.step(state, jnp.zeros(2))
    x, y = float(res.obs[0]), float(res.obs[1])
    expect = -np.hypot(x - 0.0, y - 8.0) / 4.0
    np.testing.assert_allclose(float(res.reward), expect, rtol=1e-4)
