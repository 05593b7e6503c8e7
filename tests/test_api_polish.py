"""Contract tests for round-2 API polish: info reward breakdown parity,
gym-adapter RNG stream, camera kwargs, stdlib viewer /video.

Reference contracts: info dict breakdown `ant.py:71-73` / `swimmer.py:44-47`
(Point inner info is `{}`, `point.py:61`); persistent `np_random` reset
stream (gym MujocoEnv); camera kwargs `maze_env.py:395-403`; viewer /video
`websock_viewer.py:78-87`.
"""

import numpy as np

import mujoco_maze_tpu as mmt


def test_info_reward_breakdown_ant():
    env = mmt.make("AntUMaze-v0")
    env.reset(seed=0)
    action = np.full(8, 0.3, np.float32)
    _, _, _, _, info = env.step(action)
    assert set(info) >= {"position", "reward_forward", "reward_ctrl"}
    # ctrl cost: -1e-4 * sum(a^2) (ant.py:48,66)
    assert np.isclose(float(info["reward_ctrl"]), -1e-4 * 8 * 0.09, rtol=1e-5)
    assert float(info["reward_forward"]) >= 0.0


def test_info_reward_breakdown_swimmer():
    env = mmt.make("SwimmerUMaze-v0")
    env.reset(seed=0)
    _, _, _, _, info = env.step(np.full(2, 0.5, np.float32))
    assert set(info) >= {"position", "reward_forward", "reward_ctrl"}
    assert float(info["reward_ctrl"]) <= 0.0


def test_info_point_no_breakdown():
    """Point's inner info is {} in the reference (point.py:61 discarded at
    maze_env.py:453); only position is reported."""
    env = mmt.make("PointUMaze-v0")
    env.reset(seed=0)
    _, _, _, _, info = env.step(np.zeros(2, np.float32))
    assert "reward_forward" not in info
    assert "position" in info


def test_reset_rng_stream_does_not_replay():
    env = mmt.make("PointUMaze-v0")
    obs_a, _ = env.reset(seed=0)
    obs_b, _ = env.reset()  # must continue the stream, not replay episode 0
    assert not np.allclose(obs_a, obs_b)
    # explicit seed is reproducible across instances
    env2 = mmt.make("PointUMaze-v0")
    obs_c, _ = env2.reset(seed=0)
    assert np.allclose(obs_a, obs_c)
    # and the follow-up unseeded episodes match too (same stream state)
    obs_d, _ = env2.reset()
    assert np.allclose(obs_b, obs_d)


def test_unseeded_resets_differ_across_instances():
    e1 = mmt.make("PointUMaze-v0")
    e2 = mmt.make("PointUMaze-v0")
    o1, _ = e1.reset()
    o2, _ = e2.reset()
    assert not np.allclose(o1, o2)


def test_camera_kwargs_render():
    env = mmt.make(
        "PointUMaze-v0",
        camera_move_x=1.0,
        camera_move_y=-1.0,
        camera_zoom=1.0,
        image_shape=(320, 240),
    )
    env.reset(seed=0)
    frame = env.render()
    assert frame.shape == (240, 320, 3)
    # zoomed/panned view differs from the plain top view resampled
    env_plain = mmt.make("PointUMaze-v0", image_shape=(320, 240))
    env_plain.reset(seed=0)
    plain = env_plain.render()
    assert frame.shape[2] == plain.shape[2] == 3


def test_stdlib_viewer_video_endpoint():
    """Stream two frames through the stdlib viewer and download /video."""
    import socket
    import time
    import urllib.request

    from mujoco_maze_tpu.viewer.server import _StdlibServerWorker, start_server

    # pick a free port
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    pipe = start_server(port)
    try:
        frame = np.zeros((32, 32, 3), np.uint8)
        pipe.send(frame)
        pipe.send(frame + 128)
        deadline = time.time() + 30
        body = b""
        while time.time() < deadline:
            try:
                with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/video", timeout=10
                ) as r:
                    ctype = r.headers.get("Content-Type")
                    body = r.read()
                break
            except (ConnectionError, OSError):
                time.sleep(0.3)
        assert body, "no response from viewer /video"
        assert ctype in ("video/mp4", "image/gif")
        assert len(body) > 100
    finally:
        pipe.send(None)


def test_pickle_roundtrip_make():
    """EzPickle parity (reference agent_model.py:12): envs re-make by
    (env_id, kwargs) and carry episode state + RNG stream across."""
    import pickle

    env = mmt.make("PointUMaze-v0", camera_zoom=1.5)
    obs0, _ = env.reset(seed=3)
    env.step(np.zeros(2, np.float32))
    clone = pickle.loads(pickle.dumps(env))
    assert clone.spec_tpu.robot.NAME == "Point"
    assert clone._camera == env._camera
    # episode state carried: next steps agree
    a = np.full(2, 0.25, np.float32)
    o1 = env.step(a)[0]
    o2 = clone.step(a)[0]
    np.testing.assert_allclose(o1, o2, rtol=1e-6)


def test_pickle_roundtrip_gymnasium():
    import pickle

    import gymnasium

    env = gymnasium.make("AntUMaze-v0")
    env.reset(seed=5)
    clone = pickle.loads(pickle.dumps(env))
    obs, _, _, _, _ = clone.step(np.zeros(8, np.float32))
    assert obs.shape == (30,)


def test_pickle_raw_spec_env_raises():
    import pickle

    import pytest

    from mujoco_maze_tpu.envs.gym_adapter import MazeGymEnv

    env = MazeGymEnv(mmt.make_spec("PointUMaze-v0"))
    with pytest.raises(TypeError, match="not picklable"):
        pickle.dumps(env)


def test_render_mode_human_returns_none_and_streams(tmp_path):
    """Human mode is the headless analog of the reference's GL viewer
    window (maze_env.py:416-420): frames stream to the browser viewer and
    render() returns None (gymnasium human-mode contract)."""
    env = mmt.make("PointUMaze-v0", render_mode="human")
    env.reset(seed=0)
    out = env.render()
    assert out is None
    assert env._websock_port is not None
    assert env._websock_server_pipe is not None
    env.close()


def test_render_mode_invalid_raises():
    import pytest

    with pytest.raises(ValueError, match="render_mode"):
        mmt.make("PointUMaze-v0", render_mode="depth")
