"""Single-env gymnasium adapter over the lockstep kernel.

Gives users of the reference library a drop-in, host-side API
(`gym.make("PointUMaze-v0")` → `make("PointUMaze-v0")`) while the actual
stepping runs the same jitted pure functions as the batched path.

API-era note: the reference mixes Gym eras — ``step`` returns a 4-tuple but
``reset`` returns ``(obs, info)`` (maze_env.py:481 vs :382).  This adapter
targets the modern gymnasium 5-tuple API (the reference's *intended*
direction); episode truncation at 1000 steps is folded in (the reference got
it from the ``TimeLimit`` wrapper, __init__.py:31).
"""

from __future__ import annotations

import sys
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:
    import gymnasium
    from gymnasium import spaces

    _GYMNASIUM = True
except ImportError:  # pragma: no cover
    _GYMNASIUM = False

from .env import EnvState, MazeEnvSpec


class MazeGymEnv(gymnasium.Env if _GYMNASIUM else object):
    metadata = {"render_modes": ["rgb_array", "human"], "render_fps": 50}

    def __init__(
        self,
        spec: MazeEnvSpec,
        entry=None,
        websock_port: Optional[int] = None,
        image_shape=(600, 480),
        camera_move_x: Optional[float] = None,
        camera_move_y: Optional[float] = None,
        camera_zoom: Optional[float] = None,
        render_mode: Optional[str] = None,
        env_id: Optional[str] = None,
        make_kwargs: Optional[dict] = None,
    ) -> None:
        if render_mode not in (None, "rgb_array", "human"):
            raise ValueError(
                f"render_mode {render_mode!r} not in "
                f"{self.metadata['render_modes']}")
        self.spec_tpu = spec
        self.registry_entry = entry
        self.render_mode = render_mode
        # pickling identity (reference envs are EzPickle,
        # agent_model.py:12): remember how to re-make this env by ID
        self._env_id = env_id
        self._make_kwargs = dict(make_kwargs or {})
        self._camera = (camera_move_x, camera_move_y, camera_zoom)
        self._step_fn = jax.jit(spec.step)
        self._reset_fn = jax.jit(spec.reset)
        self._state: Optional[EnvState] = None
        # Persistent episode-key stream (reference keeps a persistent
        # ``np_random``; a bare counter would replay episode 0,1,2,... per
        # process and repeat after an explicit reset(seed=...)).
        self._rng = np.random.default_rng()
        self._websock_port = websock_port
        self._websock_server_pipe = None
        self._image_shape = image_shape

        low, high = spec.observation_bounds()
        a_low, a_high = spec.action_bounds()
        if _GYMNASIUM:
            self.observation_space = spaces.Box(
                low=low.astype(np.float32), high=high.astype(np.float32)
            )
            self.action_space = spaces.Box(
                low=a_low.astype(np.float32), high=a_high.astype(np.float32)
            )

    # -- parity helpers ---------------------------------------------------
    @property
    def has_extended_obs(self) -> bool:
        return self.spec_tpu.has_extended_obs

    @property
    def _observe_balls(self) -> bool:
        return self.spec_tpu.task.OBSERVE_BALLS

    @property
    def _observe_blocks(self) -> bool:
        return self.spec_tpu.task.OBSERVE_BLOCKS

    @property
    def _task(self):
        return self.spec_tpu.task

    def get_ori(self) -> float:
        assert self._state is not None, "call reset() first"
        return float(self.spec_tpu.robot.get_ori(self._state.qpos))

    # -- gymnasium API ----------------------------------------------------
    def reset(
        self, *, seed: Optional[int] = None, options: Optional[dict] = None
    ) -> Tuple[np.ndarray, Dict[str, Any]]:
        if seed is not None:
            # Reseed the stream (gymnasium contract), then draw from it so a
            # following unseeded reset() continues rather than repeats.
            self._rng = np.random.default_rng(seed)
            key = jax.random.PRNGKey(seed)
        else:
            key = jax.random.PRNGKey(int(self._rng.integers(0, 2**31 - 1)))
        self._state, obs = self._reset_fn(key)
        return np.asarray(obs), {}

    def step(self, action) -> Tuple[np.ndarray, float, bool, bool, Dict[str, Any]]:
        assert self._state is not None, "call reset() first"
        action = np.asarray(action)
        if action.shape != (self.spec_tpu.robot.action_dim,):
            raise ValueError(
                f"action shape {action.shape} != "
                f"({self.spec_tpu.robot.action_dim},)"
            )
        action = jnp.asarray(action, self.spec_tpu.dtype)
        res = self._step_fn(self._state, action)
        self._state = res.state
        info = {k: np.asarray(v) for k, v in res.info.items()}
        return (
            np.asarray(res.obs),
            float(res.reward),
            bool(res.terminated),
            bool(res.truncated),
            info,
        )

    def render(self):
        """RGB frame; with ``websock_port`` set, also streams to the browser
        viewer (reference behavior: maze_env.py:405-414).

        ``render_mode="human"`` is the headless-host analog of the
        reference's live GL window (maze_env.py:416-420): frames stream to
        the local browser viewer (the URL is printed, and a browser tab is
        opened when the host has one) and ``None`` is returned per the
        gymnasium human-mode contract.
        """
        from ..viewer.render2d import render_camera_view, render_top_view

        assert self._state is not None, "call reset() first"
        mx, my, zoom = self._camera
        if mx is not None or my is not None or zoom is not None:
            frame = render_camera_view(
                self.spec_tpu,
                self._state,
                image_shape=self._image_shape,
                camera_move_x=mx,
                camera_move_y=my,
                camera_zoom=zoom,
            )
        else:
            frame = render_top_view(self.spec_tpu, self._state)
        human = self.render_mode == "human"
        if human and self._websock_port is None:
            # pick a free port once; the viewer worker binds it immediately
            import socket

            with socket.socket() as s:
                s.bind(("127.0.0.1", 0))
                self._websock_port = s.getsockname()[1]
        if self._websock_port is not None:
            if self._websock_server_pipe is None:
                from ..viewer.server import start_server

                self._websock_server_pipe = start_server(self._websock_port)
                if human:
                    url = f"http://127.0.0.1:{self._websock_port}/"
                    print(f"[mujoco_maze_tpu] human render viewer at {url}",
                          file=sys.stderr)
                    try:  # headless hosts: webbrowser is a silent no-op
                        import webbrowser

                        webbrowser.open(url)
                    except Exception:
                        pass
            self._websock_server_pipe.send(frame)
        return None if human else frame

    def close(self) -> None:
        if self._websock_server_pipe is not None:
            self._websock_server_pipe.send(None)  # shutdown sentinel
            self._websock_server_pipe = None

    # -- pickling (reference envs are EzPickle, agent_model.py:12) ---------
    def __reduce__(self):
        if self._env_id is None:
            raise TypeError(
                "MazeGymEnv built from a raw spec is not picklable; "
                "construct via mujoco_maze_tpu.make(env_id, ...) or "
                "gymnasium.make(env_id)")
        # jitted closures and the live viewer pipe are rebuilt on load;
        # the episode state and RNG stream round-trip (jax arrays pickle
        # as device-agnostic buffers)
        return (
            _rebuild_env,
            (self._env_id, self._make_kwargs),
            {"_state": self._state, "_rng": self._rng},
        )

    def __setstate__(self, state) -> None:
        self._state = state["_state"]
        self._rng = state["_rng"]


def _rebuild_env(env_id: str, make_kwargs: dict) -> "MazeGymEnv":
    from ..registry import make

    return make(env_id, **make_kwargs)


def make_for_gymnasium(env_id: str, render_mode: Optional[str] = None,
                       websock_port: Optional[int] = None,
                       image_shape=(600, 480),
                       camera_move_x: Optional[float] = None,
                       camera_move_y: Optional[float] = None,
                       camera_zoom: Optional[float] = None,
                       **kwargs):
    """Entry point used by gymnasium registration."""
    from ..registry import entry as reg_entry, make_spec

    return MazeGymEnv(
        make_spec(env_id, **kwargs), reg_entry(env_id),
        websock_port=websock_port, image_shape=image_shape,
        camera_move_x=camera_move_x, camera_move_y=camera_move_y,
        camera_zoom=camera_zoom, render_mode=render_mode,
        env_id=env_id,
        make_kwargs=dict(kwargs, render_mode=render_mode,
                         websock_port=websock_port,
                         image_shape=image_shape,
                         camera_move_x=camera_move_x,
                         camera_move_y=camera_move_y,
                         camera_zoom=camera_zoom))
