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
    metadata = {"render_modes": ["rgb_array"], "render_fps": 50}

    def __init__(
        self,
        spec: MazeEnvSpec,
        entry=None,
        websock_port: Optional[int] = None,
        image_shape=(600, 480),
        camera_move_x: Optional[float] = None,
        camera_move_y: Optional[float] = None,
        camera_zoom: Optional[float] = None,
    ) -> None:
        self.spec_tpu = spec
        self.registry_entry = entry
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
        viewer (reference behavior: maze_env.py:405-414)."""
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
        if self._websock_port is not None:
            if self._websock_server_pipe is None:
                from ..viewer.server import start_server

                self._websock_server_pipe = start_server(self._websock_port)
            self._websock_server_pipe.send(frame)
        return frame

    def close(self) -> None:
        if self._websock_server_pipe is not None:
            self._websock_server_pipe.send(None)  # shutdown sentinel
            self._websock_server_pipe = None


def make_for_gymnasium(env_id: str, **kwargs):
    """Entry point used by gymnasium registration."""
    from ..registry import entry as reg_entry, make_spec

    return MazeGymEnv(make_spec(env_id, **kwargs), reg_entry(env_id))
