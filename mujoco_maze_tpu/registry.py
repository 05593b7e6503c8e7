"""Env-ID registry: maze families × reward variants × robots → 142 env IDs.

Replicates the reference's mechanical registration walk
(`/root/reference/mujoco_maze/__init__.py:17-78`): for every maze family and
task variant, register ``{Robot}{maze_id}-v{i}`` gated on the task's
per-robot ``Scaling`` slot — including the reference's detail that the
``swimmer`` slot gates *both* Reacher and Swimmer.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict, List, Optional, Type

from .models.base import Robot
from .tasks.core import MazeTask
from .tasks.library import TaskRegistry

MAX_EPISODE_STEPS = 1000  # reference __init__.py:31


def _robot_factories() -> Dict[str, Callable[[], Robot]]:
    """Robot name → constructor (lazy imports keep startup cheap)."""

    def point() -> Robot:
        from .models.point import PointRobot

        return PointRobot()

    def ant() -> Robot:
        from .models.ant import AntRobot

        return AntRobot()

    def swimmer() -> Robot:
        from .models.swimmer import SwimmerRobot

        return SwimmerRobot()

    def reacher() -> Robot:
        from .models.reacher import ReacherRobot

        return ReacherRobot()

    return {"Point": point, "Ant": ant, "Swimmer": swimmer, "Reacher": reacher}


@dataclass(frozen=True)
class EnvEntry:
    """One registered env ID."""

    env_id: str
    robot_name: str
    maze_id: str
    version: int
    task_cls: Type[MazeTask]
    maze_size_scaling: float
    inner_reward_scaling: float
    reward_threshold: float
    max_episode_steps: int = MAX_EPISODE_STEPS


def _build_registry() -> Dict[str, EnvEntry]:
    registry: Dict[str, EnvEntry] = {}

    def add(robot_name: str, maze_id: str, i: int, task_cls, scale: float) -> None:
        env_id = f"{robot_name}{maze_id}-v{i}"
        registry[env_id] = EnvEntry(
            env_id=env_id,
            robot_name=robot_name,
            maze_id=maze_id,
            version=i,
            task_cls=task_cls,
            maze_size_scaling=scale,
            inner_reward_scaling=task_cls.INNER_REWARD_SCALING,
            reward_threshold=task_cls.REWARD_THRESHOLD,
        )

    for maze_id in TaskRegistry.keys():
        for i, task_cls in enumerate(TaskRegistry.tasks(maze_id)):
            scaling = task_cls.MAZE_SIZE_SCALING
            if scaling.point is not None:
                add("Point", maze_id, i, task_cls, scaling.point)
            if scaling.ant is not None:
                add("Ant", maze_id, i, task_cls, scaling.ant)
            if scaling.swimmer is not None:
                # The swimmer slot gates both robots (reference __init__.py:51-78).
                add("Reacher", maze_id, i, task_cls, scaling.swimmer)
                add("Swimmer", maze_id, i, task_cls, scaling.swimmer)

    return registry


ENV_REGISTRY: Dict[str, EnvEntry] = _build_registry()


def env_ids() -> List[str]:
    return list(ENV_REGISTRY.keys())


def entry(env_id: str) -> EnvEntry:
    if env_id not in ENV_REGISTRY:
        raise KeyError(f"Unknown env id {env_id!r}")
    return ENV_REGISTRY[env_id]


def make_spec(
    env_id: str,
    *,
    maze_height: float = 0.5,
    restitution_coef: float = 0.8,
    inner_reward_scaling: Optional[float] = None,
    task_kwargs: Optional[Dict[str, Any]] = None,
    dtype=None,
):
    """Build the static :class:`MazeEnvSpec` for a registered env ID."""
    import jax.numpy as jnp

    from .envs.env import MazeEnvSpec

    e = entry(env_id)
    robot = _robot_factories()[e.robot_name]()
    return MazeEnvSpec(
        robot=robot,
        maze_task=e.task_cls,
        maze_size_scaling=e.maze_size_scaling,
        inner_reward_scaling=(
            e.inner_reward_scaling
            if inner_reward_scaling is None
            else inner_reward_scaling
        ),
        maze_height=maze_height,
        restitution_coef=restitution_coef,
        task_kwargs=task_kwargs,
        dtype=dtype if dtype is not None else jnp.float32,
    )


def make(
    env_id: str,
    websock_port: Optional[int] = None,
    camera_move_x: Optional[float] = None,
    camera_move_y: Optional[float] = None,
    camera_zoom: Optional[float] = None,
    image_shape=(600, 480),
    render_mode: Optional[str] = None,
    **kwargs,
):
    """Single-env gymnasium-style adapter (host-friendly API).

    Viewer/camera kwargs mirror the reference MazeEnv signature
    (maze_env.py:28-44); the software renderer applies them as a 2-D
    pan/zoom (render2d.render_camera_view).  ``render_mode="human"``
    streams to the local browser viewer (the headless analog of the
    reference's GL window).  The returned env pickles by remembering its
    ``(env_id, kwargs)`` (the reference's EzPickle analog).
    """
    from .envs.gym_adapter import MazeGymEnv

    return MazeGymEnv(
        make_spec(env_id, **kwargs),
        entry(env_id),
        websock_port=websock_port,
        image_shape=image_shape,
        camera_move_x=camera_move_x,
        camera_move_y=camera_move_y,
        camera_zoom=camera_zoom,
        render_mode=render_mode,
        env_id=env_id,
        make_kwargs=dict(kwargs, websock_port=websock_port,
                         camera_move_x=camera_move_x,
                         camera_move_y=camera_move_y,
                         camera_zoom=camera_zoom,
                         image_shape=image_shape,
                         render_mode=render_mode),
    )


def make_batched(env_id: str, num_envs: int, auto_reset: bool = True,
                 fast_step: bool | None = None,
                 engine_batched: bool | None = None, **kwargs):
    """The native batched lockstep env."""
    from .envs.batched import BatchedMazeEnv

    return BatchedMazeEnv(make_spec(env_id, **kwargs), num_envs,
                          auto_reset=auto_reset, fast_step=fast_step,
                          engine_batched=engine_batched)


def register_gymnasium() -> None:
    """Register every env ID with gymnasium so ``gymnasium.make`` works."""
    try:
        import gymnasium
    except ImportError:  # pragma: no cover
        return
    for env_id, e in ENV_REGISTRY.items():
        if env_id in gymnasium.registry:
            continue
        gymnasium.register(
            id=env_id,
            entry_point="mujoco_maze_tpu.envs.gym_adapter:make_for_gymnasium",
            kwargs={"env_id": env_id},
            max_episode_steps=e.max_episode_steps,
            reward_threshold=e.reward_threshold,
        )
