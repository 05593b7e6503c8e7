"""Task abstractions: goals, scaling, reward/termination heads.

Keeps the reference's user-facing extension API (subclass a task, override
class attributes / ``create_maze`` / goals — `README.md:79-127`,
`/root/reference/mujoco_maze/maze_task.py:26-99`) while adding a *lowering*
step: every task compiles to :class:`TaskHeads` — batched, jit-traceable
reward/termination functions over fixed-size goal arrays — which the lockstep
engine folds into the step kernel.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Callable, List, NamedTuple, Optional, Type

import jax.numpy as jnp
import numpy as np

from ..maze.cells import MazeCell


class Rgb(NamedTuple):
    red: float
    green: float
    blue: float


RED = Rgb(0.7, 0.1, 0.1)
GREEN = Rgb(0.1, 0.7, 0.1)
BLUE = Rgb(0.1, 0.1, 0.7)


class MazeGoal:
    """A goal region (parity: maze_task.py:26-47)."""

    def __init__(
        self,
        pos: np.ndarray,
        reward_scale: float = 1.0,
        rgb: Rgb = RED,
        threshold: float = 0.6,
        custom_size: Optional[float] = None,
    ) -> None:
        assert 0.0 <= reward_scale <= 1.0
        self.pos = np.asarray(pos, dtype=np.float64)
        self.dim = self.pos.shape[0]
        self.reward_scale = reward_scale
        self.rgb = rgb
        self.threshold = threshold
        self.custom_size = custom_size

    def neighbor(self, obs: np.ndarray) -> bool:
        return bool(np.linalg.norm(obs[: self.dim] - self.pos) <= self.threshold)

    def euc_dist(self, obs: np.ndarray) -> float:
        return float(np.sum(np.square(obs[: self.dim] - self.pos)) ** 0.5)


class Scaling(NamedTuple):
    """Per-robot maze size scaling; ``None`` gates registration
    (parity: maze_task.py:50-53, __init__.py:19-78)."""

    ant: Optional[float]
    point: Optional[float]
    swimmer: Optional[float]


class GoalArrays(NamedTuple):
    """Fixed-size goal soup: the static lowering of a task's goal list."""

    pos: jnp.ndarray           # (G, 3) zero-padded goal positions
    dim_mask: jnp.ndarray      # (G, 3) 1.0 where coordinate participates
    threshold: jnp.ndarray     # (G,)
    reward_scale: jnp.ndarray  # (G,)
    valid: jnp.ndarray         # (G,) slot validity


class TaskHeads(NamedTuple):
    """Jit-traceable reward/termination of one task instance.

    ``reward(obs) -> f32 scalar`` and ``termination(obs) -> bool scalar``;
    both are pure functions of a single-env observation vector and vectorize
    with ``jax.vmap``.
    """

    reward: Callable[[jnp.ndarray], jnp.ndarray]
    termination: Callable[[jnp.ndarray], jnp.ndarray]
    goals: GoalArrays


def lower_goals(goals: List[MazeGoal], pad_to: Optional[int] = None) -> GoalArrays:
    g = max(len(goals), 1) if pad_to is None else pad_to
    pos = np.zeros((g, 3), dtype=np.float64)
    dim_mask = np.zeros((g, 3), dtype=np.float64)
    threshold = np.zeros((g,), dtype=np.float64)
    reward_scale = np.zeros((g,), dtype=np.float64)
    valid = np.zeros((g,), dtype=bool)
    for i, goal in enumerate(goals):
        pos[i, : goal.dim] = goal.pos
        dim_mask[i, : goal.dim] = 1.0
        threshold[i] = goal.threshold
        reward_scale[i] = goal.reward_scale
        valid[i] = True
    return GoalArrays(
        pos=jnp.asarray(pos),
        dim_mask=jnp.asarray(dim_mask),
        threshold=jnp.asarray(threshold),
        reward_scale=jnp.asarray(reward_scale),
        valid=jnp.asarray(valid),
    )


def _goal_hits(
    g: GoalArrays, obs: jnp.ndarray, offset: int, goal_pos=None
) -> jnp.ndarray:
    """(G,) bool: which goals the (offset) observation position is inside."""
    # obs[offset : offset+3], zero-padded so 2-D goals ignore the z term.
    p = jnp.concatenate([obs[offset : offset + 3], jnp.zeros((3,), obs.dtype)])[:3]
    pos = g.pos if goal_pos is None else goal_pos
    delta = (p[None, :] - pos) * g.dim_mask
    dist2 = jnp.sum(delta * delta, axis=-1)
    return (dist2 <= g.threshold**2) & g.valid


class MazeTask(ABC):
    """Base task. Subclass + override class attrs / goals to customize.

    Parity surface: maze_task.py:56-90.  ``REWARD_TYPE`` / ``OBS_OFFSET``
    drive the default lowering; tasks with exotic rewards override
    :meth:`lower`.
    """

    REWARD_THRESHOLD: float
    PENALTY: Optional[float] = None
    MAZE_SIZE_SCALING: Scaling = Scaling(ant=8.0, point=4.0, swimmer=4.0)
    INNER_REWARD_SCALING: float = 0.01
    # For Fall/Push/BlockMaze
    OBSERVE_BLOCKS: bool = False
    # For Billiard
    OBSERVE_BALLS: bool = False
    OBJECT_BALL_SIZE: float = 1.0
    # Unused by stock tasks (kept for parity)
    PUT_SPIN_NEAR_AGENT: bool = False
    TOP_DOWN_VIEW: bool = False
    # Lowering hints
    REWARD_TYPE: str = "goal"  # "goal" | "dist" | "none"
    OBS_OFFSET: int = 0        # 0 = robot position, 3 = first object position

    def __init__(self, scale: float) -> None:
        self.goals: List[MazeGoal] = []
        self.scale = scale

    def sample_goals(self) -> bool:
        return False

    def sample_goal_positions(self, key) -> jnp.ndarray:
        """(G, 3) goal positions for one episode; used when
        :meth:`sample_goals` is True.

        The reference's goal-resampling hook was latent and mis-wired
        (maze_env.py:375-376 calls a ``set_marker`` that looks up the wrong
        site name, maze_env.py:386 vs :209); here resampled goals are
        per-env state consumed by the reward/termination heads.
        """
        raise NotImplementedError(
            "sample_goals() is True but sample_goal_positions is not defined"
        )

    # -- host-side (numpy) API, kept for parity/inspection ----------------
    def termination(self, obs: np.ndarray) -> bool:
        o = np.asarray(obs)[self.OBS_OFFSET :]
        return any(goal.neighbor(o) for goal in self.goals)

    def reward(self, obs: np.ndarray) -> float:
        o = np.asarray(obs)[self.OBS_OFFSET :]
        if self.REWARD_TYPE == "none":
            return 0.0
        if self.REWARD_TYPE == "dist":
            return -self.goals[0].euc_dist(o) / self.scale
        for goal in self.goals:
            if goal.neighbor(o):
                return goal.reward_scale
        return self.PENALTY

    @staticmethod
    @abstractmethod
    def create_maze() -> List[List[MazeCell]]:
        ...

    # -- lowering to jit-traceable heads ----------------------------------
    def lower(self) -> TaskHeads:
        goals = lower_goals(self.goals)
        offset = self.OBS_OFFSET
        reward_type = self.REWARD_TYPE
        penalty = 0.0 if self.PENALTY is None else float(self.PENALTY)
        scale = float(self.scale)

        def termination(obs: jnp.ndarray, goal_pos=None) -> jnp.ndarray:
            return jnp.any(_goal_hits(goals, obs, offset, goal_pos))

        if reward_type == "none":

            def reward(obs: jnp.ndarray, goal_pos=None) -> jnp.ndarray:
                return jnp.zeros((), obs.dtype)

        elif reward_type == "dist":

            def reward(obs: jnp.ndarray, goal_pos=None) -> jnp.ndarray:
                pos = goals.pos if goal_pos is None else goal_pos
                p = obs[offset : offset + 3]
                p = jnp.concatenate([p, jnp.zeros((3,), obs.dtype)])[:3]
                delta = (p - pos[0]) * goals.dim_mask[0]
                return -jnp.sqrt(jnp.sum(delta * delta)) / scale

        elif reward_type == "goal":

            def reward(obs: jnp.ndarray, goal_pos=None) -> jnp.ndarray:
                hits = _goal_hits(goals, obs, offset, goal_pos)
                first = jnp.argmax(hits)  # first hit wins (maze_task.py:357-360)
                return jnp.where(
                    jnp.any(hits),
                    goals.reward_scale[first].astype(obs.dtype),
                    jnp.asarray(penalty, obs.dtype),
                )

        else:
            raise ValueError(f"Unknown REWARD_TYPE {reward_type!r}")

        return TaskHeads(reward=reward, termination=termination, goals=goals)


class DistRewardMixIn:
    """Dense negative-distance reward (parity: maze_task.py:93-99)."""

    REWARD_THRESHOLD: float = -1000.0
    REWARD_TYPE: str = "dist"


TaskType = Type[MazeTask]
