"""Robot model contract for the lockstep engine.

TPU-native inversion of the reference's ``AgentModel`` class hierarchy
(`/root/reference/mujoco_maze/agent_model.py:12-41`): a robot is a *static
description* (dof layout, action space, reset-noise law) plus pure functions
``step_dynamics`` / ``observe`` that trace into the jitted env step.  No
mutable simulator object exists — state is an explicit pytree owned by the
env.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class Robot(ABC):
    """Static robot description + pure dynamics functions.

    Class attrs mirror the reference contract (agent_model.py:13-17):
    ``MANUAL_COLLISION``, ``ORI_IND``, ``RADIUS``, ``OBJBALL_TYPE``.
    """

    NAME: str
    MANUAL_COLLISION: bool
    ORI_IND: Optional[int] = None
    RADIUS: Optional[float] = None
    OBJBALL_TYPE: Optional[str] = None

    nq: int            # robot generalized coordinates
    nv: int            # robot dofs
    action_dim: int
    frame_skip: int
    timestep: float
    obs_dim: int       # robot-only observation length

    @property
    def dt(self) -> float:
        return self.timestep * self.frame_skip

    # -- static construction ----------------------------------------------
    @abstractmethod
    def action_bounds(self) -> Tuple[np.ndarray, np.ndarray]:
        """(low, high) of the action box."""

    @abstractmethod
    def init_qpos(self, height_offset: float) -> np.ndarray:
        """Robot qpos0 (world-frame origin at the maze's ROBOT cell)."""

    def init_qvel(self) -> np.ndarray:
        return np.zeros(self.nv, dtype=np.float64)

    @abstractmethod
    def obs_bounds(self) -> Tuple[np.ndarray, np.ndarray]:
        """(low, high) of the robot observation box."""

    # -- pure per-step functions (traced into the env kernel) -------------
    @abstractmethod
    def reset_noise(
        self, key: jax.Array, nq_total: int, nv_total: int
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Additive reset noise over the FULL (robot+world) state vectors.

        Each robot replicates its reference noise law (uniform vs gaussian,
        whether world dofs are zeroed) — see point.py:71-81, ant.py:84-96,
        swimmer.py:55-68.
        Returns (qpos_noise, qvel_noise); the env adds them to init state and
        applies the robot's world-dof masking policy via
        :meth:`zero_world_dofs`.
        """

    # Whether reset zeroes noise on world (non-robot) dofs.
    ZERO_WORLD_DOFS_ON_RESET: bool = True

    @abstractmethod
    def observe(self, qpos: jnp.ndarray, qvel: jnp.ndarray) -> jnp.ndarray:
        """Robot observation from the full state (robot dofs lead)."""

    @abstractmethod
    def get_ori(self, qpos: jnp.ndarray) -> jnp.ndarray:
        """Planar heading angle."""

    def get_xy(self, qpos: jnp.ndarray) -> jnp.ndarray:
        return qpos[:2]

    def set_xy(self, qpos: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
        return qpos.at[:2].set(xy)
