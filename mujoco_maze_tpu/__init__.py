"""mujoco_maze_tpu — a TPU-native maze-RL environment framework.

A from-scratch re-design of the capabilities of `kngwyu/mujoco-maze` for
TPU: maze environments are pure-JAX lockstep physics stepped under
``jit``/``vmap`` for thousands of instances per chip, sharded across device
meshes with ``shard_map``, with the reference's full task/robot/registration
surface (142 env IDs) on top.

Quick start::

    import mujoco_maze_tpu as mmt

    env = mmt.make("PointUMaze-v0")          # single-env gymnasium API
    obs, info = env.reset(seed=0)
    obs, r, term, trunc, info = env.step(env.action_space.sample())

    batch = mmt.make_batched("PointUMaze-v0", num_envs=4096)  # native API
    state, obs = batch.reset(jax.random.PRNGKey(0))
    res = batch.step(state, actions)          # one fused TPU kernel
"""

from .registry import (
    ENV_REGISTRY,
    EnvEntry,
    entry,
    env_ids,
    make,
    make_batched,
    make_spec,
    register_gymnasium,
)
from .tasks.core import MazeGoal, MazeTask, Rgb, Scaling
from .tasks.library import TaskRegistry
from .maze.cells import MazeCell

__version__ = "0.1.0"

__all__ = [
    "ENV_REGISTRY",
    "EnvEntry",
    "MazeCell",
    "MazeGoal",
    "MazeTask",
    "Rgb",
    "Scaling",
    "TaskRegistry",
    "entry",
    "env_ids",
    "make",
    "make_batched",
    "make_spec",
    "register_gymnasium",
]

# Registration with gymnasium is a cheap metadata walk; doing it at import
# time mirrors the reference's `import mujoco_maze` side effect
# (__init__.py:17-78).
register_gymnasium()
