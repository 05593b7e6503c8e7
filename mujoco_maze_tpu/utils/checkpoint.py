"""Checkpoint / resume for env and trainer state.

The reference has no checkpointing subsystem (closest artifact: EzPickle on
the env objects — SURVEY §5).  Here every piece of runtime state is an
explicit pytree, so checkpointing is a direct serialization: orbax when
available, with a dependency-free npz fallback that round-trips any pytree
of arrays (EnvState batches, PPOState, custom trees).
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np


def save(path: str, tree: Any) -> None:
    """Save a pytree of arrays. Directory → orbax; ``.npz`` → fallback."""
    if path.endswith(".npz"):
        _save_npz(path, tree)
        return
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(path), tree)
        ckptr.wait_until_finished()
    except ImportError:
        _save_npz(path + ".npz", tree)


def restore(path: str, like: Any) -> Any:
    """Restore a pytree saved by :func:`save`; ``like`` supplies structure."""
    if path.endswith(".npz") or os.path.exists(path + ".npz"):
        return _load_npz(path if path.endswith(".npz") else path + ".npz", like)
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), like)


def _save_npz(path: str, tree: Any) -> None:
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        json.dumps(str(treedef)).encode(), dtype=np.uint8
    )
    np.savez_compressed(path, **arrays)


def _load_npz(path: str, like: Any) -> Any:
    data = np.load(path)
    like_leaves, treedef = jax.tree_util.tree_flatten(like)
    leaves = [data[f"leaf_{i}"] for i in range(len(like_leaves))]
    import jax.numpy as jnp

    leaves = [
        jnp.asarray(leaf, getattr(ref, "dtype", None))
        for leaf, ref in zip(leaves, like_leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, leaves)
