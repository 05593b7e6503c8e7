"""Device mesh construction and env-batch sharding.

The reference has no parallelism of any kind (one process, one env —
SURVEY §2); this module is the TPU build's scaling surface: a named
``data`` × ``model`` mesh, env batches sharded along ``data``, policy
parameters along ``model``, with XLA GSPMD inserting the collectives
(psum over ICI/DCN) from sharding annotations.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """A ``data`` × ``model`` mesh over the available devices.

    Defaults to all devices on the data axis — the natural layout for an
    env framework where the batch axis carries the scale.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    if n_data * n_model != len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_model} does not cover {len(devices)} devices"
        )
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def env_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for batched env pytrees: leading (env) axis over ``data``."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_env_state(state, mesh: Mesh):
    """Place a batched EnvState with its env axis sharded over ``data``."""
    sh = env_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), state)


def multihost_init(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-host JAX (DCN) when running on a pod slice.

    Call once per process before building meshes.  The env batch then spans
    hosts: each host owns its shard of the ``data`` axis; cross-host
    aggregation (returns, throughput metrics) rides the same GSPMD
    collectives.

    With no arguments this defers to ``jax.distributed.initialize()``'s own
    cluster auto-detection (TPU pod metadata, SLURM, ...), which is the
    correct default entry point on a real pod slice.  Explicit
    ``coordinator_address``/``num_processes``/``process_id`` support manual
    bring-up (and the 2-process CPU test).  Idempotent: a second call after
    successful initialization is a no-op.  On a true single-host setup with
    no cluster environment, auto-detection finds nothing and we stay
    single-process.
    """
    if jax.distributed.is_initialized():
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    try:
        jax.distributed.initialize(**kwargs)
    except ValueError:
        # No cluster environment detected and none specified: single host.
        if kwargs:
            raise
