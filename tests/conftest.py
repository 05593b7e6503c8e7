"""Test configuration: force CPU with 8 virtual devices.

Sharding tests exercise multi-chip layouts on a virtual CPU mesh — the
standard way to validate ``pjit``/``shard_map`` without a pod.  Note the
axon TPU plugin ignores the ``JAX_PLATFORMS`` env var, so we must force the
platform through ``jax.config`` before any backend is initialized.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
