"""Test configuration: force CPU with 8 virtual devices.

Sharding tests exercise multi-chip layouts on a virtual CPU mesh — the
standard way to validate ``pjit``/``shard_map`` without a pod.  Note the
axon TPU plugin ignores the ``JAX_PLATFORMS`` env var, so we must force the
platform through ``jax.config`` before any backend is initialized.

``MMT_TEST_TPU=1`` keeps the real backend (for the opt-in TPU sweeps, e.g.
``MMT_FULL_REGISTRY=1 MMT_TEST_TPU=1 pytest tests/test_registry_full.py``).
"""

import os

if os.environ.get("MMT_TEST_TPU", "") != "1":
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )

    import jax

    jax.config.update("jax_platforms", "cpu")
