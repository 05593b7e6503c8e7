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

# Persistent XLA compilation cache (same mechanism as bench.py): engine
# compiles dominate the suite's wall clock, and cached executables load
# cross-process, so re-runs get dramatically cheaper.  Must go through
# jax.config.update — the axon site hook pre-imports jax at interpreter
# start, so JAX_* env vars set here are too late.
import jax  # noqa: E402  (after the platform guard above)

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
