"""Full-registry smoke: every registered env ID builds and steps.

The reference smoke-tests every registered combination against the C engine
(`/root/reference/tests/test_envs.py:7-18`); the CPU default suite here
narrows Ant to 5 mazes for compile cost (tests/test_envs.py).  This module
restores full coverage behind opt-in gates:

* ``MMT_FULL_REGISTRY=1`` — trace-level check on any backend: build the spec
  and abstractly evaluate reset+step (``jax.eval_shape``) for EVERY env ID.
  Catches shape/trace errors in exotic worlds (MultiFall, BlockCarry, ...)
  at ~6s/env without paying XLA compilation.
* TPU backend (or ``MMT_FULL_REGISTRY_STEP=1``) — additionally execute one
  real reset+step per env ID on the device.

Run: ``MMT_FULL_REGISTRY=1 python -m pytest tests/test_registry_full.py -q``
"""

import os

import jax
import numpy as np
import pytest

import mujoco_maze_tpu as mmt

FULL = os.environ.get("MMT_FULL_REGISTRY", "") == "1"
RUN_STEP = (
    os.environ.get("MMT_FULL_REGISTRY_STEP", "") == "1"
    or (FULL and jax.default_backend() == "tpu")
)

pytestmark = pytest.mark.skipif(
    not FULL, reason="set MMT_FULL_REGISTRY=1 for the full-registry sweep"
)


@pytest.mark.parametrize("env_id", mmt.env_ids())
def test_registry_build_and_step(env_id):
    spec = mmt.make_spec(env_id)
    state_sds, obs_sds = jax.eval_shape(spec.reset, jax.random.PRNGKey(0))
    assert obs_sds.shape == (spec.obs_dim,)
    act_sds = jax.ShapeDtypeStruct((spec.robot.action_dim,), spec.dtype)
    res = jax.eval_shape(spec.step, state_sds, act_sds)
    assert res.obs.shape == (spec.obs_dim,)
    assert res.reward.shape == ()
    assert res.terminated.shape == ()
    if RUN_STEP:
        import jax.numpy as jnp

        state, obs = jax.jit(spec.reset)(jax.random.PRNGKey(0))
        lo, hi = spec.action_bounds()
        act = jnp.asarray((lo + hi) / 2.0 + 0.1 * (hi - lo), spec.dtype)
        out = jax.jit(spec.step)(state, act)
        assert np.isfinite(np.asarray(out.obs)).all(), env_id
        assert np.isfinite(float(out.reward)), env_id


@pytest.mark.parametrize("env_id", mmt.env_ids())
def test_registry_kernel_lowering(env_id):
    """Every registered env ID lowers a fused Pallas kernel spec (round-2
    coverage guarantee): blocks, balls, pass-through worlds included."""
    import importlib

    from mujoco_maze_tpu import ops

    spec = mmt.make_spec(env_id)
    mod = importlib.import_module(
        f".{ops._KERNEL_MODULES[spec.robot.NAME]}", ops.__package__)
    ks = mod.spec_from_env(spec)  # raises if the combo lost coverage
    assert ks is not None
