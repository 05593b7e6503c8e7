"""Composed-world Ant differential: our env vs real MuJoCo maze worlds.

Builds the reference-style composed XML (ant + maze geoms) on MuJoCo 3 via
tools/golden_gen.build_ant_world and compares the engine-path env stepping
from identical states.
"""

import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")

import jax
import jax.numpy as jnp

import mujoco_maze_tpu as mmt


@pytest.fixture(autouse=True)
def _x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


def _mj_world(env_id):
    import sys, os

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import golden_gen

    m, ms, task = golden_gen.build_ant_world(env_id)
    return m, mujoco.MjData(m)


def test_ant_umaze_drop_matches():
    """Zero-action drop inside the composed UMaze world: first 10 steps
    match MuJoCo closely (floor contacts + ankle limits active)."""
    m, d = _mj_world("AntUMaze-v0")
    spec = mmt.make_spec("AntUMaze-v0", dtype=jnp.float64)
    assert m.nq == spec.nq and m.nv == spec.nv
    d.qpos[:] = m.qpos0
    mujoco.mj_forward(m, d)
    state, _ = spec.reset(jax.random.PRNGKey(0))
    state = state._replace(
        qpos=jnp.asarray(m.qpos0.copy()), qvel=jnp.zeros(m.nv)
    )
    step = jax.jit(spec.step)
    errs = []
    for t in range(10):
        # one env step = frame_skip(5) engine substeps of dt 0.02
        d.ctrl[:] = 0
        for _ in range(5):
            mujoco.mj_step(m, d)
        res = step(state, jnp.zeros(8))
        state = res.state
        errs.append(np.abs(np.asarray(state.qpos)[:3] - d.qpos[:3]).max())
    # exact through the fall (pre-contact), bounded through the bounce
    # (restitution coupling differs), reconverged at rest
    assert errs[0] < 1e-4 and errs[1] < 1e-4
    assert max(errs) < 0.2
    assert errs[-1] < 0.02


def test_ant_wall_blocks_motion():
    """Driving the ant into a UMaze wall: it cannot pass through."""
    spec = mmt.make_spec("AntUMaze-v0")
    state, _ = spec.reset(jax.random.PRNGKey(0))
    # wall face toward -x at x = -(0.5*8)=-4 (cell boundary); push west
    qvel = state.qvel.at[0].set(-6.0)
    state = state._replace(qvel=qvel)
    step = jax.jit(spec.step)
    for _ in range(20):
        res = step(state, jnp.zeros(8))
        state = res.state
    # torso sphere (r 0.25) cannot penetrate the wall face at x=-4
    assert float(state.qpos[0]) > -4.0
    assert bool(jnp.isfinite(state.qpos).all())


def test_ant_push_world_matches_structure():
    """Composed AntPush world: same dof layout as MuJoCo's composition."""
    m, d = _mj_world("AntPush-v0")
    spec = mmt.make_spec("AntPush-v0")
    assert m.nq == spec.nq and m.nv == spec.nv
    # block joint limits: mujoco has the +-scaling slide range only for
    # falling blocks; ours encode wall travel — compare initial qpos instead
    np.testing.assert_allclose(m.qpos0, spec.init_qpos, atol=1e-10)


def test_fall_engine_step_finite():
    """Regression (TPU): the falling block's 0.001-mass diagonal must
    survive the CRB einsums.  TPU MXU matmuls default to bf16 multiplies;
    before engine.highest_matmul forced float32 precision, the bf16
    cancellation error (~0.05 absolute at AntFall's elevated anchors)
    flipped that diagonal negative and the Cholesky exploded to NaN for a
    few percent of reset states (CPU matmuls are exact-f32, so this only
    bites on device)."""
    import jax
    import jax.numpy as jnp

    import mujoco_maze_tpu as mmt

    env = mmt.make_batched("AntFall-v0", num_envs=64, auto_reset=False,
                           fast_step=False, engine_batched=False)
    state, _ = env.reset(jax.random.PRNGKey(0))
    for _ in range(2):
        res = env.step(state, jnp.zeros((64, 8), jnp.float32))
        assert bool(jnp.isfinite(res.state.qpos).all())
        assert bool(jnp.isfinite(res.state.qvel).all())
        state = res.state
