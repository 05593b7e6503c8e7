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


def test_fall_block_perch_and_chasm_drop():
    """Round-5 regression: the falling block PERCHES on its platform and
    drops flush over the chasm (the Fall bridge mechanic).

    Probed on real MuJoCo 3 (tools/golden_gen world): the reference
    synthesizes the fall block overlapping its own elevated platform box
    and the box-box contact pops it out on top — z settles at +3.9217
    with the (-4, 0) z limit softly violated.  The engine's coupled
    2-row support (physics/contact.falling_support_force) settles at
    3.902; pushed past the platform edge the support target drops to the
    global floor and the block falls flush (z -> 0), creating the bridge
    the ant crosses.  The old unconditional z >= 0 clamp kept the block
    at z = 0 from reset — bridge pre-built, perched obstacle missing."""
    import jax
    import jax.numpy as jnp

    import mujoco_maze_tpu as mmt

    env = mmt.make_batched("AntFall-v0", num_envs=2, auto_reset=False,
                           fast_step=False)
    state, _ = env.reset(jax.random.PRNGKey(0))
    act = jnp.zeros((2, 8), jnp.float32)
    step = jax.jit(env.step)
    st = state
    for _ in range(25):
        st = step(st, act).state
    (_, zdof, _, _), = env.spec._falling_support
    z = float(st.qpos[0, zdof + 1])
    assert 3.80 < z < 4.0, f"perch z {z} (MuJoCo probe: 3.9217)"
    # push the block over the chasm row: support target drops to the
    # global floor and it falls flush
    q = np.asarray(st.qpos).copy()
    # qpos index of a non-free dof = vadr + 1; the y slide sits just
    # before the z slide, so its qpos index equals zdof
    q[:, zdof] = 8.0  # y slide one cell +y (the chasm row)
    st2 = st._replace(qpos=jnp.asarray(q))
    for _ in range(30):
        st2 = step(st2, act).state
    z2 = float(st2.qpos[0, zdof + 1])
    assert z2 < 0.05, f"chasm drop z {z2} (expect flush bridge ~0)"
