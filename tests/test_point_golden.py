"""Differential fidelity tests: JAX Point engine vs recorded MuJoCo goldens.

Goldens are produced by ``tools/golden_gen.py``: the reference's composed
world on real MuJoCo 3 with the reference's step semantics (kinematic point
writes + mj_step + manual collision).  Metrics:

* free-run: first steps match closely (kinematics dominate; mj_step residual
  is mm-scale);
* teacher-forced: stepping *from the golden state* each step bounds the
  one-step model error without chaotic compounding (wall-bounce steps make
  long free runs diverge — expected for any non-bit-identical engine).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mujoco_maze_tpu as mmt

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")

# (env_id, seed, free-run atol): wall-heavy seeds diverge faster because the
# engine's contact-solver noise (warmstart-dependent ejection velocities) is
# not bit-reproducible — the 4Rooms seed presses into walls from step ~2.
CASES = [
    ("PointUMaze-v0", 0, 5e-3),
    ("PointUMaze-v0", 7, 1.5e-2),
    ("Point4Rooms-v1", 3, 0.6),
    ("PointCorridor-v0", 5, 5e-3),
]


def _load(env_id, seed):
    path = os.path.join(GOLDEN_DIR, f"{env_id}_s{seed}.npz")
    if not os.path.exists(path):
        pytest.skip(f"golden {path} missing (run tools/golden_gen.py)")
    return np.load(path)


@pytest.mark.parametrize("env_id, seed, atol", CASES)
def test_free_run_short_horizon(env_id, seed, atol):
    g = _load(env_id, seed)
    spec = mmt.make_spec(env_id)
    state, _ = spec.reset(jax.random.PRNGKey(0))
    state = state._replace(
        qpos=jnp.asarray(g["reset_qpos"], jnp.float32),
        qvel=jnp.asarray(g["reset_qvel"], jnp.float32),
    )
    step = jax.jit(spec.step)
    for t in range(10):
        res = step(state, jnp.asarray(g["actions"][t], jnp.float32))
        state = res.state
        np.testing.assert_allclose(
            np.asarray(state.qpos)[:3], g["qpos"][t][:3], atol=atol,
            err_msg=f"t={t}",
        )


# exact-path (float64 point_world replica) cases:
# (env_id, seed, tf_mean_bound, freerun_steps, freerun_atol).
# Teacher-forced medians are 0.0 — the replica is bit-exact on the majority
# of steps; the mean is set by MuJoCo's own chaos floor: whether an RK4
# stage activates the floor contact depends on the last ulp of cos(th/2)
# (see physics/point_world.py docstring), so any state difference ≥1e-15
# flips it with ~20% probability.  Free-run bounds reflect that: corridor
# seeds track for 200 steps; the 4Rooms seed presses walls from step 2 and
# amplifies a single flip into ~0.1 position noise.
EXACT_CASES = [
    ("PointUMaze-v0", 0, 2e-3, 10, 1e-2),
    ("PointUMaze-v0", 7, 2e-3, 10, 1e-2),
    ("Point4Rooms-v1", 3, 2e-3, 10, 0.3),
    ("PointCorridor-v0", 5, 1e-4, 200, 5e-2),
]


@pytest.mark.parametrize("env_id, seed, tf_mean, fr_steps, fr_atol", EXACT_CASES)
def test_exact_point_world_fidelity(env_id, seed, tf_mean, fr_steps, fr_atol):
    """float64 spec routes through physics/point_world.py (exact replica)."""
    g = _load(env_id, seed)
    with jax.enable_x64(True):
        spec = mmt.make_spec(env_id, dtype=jnp.float64)
        state0, _ = spec.reset(jax.random.PRNGKey(0))
        step = jax.jit(spec.step)
        errs = []
        qpos_prev, qvel_prev = g["reset_qpos"], g["reset_qvel"]
        for t in range(len(g["actions"])):
            st = state0._replace(
                qpos=jnp.asarray(qpos_prev, jnp.float64),
                qvel=jnp.asarray(qvel_prev, jnp.float64),
            )
            res = step(st, jnp.asarray(g["actions"][t], jnp.float64))
            errs.append(np.abs(np.asarray(res.state.qpos)[:3] - g["qpos"][t][:3]).max())
            qpos_prev, qvel_prev = g["qpos"][t], g["qvel"][t]
        errs = np.asarray(errs)
        assert errs.mean() < tf_mean, f"teacher-forced mean {errs.mean():.2e}"
        assert np.median(errs) < 1e-9, (
            f"teacher-forced median {np.median(errs):.2e} — majority of steps "
            "should be bit-exact")
        # free run
        st = state0._replace(
            qpos=jnp.asarray(g["reset_qpos"], jnp.float64),
            qvel=jnp.asarray(g["reset_qvel"], jnp.float64),
        )
        for t in range(fr_steps):
            res = step(st, jnp.asarray(g["actions"][t], jnp.float64))
            st = res.state
            err = np.abs(np.asarray(st.qpos)[:2] - g["qpos"][t][:2]).max()
            assert err < fr_atol, f"free-run err {err:.2e} at t={t}"


@pytest.mark.parametrize("env_id, seed, atol", CASES)
def test_teacher_forced_one_step_error(env_id, seed, atol):
    g = _load(env_id, seed)
    spec = mmt.make_spec(env_id)
    state0, _ = spec.reset(jax.random.PRNGKey(0))
    step = jax.jit(spec.step)
    errs = []
    qpos_prev, qvel_prev = g["reset_qpos"], g["reset_qvel"]
    for t in range(len(g["actions"])):
        st = state0._replace(
            qpos=jnp.asarray(qpos_prev, jnp.float32),
            qvel=jnp.asarray(qvel_prev, jnp.float32),
        )
        res = step(st, jnp.asarray(g["actions"][t], jnp.float32))
        errs.append(np.abs(np.asarray(res.state.qpos)[:3] - g["qpos"][t][:3]))
        qpos_prev, qvel_prev = g["qpos"][t], g["qvel"][t]
    errs = np.asarray(errs)
    assert errs.mean() < 0.01, f"mean one-step error {errs.mean()}"
    assert np.median(errs) < 2e-3, f"median one-step error {np.median(errs)}"


def test_kinematic_exactness_no_contact():
    """Away from walls with zero qvel, the step is bit-level kinematics."""
    spec = mmt.make_spec("PointUMaze-v0")
    state, _ = spec.reset(jax.random.PRNGKey(0))
    state = state._replace(
        qpos=jnp.zeros_like(state.qpos), qvel=jnp.zeros_like(state.qvel)
    )
    res = jax.jit(spec.step)(state, jnp.asarray([0.3, 0.1], jnp.float32))
    ori = 0.1
    np.testing.assert_allclose(
        np.asarray(res.state.qpos),
        [np.cos(ori) * 0.3, np.sin(ori) * 0.3, ori],
        rtol=1e-6,
    )


def test_exact_billiard_strike_golden():
    """Exact path (float64 coupled robot+ball solve): the strike scenario
    is bit-exact teacher-forced on most steps; free-run ball placement is
    bounded by the robot floor-switch chaos (~0.4 over the 120-step run)."""
    path = os.path.join(GOLDEN_DIR, "PointBilliard-v0_strike.npz")
    if not os.path.exists(path):
        pytest.skip("strike golden missing")
    g = np.load(path)
    with jax.enable_x64(True):
        spec = mmt.make_spec("PointBilliard-v0", dtype=jnp.float64)
        assert spec.point_ball_world is not None
        state0, _ = spec.reset(jax.random.PRNGKey(0))
        step = jax.jit(spec.step)
        # teacher-forced: per-step error vs mj_step
        errs = []
        qp, qv = g["reset_qpos"], g["reset_qvel"]
        for t in range(len(g["actions"])):
            st = state0._replace(qpos=jnp.asarray(qp, jnp.float64),
                                 qvel=jnp.asarray(qv, jnp.float64))
            res = step(st, jnp.asarray(g["actions"][t], jnp.float64))
            errs.append(np.abs(np.asarray(res.state.qpos) - g["qpos"][t]).max())
            qp, qv = g["qpos"][t], g["qvel"][t]
        errs = np.asarray(errs)
        assert errs.mean() < 1e-3, f"strike teacher-forced mean {errs.mean():.2e}"
        assert np.median(errs) < 1e-9
        # free run: final ball within 0.5 of the MuJoCo golden (old
        # calibrated model: 1.5)
        st = state0._replace(qpos=jnp.asarray(g["reset_qpos"], jnp.float64),
                             qvel=jnp.asarray(g["reset_qvel"], jnp.float64))
        for t in range(len(g["actions"])):
            st = step(st, jnp.asarray(g["actions"][t], jnp.float64)).state
        ball = np.asarray(spec.ball_runtimes[0].body_pos) + np.asarray(st.qpos)[3:5]
        assert np.linalg.norm(ball - g["ball_xy"][-1]) < 0.5


def test_exact_billiard_rolling_golden():
    """Ball dynamics on the untouched-ball seed are bit-exact for the whole
    200-step teacher-forced trajectory (the ball's floor-contact switch is
    replicated at the ulp level)."""
    g = _load("PointBilliard-v0", 11)
    with jax.enable_x64(True):
        spec = mmt.make_spec("PointBilliard-v0", dtype=jnp.float64)
        state0, _ = spec.reset(jax.random.PRNGKey(0))
        step = jax.jit(spec.step)
        ball_errs, rob_errs = [], []
        qp, qv = g["reset_qpos"], g["reset_qvel"]
        for t in range(len(g["actions"])):
            st = state0._replace(qpos=jnp.asarray(qp, jnp.float64),
                                 qvel=jnp.asarray(qv, jnp.float64))
            res = step(st, jnp.asarray(g["actions"][t], jnp.float64))
            q = np.asarray(res.state.qpos)
            ball_errs.append(np.abs(q[3:6] - g["qpos"][t][3:6]).max())
            rob_errs.append(np.abs(q[:3] - g["qpos"][t][:3]).max())
            qp, qv = g["qpos"][t], g["qvel"][t]
        assert max(ball_errs) < 1e-9, f"ball err {max(ball_errs):.2e}"
        assert np.mean(rob_errs) < 1e-3


@pytest.mark.parametrize("seed", [2, 9])
def test_exact_push_block_momentum_golden(seed):
    """Exact path on PointPush: movable blocks carry momentum (struck
    blocks glide until a wall — probed MuJoCo behavior) and the coupled
    solve matches mj_step: teacher-forced medians are bit-exact, block
    mean error < 1e-3."""
    g = _load("PointPush-v0", seed)
    with jax.enable_x64(True):
        spec = mmt.make_spec("PointPush-v0", dtype=jnp.float64)
        assert spec.point_block_world is not None
        state0, _ = spec.reset(jax.random.PRNGKey(0))
        step = jax.jit(spec.step)
        rob, blk = [], []
        qp, qv = g["reset_qpos"], g["reset_qvel"]
        for t in range(len(g["actions"])):
            st = state0._replace(qpos=jnp.asarray(qp, jnp.float64),
                                 qvel=jnp.asarray(qv, jnp.float64))
            res = step(st, jnp.asarray(g["actions"][t], jnp.float64))
            qn = np.asarray(res.state.qpos)
            rob.append(np.abs(qn[:3] - g["qpos"][t][:3]).max())
            blk.append(np.abs(qn[3:5] - g["qpos"][t][3:5]).max())
            qp, qv = g["qpos"][t], g["qvel"][t]
        assert np.median(rob) < 1e-9
        assert np.mean(blk) < 1e-3, f"block mean err {np.mean(blk):.2e}"
        assert np.mean(rob) < 2e-3, f"robot mean err {np.mean(rob):.2e}"


def test_billiard_strike_golden():
    """Directed strike scenario: the point drives through the ball.  The
    soft-push model must reproduce MuJoCo's behavior class — a light nudge
    (~1 m) that stops quickly — not plowing the ball across the maze.
    Exact direction is aliasing-limited (one contact sample per teleport
    step), so the bound is coarse."""
    import os

    path = os.path.join(GOLDEN_DIR, "PointBilliard-v0_strike.npz")
    if not os.path.exists(path):
        pytest.skip("strike golden missing")
    g = np.load(path)
    spec = mmt.make_spec("PointBilliard-v0")
    state0, _ = spec.reset(jax.random.PRNGKey(0))
    step = jax.jit(spec.step)
    st = state0._replace(
        qpos=jnp.asarray(g["reset_qpos"], jnp.float32),
        qvel=jnp.asarray(g["reset_qvel"], jnp.float32),
    )
    for t in range(len(g["actions"])):
        res = step(st, jnp.asarray(g["actions"][t], jnp.float32))
        st = res.state
    ball = np.asarray(spec.ball_runtimes[0].body_pos) + np.asarray(st.qpos)[3:5]
    gold = g["ball_xy"][-1]
    start = np.array([0.0, -3.0])
    # both moved, in the same order of magnitude, and ours is within 1.5 of gold
    assert 0.02 < np.linalg.norm(ball - start) < 2.5
    assert np.linalg.norm(ball - gold) < 1.5
