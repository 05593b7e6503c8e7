"""Lane-vs-monolith differential for the reduced object solve.

ops/object_lanes.py is the scalar-lane twin of
physics/point_world.object_forward (the reduced robot-prescribed
impedance solve); its module docstring names this file as the oracle
test.  Two comparisons per world class:

* lanes (f32) vs the monolithic solver run in f32 — same rows, same
  Newton, different code form: must agree to ~1e-5;
* lanes (f32) vs the monolithic solver run in FLOAT64 — bounds the f32
  round-off of the whole solve.

Worlds: PointPush (XY block), PointBilliard (hinge ball), PointFall
(round-5 falling block: z dof, gravity, platform perch, limits) and
PointMultiFall (block pairs with z).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mujoco_maze_tpu as mmt
from mujoco_maze_tpu.ops import object_lanes
from mujoco_maze_tpu.physics import point_world

CASES = ["PointPush-v0", "PointBilliard-v0", "PointFall-v0",
         "PointMultiFall-v2"]


def _setup(env_id, seed=0, warm_steps=6):
    spec = mmt.make_spec(env_id)
    assert spec.object_world is not None
    state, _ = spec.reset(jax.random.PRNGKey(seed))
    step = jax.jit(spec.step)
    rng = np.random.RandomState(seed)
    st = state
    for _ in range(warm_steps):
        act = jnp.asarray(rng.uniform(-1, 1, 2) * np.array([1.0, 0.25]),
                          jnp.float32)
        st = step(st, act).state
    oidx = np.asarray(spec._object_dof_idx())
    q = np.asarray(st.qpos, np.float64)
    v = np.asarray(st.qvel, np.float64)
    # drive the robot INTO the objects so contact rows are live
    rq3 = q[:3]
    rv3 = np.array([1.5, 1.5, 0.3])
    return spec, oidx, rq3, rv3, q[oidx], v[oidx]


@pytest.mark.parametrize("env_id", CASES)
def test_lanes_match_monolith(env_id):
    spec, oidx, rq3, rv3, oq, ov = _setup(env_id)
    owp, owb, oballs, oblocks = spec.object_world
    ks = object_lanes.spec_from_env(spec)
    assert ks is not None and ks.nd == len(oidx)

    # monolith, f32 (the same dtype the lanes run)
    qf32, vf32 = point_world.rk4_object_step(
        owp, owb, oballs, oblocks,
        jnp.asarray(rq3, jnp.float32), jnp.asarray(rv3, jnp.float32),
        jnp.asarray(oq, jnp.float32), jnp.asarray(ov, jnp.float32),
        floor_always=True)

    # lanes (0-d scalars = the XLA per-env path)
    lq = tuple(jnp.asarray(x, jnp.float32) for x in oq)
    lv = tuple(jnp.asarray(x, jnp.float32) for x in ov)
    lrq = tuple(jnp.asarray(x, jnp.float32) for x in rq3)
    lrv = tuple(jnp.asarray(x, jnp.float32) for x in rv3)
    loq, lov = object_lanes.object_step_lanes(ks, lrq, lrv, lq, lv)

    qe = max(abs(float(loq[i]) - float(qf32[i])) for i in range(ks.nd))
    ve = max(abs(float(lov[i]) - float(vf32[i])) for i in range(ks.nd))
    assert qe < 2e-5, f"{env_id}: lane-vs-monolith q err {qe:.2e}"
    assert ve < 2e-3, f"{env_id}: lane-vs-monolith v err {ve:.2e}"

    # monolith as float64 oracle: bounds the whole-solve f32 round-off
    with jax.enable_x64(True):
        spec64 = mmt.make_spec(env_id, dtype=jnp.float64)
        ow64 = spec64.object_world
        if ow64 is None:
            # f64 fidelity specs route Fall worlds to point_block_world;
            # rebuild the reduced world directly
            ms = spec64.structure
            oballs64 = (point_world.ball_world_from_structure(
                ms, dtype=jnp.float64) if ms.object_balls
                and spec64.robot.OBJBALL_TYPE == "hinge" else None)
            oblocks64 = point_world.block_world_from_structure(
                ms, dtype=jnp.float64, allow_z=True)
            owp64 = point_world.params_for_world(
                any_blocks=bool(ms.movable_blocks),
                dt=spec64.robot.timestep,
                torso_z=(0.75 + ms.height_offset) if ms.elevated else 0.0)
            owb64 = point_world.wall_boxes_from_structure(
                ms, dtype=jnp.float64)
        else:
            owp64, owb64, oballs64, oblocks64 = ow64
        q64, v64 = point_world.rk4_object_step(
            owp64, owb64, oballs64, oblocks64,
            jnp.asarray(rq3, jnp.float64), jnp.asarray(rv3, jnp.float64),
            jnp.asarray(oq, jnp.float64), jnp.asarray(ov, jnp.float64),
            floor_always=True)
        qe64 = max(abs(float(loq[i]) - float(q64[i]))
                   for i in range(ks.nd))
        assert qe64 < 5e-4, f"{env_id}: lane-vs-f64-oracle q err {qe64:.2e}"
