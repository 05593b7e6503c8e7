"""Probe the exact f64 point-world engine to derive the f32 object model.

The float32 production path needs a cheap per-step update for object balls
(Billiard) and movable blocks (Push) that reproduces the *behavior class*
of the exact engine (physics/point_world.py — itself validated bit-exact
against MuJoCo 3).  In the near-massless-object limit the Newton contact
solve reduces to tracking the per-row reference acceleration
``aref = -b*u + k(pen)*pen`` — a linear spring-damper ODE in (pen, u).
This probe measures, from the f64 engine directly:

  1. free-ball decay per env step (exponential rate of the floor-friction
     row) and whether it is velocity-proportional or Coulomb;
  2. robot->ball velocity transfer as a function of initial penetration
     and relative velocity (one RK4 step);
  3. block strike: velocity acquired, glide behavior, wall stop.

Run on CPU: python tools/probe_f32_objects.py
"""

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import mujoco_maze_tpu as mmt  # noqa: E402
from mujoco_maze_tpu.physics import point_world as pw  # noqa: E402


def billiard_world():
    spec = mmt.make_spec("PointBilliard-v0", dtype=jnp.float64)
    p, boxes = spec.point_world
    balls = spec.point_ball_world
    return spec, p, boxes, balls


def push_world():
    spec = mmt.make_spec("PointPush-v0", dtype=jnp.float64)
    p, boxes = spec.point_world
    blocks = spec.point_block_world
    return spec, p, boxes, blocks


def probe_ball_decay():
    spec, p, boxes, balls = billiard_world()
    r_b = float(balls.r[0])
    bp = np.asarray(balls.body_pos[0])
    print(f"# ball r={r_b}, mass={float(balls.mass[0]):.3e}, body_pos={bp}")
    step = jax.jit(lambda q, v: pw.rk4_step_world(p, boxes, balls, q, v, None))
    # robot parked far away; ball at body origin with velocity v
    for v0 in (0.25, 0.5, 1.0, 2.0, 4.0):
        q = jnp.zeros(6).at[0].set(bp[0] + 100.0).at[1].set(bp[1])  # robot far
        # keep robot inside a wall-free zone: actually move it far in x only
        q = jnp.asarray([0.0, 0.0, 0.0, 0.0, 0.0, 0.0], jnp.float64)
        v = jnp.asarray([0.0, 0.0, 0.0, v0, 0.0, 0.0], jnp.float64)
        vs = [v0]
        for _ in range(8):
            q, v = step(q, v)
            vs.append(float(v[3]))
        ratios = [vs[i + 1] / vs[i] if vs[i] > 1e-12 else 0.0
                  for i in range(len(vs) - 1)]
        deltas = [vs[i] - vs[i + 1] for i in range(len(vs) - 1)]
        print(f"v0={v0:5.2f}  v' sequence: "
              + " ".join(f"{x:.4f}" for x in vs[:6]))
        print(f"          ratios: " + " ".join(f"{r:.4f}" for r in ratios[:6])
              + "   deltas: " + " ".join(f"{d:.4f}" for d in deltas[:6]))


def probe_ball_strike():
    spec, p, boxes, balls = billiard_world()
    r_b = float(balls.r[0])
    step = jax.jit(lambda q, v: pw.rk4_step_world(p, boxes, balls, q, v, None))
    R = p.sphere_r
    print(f"\n# strike: robot at x-offset so overlap=pen, robot qvel=vr, "
          f"ball initially at rest. contact dist uses z-offset "
          f"{r_b - p.sphere_z:+.3f}")
    bp = np.asarray(balls.body_pos[0])
    for pen in (0.02, 0.05, 0.1, 0.2, 0.4):
        for vr in (0.0, 1.0, 3.0):
            # plane distance: centers offset dx with dz fixed
            dz = r_b - p.sphere_z
            dist = R + r_b - pen
            dx = np.sqrt(max(dist * dist - dz * dz, 1e-12))
            # robot left of ball center, moving +x
            q = (jnp.zeros(6, jnp.float64)
                 .at[0].set(bp[0] - dx).at[1].set(bp[1]))
            v = jnp.zeros(6, jnp.float64).at[0].set(vr)
            q1, v1 = step(q, v)
            print(f"pen={pen:4.2f} vr={vr:3.1f} -> ball dv=({float(v1[3]):+.4f},"
                  f"{float(v1[4]):+.4f}) dspin={float(v1[5]):+.4f} "
                  f"dq=({float(q1[3]):+.5f}) robot dv={float(v1[0]) - vr:+.4f}")
    # off-center strike: does the ball pick up hinge spin?
    print("# off-center strike (robot below-left, moving +x):")
    dz = r_b - p.sphere_z
    dist = R + r_b - 0.2
    dxy = np.sqrt(max(dist * dist - dz * dz, 1e-12))
    ang = np.deg2rad(30)
    q = (jnp.zeros(6, jnp.float64)
         .at[0].set(bp[0] - dxy * np.cos(ang))
         .at[1].set(bp[1] - dxy * np.sin(ang)))
    v = jnp.zeros(6, jnp.float64).at[0].set(2.0)
    q1, v1 = step(q, v)
    print(f"  ball dv=({float(v1[3]):+.4f},{float(v1[4]):+.4f}) "
          f"dspin={float(v1[5]):+.6f} th={float(q1[5]):+.6f}")


def probe_ball_decay_spinning():
    """Decay when the hinge angle is nonzero (floor switch may activate)."""
    spec, p, boxes, balls = billiard_world()
    step = jax.jit(lambda q, v: pw.rk4_step_world(p, boxes, balls, q, v, None))
    print("\n# decay with nonzero hinge angle / spin:")
    for th0, w0 in ((0.3, 0.0), (1.234567, 0.0), (0.3, 2.0), (0.0, 2.0)):
        q = jnp.zeros(6, jnp.float64).at[5].set(th0)
        v = jnp.asarray([0, 0, 0, 1.0, 0.0, w0], jnp.float64)
        vs, ws, active = [1.0], [w0], []
        for _ in range(10):
            from mujoco_maze_tpu.physics.point_world import _floor_switch
            act, _ = _floor_switch(q[5])
            active.append(bool(act))
            q, v = step(q, v)
            vs.append(float(v[3]))
            ws.append(float(v[5]))
        print(f"th0={th0} w0={w0}: v={['%.4f' % x for x in vs[:8]]}")
        print(f"   spin={['%.4f' % x for x in ws[:8]]} active={active[:8]}")


def probe_block():
    spec, p, boxes, blocks = push_world()
    print(f"\n# blocks: mass={np.asarray(blocks.mass)}, "
          f"half={np.asarray(blocks.half)}")
    step = jax.jit(
        lambda q, v: pw.rk4_step_world(p, boxes, None, q, v, blocks))
    nd = 3 + int(np.sum(np.asarray(blocks.has_x))
                 + np.sum(np.asarray(blocks.has_y)))
    print(f"# world dofs = {nd}")
    bp = np.asarray(blocks.body_pos[0])[:2]
    half = float(np.asarray(blocks.half)[0][0])
    R = p.sphere_r
    # robot pressing into block face from -x at given pen, robot vel vr
    for pen in (0.02, 0.05, 0.1, 0.2):
        for vr in (0.0, 1.0, 3.0):
            q = jnp.zeros(nd, jnp.float64)
            # robot so that disc edge overlaps block -x face by pen
            q = q.at[0].set(bp[0] - half - R + pen).at[1].set(bp[1])
            v = jnp.zeros(nd, jnp.float64).at[0].set(vr)
            q1, v1 = step(q, v)
            print(f"pen={pen:4.2f} vr={vr:3.1f} -> block dv={float(v1[3]):+.4f} "
                  f"dq={float(q1[3]):+.5f} robot dv={float(v1[0]) - vr:+.4f}")
    # glide: block with velocity, robot far
    print("# glide (no contact):")
    q = jnp.zeros(nd, jnp.float64).at[0].set(-3.0)
    v = jnp.zeros(nd, jnp.float64).at[3].set(1.0)
    for t in range(5):
        q, v = step(q, v)
        print(f"  t={t}: block v={float(v[3]):.6f} q={float(q[3]):.4f}")


if __name__ == "__main__":
    probe_ball_decay()
    probe_ball_strike()
    probe_ball_decay_spinning()
    probe_block()
