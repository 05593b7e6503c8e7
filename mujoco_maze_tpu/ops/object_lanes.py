"""Scalar-lane reduced object contact solve (float32 production path).

One implementation of the robot-prescribed object dynamics
(:func:`physics.point_world.object_forward` — derived impedance rows +
primal Newton, objects near-massless so the robot is kinematic) written in
*lane form*: every value is a "lane scalar" — a 0-d jnp scalar on the XLA
per-env path (vmapped by ``BatchedMazeEnv``) or a ``(TB,)`` lane vector
inside the Pallas rollout/step kernels.  Both paths therefore run
bit-identical object physics (kernel-vs-XLA differential tests hold by
construction); the monolithic float64 solver stays as the validation
oracle (``tests/test_object_lanes.py``).

Contact inventory per object (mirrors ``object_forward``):

* ball: sphere-vs-wall-boxes, floor friction (the production path takes
  MuJoCo's ulp-rounding floor switch as always-active — see
  ``object_forward`` docstring), robot-sphere-vs-ball (3D tilted normal),
  arrow-box-vs-ball, ball-vs-ball;
* block: robot-sphere-vs-block, arrow-vs-block (box-box SAT + incident
  edge clip), block-vs-walls (parallel-face AABB, statically pruned to the
  walls reachable within the block's travel limits), block-vs-block,
  ball-vs-block.

Solver: the same primal Newton with pyramid rows
``aref = -b (J v) + k(pen) pen``, ``R = (1-d)/d * 2(1+mu^2) * invw``,
restricted to the object dofs, with an unrolled Cholesky solve (H is SPD)
and bisection line search.  Iteration counts are trace-time constants.
"""

from __future__ import annotations

import math
from typing import List, NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

F = np.float32


class BallL(NamedTuple):
    body_pos: tuple      # (bx, by)
    r: float
    mass: float
    inertia: float
    dof: int             # ordinal of this ball's x dof in the object vector


class BlockL(NamedTuple):
    body_pos: tuple      # (bx, by, bz)
    half: tuple          # (hx, hy, hz)
    mass: float
    dof_x: int           # ordinal in the object vector, -1 if absent
    dof_y: int
    wall_idx: tuple      # statically reachable wall indices
    dof_z: int = -1      # falling blocks (round-5): slide-z ordinal
    # joint-coordinate limit ranges ((xlo,xhi)|None, (ylo,yhi)|None,
    # (zlo,zhi)|None), or None for unlimited push blocks
    lim: tuple = None


class ObjectLanesSpec(NamedTuple):
    """Trace-time constants of the reduced object solve."""

    wb_c: np.ndarray       # (W, 3) wall box centers
    wb_h: np.ndarray       # (W, 3) half extents
    balls: tuple           # BallL
    blocks: tuple          # BlockL
    nd: int                # object dof count
    masses: tuple          # (nd,) per-dof mass
    # robot geometry (PointWorldParams)
    sphere_r: float
    sphere_z: float
    invw_r: float
    arrow_off: float
    arrow_half_l: float
    arrow_half_w: float
    arrow_z_lo: float
    arrow_z_hi: float
    # contact constants
    dt: float
    mu: float
    tc: float
    zeta: float
    dmin: float
    dmax: float
    width: float
    f_dmin: float
    f_dmax: float
    f_width: float
    newton_iters: int
    ls_iters: int


BB_DMIN, BB_DMAX, BB_WIDTH = 0.9, 0.99, 0.001          # object-pair solimp
BLW_DMIN, BLW_DMAX, BLW_WIDTH = 0.995, 0.995, 0.01     # block-wall solimp
FLOOR_PEN = 2.0 ** -54


def spec_from_env(spec) -> "ObjectLanesSpec | None":
    """Build the lane spec from a MazeEnvSpec, or None when the env has no
    reduced object world (no objects / z-dof / spin blocks)."""
    ow = getattr(spec, "object_world", None)
    if ow is None:
        return None
    p, boxes, balls, blocks = ow
    wb_c = np.asarray(boxes.c, np.float64)
    wb_h = np.asarray(boxes.h, np.float64)
    mask = np.asarray(boxes.mask) > 0
    wb_c, wb_h = wb_c[mask], wb_h[mask]
    dof = 0
    balls_l: List[BallL] = []
    masses: List[float] = []
    if balls is not None:
        for i in range(balls.nb):
            m = float(np.asarray(balls.mass)[i])
            balls_l.append(BallL(
                body_pos=tuple(float(x) for x in np.asarray(balls.body_pos)[i]),
                r=float(np.asarray(balls.r)[i]),
                mass=m,
                inertia=float(np.asarray(balls.inertia)[i]),
                dof=dof,
            ))
            masses += [m, m, float(np.asarray(balls.inertia)[i])]
            dof += 3
    blocks_l: List[BlockL] = []
    if blocks is not None:
        half = np.asarray(blocks.half, np.float64)
        bpos = np.asarray(blocks.body_pos, np.float64)
        bmass = np.asarray(blocks.mass, np.float64)
        # static wall pruning: find the block's reachable AABB from its
        # travel limits (env runtimes carry xy_lo/xy_hi) and keep only the
        # walls whose xy footprint can overlap it
        has_z = blocks.has_z or (False,) * blocks.nb
        lims = blocks.lim or (None,) * blocks.nb
        rts = list(spec.block_runtimes)
        for k in range(blocks.nb):
            dx = dy = dz = -1
            if blocks.has_x[k]:
                dx = dof
                dof += 1
                masses.append(float(bmass[k]))
            if blocks.has_y[k]:
                dy = dof
                dof += 1
                masses.append(float(bmass[k]))
            if has_z[k]:
                dz = dof
                dof += 1
                masses.append(float(bmass[k]))
            rt = rts[k]
            lo = np.asarray(rt.xy_lo, np.float64) - half[k][:2]
            hi = np.asarray(rt.xy_hi, np.float64) + half[k][:2]
            reach = []
            for w in range(wb_c.shape[0]):
                if (wb_c[w, 0] - wb_h[w, 0] <= hi[0] + 1e-9
                        and wb_c[w, 0] + wb_h[w, 0] >= lo[0] - 1e-9
                        and wb_c[w, 1] - wb_h[w, 1] <= hi[1] + 1e-9
                        and wb_c[w, 1] + wb_h[w, 1] >= lo[1] - 1e-9):
                    reach.append(w)
            blocks_l.append(BlockL(
                body_pos=tuple(float(x) for x in bpos[k]),
                half=tuple(float(x) for x in half[k]),
                mass=float(bmass[k]),
                dof_x=dx, dof_y=dy, dof_z=dz,
                wall_idx=tuple(reach),
                lim=lims[k],
            ))
    return ObjectLanesSpec(
        wb_c=wb_c.astype(np.float32), wb_h=wb_h.astype(np.float32),
        balls=tuple(balls_l), blocks=tuple(blocks_l),
        nd=dof, masses=tuple(masses),
        sphere_r=float(p.sphere_r), sphere_z=float(p.sphere_z),
        invw_r=float(p.invw_t),
        arrow_off=float(p.arrow_off), arrow_half_l=float(p.arrow_half_l),
        arrow_half_w=float(p.arrow_half_w),
        arrow_z_lo=float(p.arrow_z_lo), arrow_z_hi=float(p.arrow_z_hi),
        dt=float(p.dt), mu=float(p.mu), tc=float(p.tc), zeta=float(p.zeta),
        dmin=float(p.dmin), dmax=float(p.dmax), width=float(p.width),
        f_dmin=float(p.f_dmin), f_dmax=float(p.f_dmax),
        f_width=float(p.f_width),
        # production counts: (6, 10) measured equal to the exact-path
        # (10, 14) oracle at 2.4e-6 across the object-world probe tables
        # (the object subproblem is tiny and converges in a handful of
        # Newton steps); ~40% less kernel code and per-step work
        newton_iters=6, ls_iters=10,
    )


# ---------------------------------------------------------------------------
# lane helpers
# ---------------------------------------------------------------------------

def _imp(pen, dmin, dmax, width):
    x = jnp.clip(pen / F(width), 0.0, 1.0)
    y = jnp.where(x < 0.5, 2.0 * x * x, 1.0 - 2.0 * (1.0 - x) * (1.0 - x))
    return F(dmin) + y * F(dmax - dmin)


def _make_frame_lane(nx, ny, nz):
    """mju_makeFrame tangents (point_world._make_frame, lane form)."""
    near_y = jnp.abs(ny) > F(0.99995)
    t1x_a = -nx * ny
    t1y_a = 1.0 - ny * ny
    t1z_a = -nz * ny
    nrm_a = jnp.sqrt(t1x_a * t1x_a + t1y_a * t1y_a + t1z_a * t1z_a + F(1e-30))
    zero = jnp.zeros_like(ny)
    one = jnp.ones_like(ny)
    t1 = (jnp.where(near_y, zero, t1x_a / nrm_a),
          jnp.where(near_y, zero, t1y_a / nrm_a),
          jnp.where(near_y, one, t1z_a / nrm_a))
    n3 = (nx, ny, nz)
    t2 = (n3[1] * t1[2] - n3[2] * t1[1],
          n3[2] * t1[0] - n3[0] * t1[2],
          n3[0] * t1[1] - n3[1] * t1[0])
    return n3, t1, t2


class _Row(NamedTuple):
    J: tuple     # (nd,) lane scalars
    aref: object
    rinv: object  # 0 where inactive


def _add_contact(ks, rows, jn, jt1, jt2, vb_n, vb_t1, vb_t2,
                 v, pen, active, zmult, dmin, dmax, width, invw):
    """Append the 4 pyramid rows of one contact.

    ``jn/jt1/jt2``: (nd,) object-column jacobians of the normal/tangents.
    ``vb_*``: the ROBOT's velocity contribution to each direction's J·v
    (zero for object-only contacts).  ``v``: (nd,) object velocities.
    """
    mu = F(ks.mu)
    d = _imp(pen, dmin, dmax, width)
    k = d / F(dmax * dmax * ks.tc * ks.tc * ks.zeta * ks.zeta)
    b = F(2.0 / (dmax * ks.tc))
    vn = vb_n
    vt1 = vb_t1
    vt2 = vb_t2
    for i in range(ks.nd):
        vn = vn + jn[i] * v[i]
        vt1 = vt1 + jt1[i] * v[i]
        vt2 = vt2 + jt2[i] * v[i]
    kp = k * pen
    r_scale = F(2.0 * (1.0 + ks.mu * ks.mu) * invw)
    rinv = (d / (1.0 - d)) / r_scale * zmult
    rinv = jnp.where(active, rinv, jnp.zeros_like(rinv))
    for sgn, jt, vt in ((-1.0, jt1, vt1), (1.0, jt1, vt1),
                        (-1.0, jt2, vt2), (1.0, jt2, vt2)):
        s = F(sgn)
        J = tuple(jn[i] + s * mu * jt[i] for i in range(ks.nd))
        aref = -b * (vn + s * mu * vt) + kp
        rows.append(_Row(J=J, aref=aref, rinv=rinv))


def _add_limit_row(ks, rows, dof, sgn, pen, v, invw):
    """Single frictionless unilateral row (a joint limit) — lane form of
    :func:`physics.point_world._rows1`: solimp (0.9, 0.95, 0.001), the
    world's clamped tc, R = (1−d)/d · invweight of the dof."""
    dmin, dmax, width = 0.9, 0.95, 0.001
    d = _imp(pen, dmin, dmax, width)
    k = d / F(dmax * dmax * ks.tc * ks.tc * ks.zeta * ks.zeta)
    b = F(2.0 / (dmax * ks.tc))
    s = F(sgn)
    J = tuple((s if i == dof else F(0.0)) * jnp.ones_like(pen)
              for i in range(ks.nd))
    aref = -b * (s * v[dof]) + k * pen
    rinv = (d / (1.0 - d)) / F(invw)
    rinv = jnp.where(pen > 0.0, rinv, jnp.zeros_like(rinv))
    rows.append(_Row(J=J, aref=aref, rinv=rinv))


def _jac3(d3, px, py, ox, oy):
    """(3,) jacobian of direction d3 at (px,py) for a slide-slide-hinge
    body whose hinge passes through (ox,oy)."""
    rx, ry = px - ox, py - oy
    return (d3[0], d3[1], -ry * d3[0] + rx * d3[1])


def _sphere_box_lane(cx, cy, cz, bx, by, bz, hx, hy, hz, radius):
    """Sphere at (cx,cy,cz) vs one box: (pen, nx, ny, nz, posx, posy).
    Shallow closest-point case + deep nearest-face fallback."""
    lox, hix = bx - hx, bx + hx
    loy, hiy = by - hy, by + hy
    loz, hiz = bz - hz, bz + hz
    qx = jnp.clip(cx, lox, hix)
    qy = jnp.clip(cy, loy, hiy)
    qz = jnp.clip(cz, loz, hiz)
    dx, dy, dz = cx - qx, cy - qy, cz - qz
    d2 = dx * dx + dy * dy + dz * dz
    outside = d2 > F(1e-24)
    dist = jnp.sqrt(jnp.maximum(d2, F(1e-24)))
    pen_out = F(radius) - dist
    inv = 1.0 / dist
    no = (dx * inv, dy * inv, dz * inv)
    t_out = F(radius) + (dist - F(radius)) * 0.5
    pos_out = (cx - no[0] * t_out, cy - no[1] * t_out)
    # deep: nearest of 6 faces
    d0, d1 = cx - lox, hix - cx
    d2y, d3y = cy - loy, hiy - cy
    d4, d5 = cz - loz, hiz - cz
    fdepth = jnp.minimum(jnp.minimum(jnp.minimum(d0, d1),
                                     jnp.minimum(d2y, d3y)),
                         jnp.minimum(d4, d5))
    nin_x = jnp.where(d0 == fdepth, F(-1.0),
                      jnp.where(d1 == fdepth, F(1.0), F(0.0)))
    nin_y = jnp.where((d0 == fdepth) | (d1 == fdepth), F(0.0),
                      jnp.where(d2y == fdepth, F(-1.0),
                                jnp.where(d3y == fdepth, F(1.0), F(0.0))))
    hit_xy = (d0 == fdepth) | (d1 == fdepth) | (d2y == fdepth) | (d3y == fdepth)
    nin_z = jnp.where(hit_xy, F(0.0),
                      jnp.where(d4 == fdepth, F(-1.0), F(1.0)))
    pen_in = fdepth + F(radius)
    t_in = F(radius) - pen_in * 0.5
    pos_in = (cx - nin_x * t_in, cy - nin_y * t_in)
    pen = jnp.where(outside, pen_out, pen_in)
    nx = jnp.where(outside, no[0], nin_x)
    ny = jnp.where(outside, no[1], nin_y)
    nz = jnp.where(outside, no[2], nin_z)
    posx = jnp.where(outside, pos_out[0], pos_in[0])
    posy = jnp.where(outside, pos_out[1], pos_in[1])
    return pen, nx, ny, nz, posx, posy


# ---------------------------------------------------------------------------
# row assembly
# ---------------------------------------------------------------------------

def _ball_rows(ks: ObjectLanesSpec, rows, bi: BallL, rq, rv, q, v, centers):
    """All contact rows of one ball (vs walls, floor, robot, arrow, balls)."""
    zeros = tuple(jnp.zeros_like(q[0]) for _ in range(ks.nd))
    o = bi.dof
    cx, cy = centers[id(bi)]
    r_b = bi.r
    invw_b = 2.0 / (3.0 * bi.mass)

    def ball_jac(d3, px, py):
        j = list(zeros)
        jj = _jac3(d3, px, py, cx, cy)
        j[o], j[o + 1], j[o + 2] = jj[0], jj[1], jj[2]
        return tuple(j)

    # --- vs wall boxes ----------------------------------------------------
    for w in range(ks.wb_c.shape[0]):
        pen, nx, ny, nz, px, py = _sphere_box_lane(
            cx, cy, F(r_b), ks.wb_c[w, 0], ks.wb_c[w, 1], ks.wb_c[w, 2],
            ks.wb_h[w, 0], ks.wb_h[w, 1], ks.wb_h[w, 2], r_b)
        n3, t1, t2 = _make_frame_lane(nx, ny, nz)
        zero = jnp.zeros_like(pen)
        _add_contact(ks, rows,
                     ball_jac(n3, px, py), ball_jac(t1, px, py),
                     ball_jac(t2, px, py), zero, zero, zero,
                     v, pen, pen > 0.0, jnp.ones_like(pen),
                     ks.dmin, ks.dmax, ks.width, invw_b)

    # --- floor friction (always active on the production path) ------------
    one = jnp.ones_like(q[0])
    fpen = F(FLOOR_PEN) * one
    fn3 = (jnp.zeros_like(one), jnp.zeros_like(one), one)
    ft1 = (jnp.zeros_like(one), one, jnp.zeros_like(one))
    ft2 = (-one, jnp.zeros_like(one), jnp.zeros_like(one))
    zero = jnp.zeros_like(one)
    _add_contact(ks, rows,
                 ball_jac(fn3, cx, cy), ball_jac(ft1, cx, cy),
                 ball_jac(ft2, cx, cy), zero, zero, zero,
                 v, fpen, one > 0.0, one,
                 ks.f_dmin, ks.f_dmax, ks.f_width, invw_b)

    # --- robot body sphere vs ball (3D tilted normal) ----------------------
    x, y, th = rq
    vx, vy, vth = rv
    dxr = cx - x
    dyr = cy - y
    dzr = F(r_b - ks.sphere_z) * one
    dist3 = jnp.sqrt(dxr * dxr + dyr * dyr + dzr * dzr + F(1e-30))
    inv3 = 1.0 / dist3
    nx, ny, nz = dxr * inv3, dyr * inv3, dzr * inv3
    pen_rb = F(ks.sphere_r + r_b) - dist3
    t_mid = F(ks.sphere_r) + (dist3 - F(ks.sphere_r + r_b)) * 0.5
    posx = x + nx * t_mid
    posy = y + ny * t_mid
    n3, t1, t2 = _make_frame_lane(nx, ny, nz)

    def rob_dot(d3):
        # J_robot·v_robot of direction d3 at (posx,posy), hinge at (x,y);
        # the row is (ball − robot), so the robot contributes NEGATIVELY
        jx, jy, jr = _jac3(d3, posx, posy, x, y)
        return -(jx * vx + jy * vy + jr * vth)

    _add_contact(ks, rows,
                 ball_jac(n3, posx, posy), ball_jac(t1, posx, posy),
                 ball_jac(t2, posx, posy),
                 rob_dot(n3), rob_dot(t1), rob_dot(t2),
                 v, pen_rb, pen_rb > 0.0, one,
                 BB_DMIN, BB_DMAX, BB_WIDTH, ks.invw_r + invw_b)

    # --- arrow box vs ball (sphere vs rotated box, solved in arrow frame) --
    ct, st = jnp.cos(th), jnp.sin(th)
    acx = x + ct * F(ks.arrow_off)
    acy = y + st * F(ks.arrow_off)
    relx, rely = cx - acx, cy - acy
    bxa = relx * ct + rely * st
    bya = -relx * st + rely * ct
    bza = F(r_b - 0.5 * (ks.arrow_z_lo + ks.arrow_z_hi)) * one
    hx, hy = F(ks.arrow_half_l), F(ks.arrow_half_w)
    hz = F(0.5 * (ks.arrow_z_hi - ks.arrow_z_lo))
    cxa = jnp.clip(bxa, -hx, hx)
    cya = jnp.clip(bya, -hy, hy)
    cza = jnp.clip(bza, -hz, hz)
    ddx, ddy, ddz = bxa - cxa, bya - cya, bza - cza
    dl = jnp.sqrt(jnp.maximum(ddx * ddx + ddy * ddy + ddz * ddz, F(1e-30)))
    pen_ab = F(r_b) - dl
    nfx, nfy, nfz = ddx / dl, ddy / dl, ddz / dl
    nwx = nfx * ct - nfy * st
    nwy = nfx * st + nfy * ct
    nwz = nfz
    t_ab = F(r_b) + (dl - F(r_b)) * 0.5
    pax = cx - nwx * t_ab
    pay = cy - nwy * t_ab
    an3, at1, at2 = _make_frame_lane(nwx, nwy, nwz)

    def rob_dot_a(d3):
        jx, jy, jr = _jac3(d3, pax, pay, x, y)
        return -(jx * vx + jy * vy + jr * vth)

    _add_contact(ks, rows,
                 ball_jac(an3, pax, pay), ball_jac(at1, pax, pay),
                 ball_jac(at2, pax, pay),
                 rob_dot_a(an3), rob_dot_a(at1), rob_dot_a(at2),
                 v, pen_ab, pen_ab > 0.0, one,
                 BB_DMIN, BB_DMAX, BB_WIDTH, ks.invw_r + invw_b)

    # --- vs earlier balls ---------------------------------------------------
    for bj in ks.balls:
        if bj.dof >= bi.dof:
            continue
        o2 = bj.dof
        c2x, c2y = centers[id(bj)]
        d3bx = cx - c2x
        d3by = cy - c2y
        d3bz = F(r_b - bj.r) * one
        distb = jnp.sqrt(d3bx * d3bx + d3by * d3by + d3bz * d3bz + F(1e-30))
        invb = 1.0 / distb
        nbx, nby, nbz = d3bx * invb, d3by * invb, d3bz * invb
        pen_bb = F(r_b + bj.r) - distb
        tb = F(bj.r) + (distb - F(bj.r + r_b)) * 0.5
        pbx = c2x + nbx * tb
        pby = c2y + nby * tb
        bn, bt1, bt2 = _make_frame_lane(nbx, nby, nbz)

        def pair_jac(d3):
            j = list(zeros)
            ji = _jac3(d3, pbx, pby, cx, cy)
            jjj = _jac3(d3, pbx, pby, c2x, c2y)
            j[o], j[o + 1], j[o + 2] = ji[0], ji[1], ji[2]
            j[o2] = j[o2] - jjj[0]
            j[o2 + 1] = j[o2 + 1] - jjj[1]
            j[o2 + 2] = j[o2 + 2] - jjj[2]
            return tuple(j)

        zero = jnp.zeros_like(one)
        _add_contact(ks, rows,
                     pair_jac(bn), pair_jac(bt1), pair_jac(bt2),
                     zero, zero, zero,
                     v, pen_bb, pen_bb > 0.0, one,
                     BB_DMIN, BB_DMAX, BB_WIDTH,
                     invw_b + 2.0 / (3.0 * bj.mass))


def _block_jac(ks, bk: BlockL, d3x, d3y, d3z=None):
    j = [jnp.zeros_like(d3x) if hasattr(d3x, "shape") else F(0.0)
         for _ in range(ks.nd)]
    zeros = tuple(j)
    j = list(zeros)
    if bk.dof_x >= 0:
        j[bk.dof_x] = d3x
    if bk.dof_y >= 0:
        j[bk.dof_y] = d3y
    if bk.dof_z >= 0 and d3z is not None:
        j[bk.dof_z] = d3z
    return tuple(j)


def _block_rows(ks: ObjectLanesSpec, rows, bk: BlockL, rq, rv, q, v, centers):
    """Rows of one block: robot sphere, arrow (box-box), walls, pairs,
    balls."""
    one = jnp.ones_like(q[0]) if ks.nd else None
    x, y, th = rq
    vx, vy, vth = rv
    cx, cy, cz = centers[id(bk)]
    hx, hy, hz = F(bk.half[0]), F(bk.half[1]), F(bk.half[2])
    invw_k = 1.0 / bk.mass
    zero = jnp.zeros_like(q[0])

    def bjac(d3):
        return _block_jac(ks, bk, -d3[0] * jnp.ones_like(zero),
                          -d3[1] * jnp.ones_like(zero),
                          -d3[2] * jnp.ones_like(zero))

    # --- robot body sphere vs block (row = robot − block) ------------------
    pen, nx, ny, nz, px, py = _sphere_box_lane(
        x, y, F(ks.sphere_z) * jnp.ones_like(zero),
        cx, cy, cz, hx, hy, hz, ks.sphere_r)
    n3, t1, t2 = _make_frame_lane(nx, ny, nz)

    def rob_dot(d3):
        jx, jy, jr = _jac3(d3, px, py, x, y)
        return jx * vx + jy * vy + jr * vth

    _add_contact(ks, rows, bjac(n3), bjac(t1), bjac(t2),
                 rob_dot(n3), rob_dot(t1), rob_dot(t2),
                 v, pen, pen > 0.0, jnp.ones_like(pen),
                 ks.dmin, ks.dmax, ks.width, ks.invw_r + invw_k)

    # --- arrow box vs block (box-box SAT + incident-edge clip) ------------
    _arrow_block_rows(ks, rows, bk, rq, rv, q, v, cx, cy, cz)

    # --- block vs walls (parallel-face AABB; statically pruned) -----------
    for w in bk.wall_idx:
        _aabb_wall_rows(ks, rows, bk, q, v, cx, cy, cz,
                        F(ks.wb_c[w, 0]), F(ks.wb_c[w, 1]), F(ks.wb_c[w, 2]),
                        F(ks.wb_h[w, 0]), F(ks.wb_h[w, 1]), F(ks.wb_h[w, 2]))

    # --- vs earlier blocks (parallel-face AABB, two-sided jacobian) --------
    for bp in ks.blocks:
        if bp is bk:
            break  # only blocks listed before bk
        c2x, c2y, c2z = centers[id(bp)]
        _aabb_pair_rows(ks, rows, bk, bp, q, v, cx, cy, cz, c2x, c2y, c2z)

    # --- balls vs block (sphere-box; row = ball − block) -------------------
    for bl in ks.balls:
        o = bl.dof
        bcx, bcy = centers[id(bl)]
        pen, nx, ny, nz, px, py = _sphere_box_lane(
            bcx, bcy, F(bl.r) * jnp.ones_like(zero),
            cx, cy, cz, hx, hy, hz, bl.r)
        n3, t1, t2 = _make_frame_lane(nx, ny, nz)

        def mixed_jac(d3):
            j = list(bjac(d3))
            ji = _jac3(d3, px, py, bcx, bcy)
            j[o] = j[o] + ji[0]
            j[o + 1] = j[o + 1] + ji[1]
            j[o + 2] = j[o + 2] + ji[2]
            return tuple(j)

        _add_contact(ks, rows, mixed_jac(n3), mixed_jac(t1), mixed_jac(t2),
                     zero, zero, zero,
                     v, pen, pen > 0.0, jnp.ones_like(pen),
                     ks.dmin, ks.dmax, ks.width,
                     2.0 / (3.0 * bl.mass) + invw_k)

    # --- falling blocks: global-floor contact + soft joint limits ---------
    # (point_world.object_forward parity — resolved INSIDE the Newton
    # solve so the platform-perch force equilibrium matches MuJoCo's)
    if bk.dof_z >= 0:
        pen_f = -(cz - hz)  # box bottom vs the z=0 floor plane
        fn3, ft1, ft2 = _make_frame_lane(zero, zero, one)
        jfn = _block_jac(ks, bk, fn3[0], fn3[1], fn3[2])
        jft1 = _block_jac(ks, bk, ft1[0], ft1[1], ft1[2])
        jft2 = _block_jac(ks, bk, ft2[0], ft2[1], ft2[2])
        _add_contact(ks, rows, jfn, jft1, jft2, zero, zero, zero,
                     v, pen_f, pen_f > 0.0, one,
                     BLW_DMIN, BLW_DMAX, BLW_WIDTH, invw_k)
    if bk.lim is not None:
        lim_margin = F(0.01)  # reference slide joints, maze_env.py:615-648
        for dof, lim_ax in zip((bk.dof_x, bk.dof_y, bk.dof_z), bk.lim):
            if dof < 0 or lim_ax is None:
                continue
            lo, hi = lim_ax
            for sgn, pen_l in ((1.0, (F(lo) + lim_margin) - q[dof]),
                               (-1.0, q[dof] - (F(hi) - lim_margin))):
                _add_limit_row(ks, rows, dof, sgn, pen_l, v, invw_k)


def _aabb_face_contacts(cx, cy, cz, hx, hy, hz, wx, wy, wz, whx, why, whz):
    """Parallel-face AABB-vs-AABB (point_world._aabb_vs_boxes, lane form).
    Returns (active, nx, ny, pen, (p1x,p1y), (p2x,p2y)) — two contact
    points at the tangential intersection endpoints, zmult 2 each."""
    dx_ = cx - wx
    dy_ = cy - wy
    ox = whx + hx - jnp.abs(dx_)
    oy = why + hy - jnp.abs(dy_)
    oz = F(whz + hz) - jnp.abs(cz - wz)
    use_x = ox <= oy
    pen = jnp.where(use_x, ox, oy)
    sx = jnp.where(dx_ == 0.0, F(1.0), jnp.sign(dx_))
    sy = jnp.where(dy_ == 0.0, F(1.0), jnp.sign(dy_))
    sgn = jnp.where(use_x, sx, sy)
    nx = jnp.where(use_x, sgn, F(0.0) * sgn)
    ny = jnp.where(use_x, F(0.0) * sgn, sgn)
    half_n = jnp.where(use_x, hx, hy)
    ctr_n = jnp.where(use_x, cx, cy)
    face_blk = ctr_n * sgn - half_n
    pos_n = (face_blk + pen * 0.5) * sgn
    half_t = jnp.where(use_x, hy, hx)
    ctr_t = jnp.where(use_x, cy, cx)
    w_t = jnp.where(use_x, why, whx)
    wc_t = jnp.where(use_x, wy, wx)
    t_lo = jnp.maximum(ctr_t - half_t, wc_t - w_t)
    t_hi = jnp.minimum(ctr_t + half_t, wc_t + w_t)
    p1x = jnp.where(use_x, pos_n, t_lo)
    p1y = jnp.where(use_x, t_lo, pos_n)
    p2x = jnp.where(use_x, pos_n, t_hi)
    p2y = jnp.where(use_x, t_hi, pos_n)
    active = (pen > 0.0) & (oz > 0.0) & (t_hi > t_lo)
    return active, nx, ny, pen, (p1x, p1y), (p2x, p2y)


def _aabb_wall_rows(ks, rows, bk: BlockL, q, v, cx, cy, cz,
                    wx, wy, wz, whx, why, whz):
    one = jnp.ones_like(q[0])
    active, nx, ny, pen, p1, p2 = _aabb_face_contacts(
        cx, cy, cz * one, F(bk.half[0]), F(bk.half[1]), F(bk.half[2]),
        wx * one, wy * one, wz, whx, why, whz)
    zero = jnp.zeros_like(one)
    invw_k = 1.0 / bk.mass
    if bk.dof_z >= 0:
        # 3-axis SAT (point_world._aabb_vs_boxes_z3): where the z overlap
        # is the SAT minimum — a falling block perched on / popping out of
        # its platform box — the xy rows yield to a ±z parallel-face row
        # with multiplicity 4 (MuJoCo's face-rectangle corners)
        hx, hy, hz = F(bk.half[0]), F(bk.half[1]), F(bk.half[2])
        ox = F(whx) + hx - jnp.abs(cx - wx)
        oy = F(why) + hy - jnp.abs(cy - wy)
        dz_ = cz - F(wz)
        oz = F(whz) + hz - jnp.abs(dz_)
        overlap = (ox > 0.0) & (oy > 0.0) & (oz > 0.0)
        z_wins = (oz <= ox) & (oz <= oy)
        active = active & ~z_wins
        sz = jnp.where(dz_ == 0.0, F(1.0), jnp.sign(dz_))
        zn3, zt1, zt2 = _make_frame_lane(zero, zero, sz)
        zjn = _block_jac(ks, bk, zn3[0], zn3[1], zn3[2])
        zjt1 = _block_jac(ks, bk, zt1[0], zt1[1], zt1[2])
        zjt2 = _block_jac(ks, bk, zt2[0], zt2[1], zt2[2])
        _add_contact(ks, rows, zjn, zjt1, zjt2, zero, zero, zero,
                     v, oz, overlap & z_wins, 4.0 * one,
                     BLW_DMIN, BLW_DMAX, BLW_WIDTH, invw_k)
    n3, t1, t2 = _make_frame_lane(nx, ny, jnp.zeros_like(nx))
    for _p in (p1, p2):
        jn = _block_jac(ks, bk, n3[0], n3[1], n3[2])
        jt1 = _block_jac(ks, bk, t1[0], t1[1], t1[2])
        jt2 = _block_jac(ks, bk, t2[0], t2[1], t2[2])
        _add_contact(ks, rows, jn, jt1, jt2, zero, zero, zero,
                     v, pen, active, 2.0 * one,
                     BLW_DMIN, BLW_DMAX, BLW_WIDTH, invw_k)


def _aabb_pair_rows(ks, rows, bk: BlockL, bp: BlockL, q, v,
                    cx, cy, cz, c2x, c2y, c2z):
    one = jnp.ones_like(q[0])
    active, nx, ny, pen, p1, p2 = _aabb_face_contacts(
        cx, cy, cz * one,
        F(bk.half[0]), F(bk.half[1]), F(bk.half[2]),
        c2x, c2y, c2z,
        F(bp.half[0]), F(bp.half[1]), F(bp.half[2]))
    n3, t1, t2 = _make_frame_lane(nx, ny, jnp.zeros_like(nx))
    zero = jnp.zeros_like(one)
    for _p in (p1, p2):
        def pj(d3):
            j = list(_block_jac(ks, bk, d3[0], d3[1], d3[2]))
            if bp.dof_x >= 0:
                j[bp.dof_x] = j[bp.dof_x] - d3[0]
            if bp.dof_y >= 0:
                j[bp.dof_y] = j[bp.dof_y] - d3[1]
            if bp.dof_z >= 0:
                j[bp.dof_z] = j[bp.dof_z] - d3[2]
            return tuple(j)

        _add_contact(ks, rows, pj(n3), pj(t1), pj(t2), zero, zero, zero,
                     v, pen, active, 2.0 * one,
                     BLW_DMIN, BLW_DMAX, BLW_WIDTH,
                     1.0 / bk.mass + 1.0 / bp.mass)


def _arrow_block_rows(ks, rows, bk: BlockL, rq, rv, q, v, cx, cy, cz):
    """Arrow box vs one block: 5-axis SAT + incident-edge clip
    (point_world._arrow_vs_boxes with W=1, lane form).  Includes the
    z-axis-winner case — deep interpenetration (a kinematic robot wading
    into a cornered block) makes every xy overlap exceed the static z
    overlap, and MuJoCo then emits pure-friction rows at the arrow
    footprint corners (J_n = 0: the block has no z dof)."""
    one = jnp.ones_like(q[0])
    x, y, th = rq
    vx, vy, vth = rv
    ct, st = jnp.cos(th), jnp.sin(th)
    ux, uy = ct, st
    wxv, wyv = -st, ct
    acx = x + ux * F(ks.arrow_off)
    acy = y + uy * F(ks.arrow_off)
    hl, hw = F(ks.arrow_half_l), F(ks.arrow_half_w)
    az_c = 0.5 * (ks.arrow_z_lo + ks.arrow_z_hi)
    az_h = 0.5 * (ks.arrow_z_hi - ks.arrow_z_lo)
    bhx, bhy, bhz = F(bk.half[0]), F(bk.half[1]), F(bk.half[2])
    # z overlap: dynamic for falling blocks (cz is a lane), constant else
    ov_z = F(bk.half[2] + az_h) - jnp.abs(F(az_c) - cz)
    dx_ = acx - cx
    dy_ = acy - cy
    ov_wx = bhx + hl * jnp.abs(ux) + hw * jnp.abs(wxv) - jnp.abs(dx_)
    ov_wy = bhy + hl * jnp.abs(uy) + hw * jnp.abs(wyv) - jnp.abs(dy_)
    du = dx_ * ux + dy_ * uy
    dv = dx_ * wxv + dy_ * wyv
    ov_u = hl + bhx * jnp.abs(ux) + bhy * jnp.abs(uy) - jnp.abs(du)
    ov_v = hw + bhx * jnp.abs(wxv) + bhy * jnp.abs(wyv) - jnp.abs(dv)
    overlap = ((ov_wx > 0.0) & (ov_wy > 0.0) & (ov_u > 0.0) & (ov_v > 0.0)
               & (ov_z > 0.0))
    # argmin over the 4 xy axes; z wins when every xy overlap exceeds it
    m_wx = ov_wx
    m_wy = ov_wy
    m_u = ov_u
    m_v = ov_v
    min_all = jnp.minimum(jnp.minimum(m_wx, m_wy), jnp.minimum(m_u, m_v))
    z_wins = ov_z < min_all
    is_wx = m_wx == min_all
    is_wy = (~is_wx) & (m_wy == min_all)
    is_u = (~is_wx) & (~is_wy) & (m_u == min_all)
    is_v = (~is_wx) & (~is_wy) & (~is_u)
    sgn_wx = jnp.where(dx_ == 0.0, F(1.0), jnp.sign(dx_))
    sgn_wy = jnp.where(dy_ == 0.0, F(1.0), jnp.sign(dy_))
    sgn_u = jnp.where(du == 0.0, F(1.0), jnp.sign(du))
    sgn_v = jnp.where(dv == 0.0, F(1.0), jnp.sign(dv))
    nx = (jnp.where(is_wx, sgn_wx, F(0.0) * one)
          + jnp.where(is_wy, F(0.0) * one, F(0.0) * one)
          + jnp.where(is_u, ux * sgn_u, F(0.0) * one)
          + jnp.where(is_v, wxv * sgn_v, F(0.0) * one))
    ny = (jnp.where(is_wy, sgn_wy, F(0.0) * one)
          + jnp.where(is_u, uy * sgn_u, F(0.0) * one)
          + jnp.where(is_v, wyv * sgn_v, F(0.0) * one))
    is_wall_axis = is_wx | is_wy

    # arrow corners (4): ac ± u*hl ± v*hw
    cxs, cys = [], []
    for su in (1.0, -1.0):
        for sv in (1.0, -1.0):
            cxs.append(acx + F(su) * ux * hl + F(sv) * wxv * hw)
            cys.append(acy + F(su) * uy * hl + F(sv) * wyv * hw)
    # order: (+,+), (+,-), (-,+), (-,-)

    # wall-axis case: arrow corner depths past the block face
    face_off = cx * nx + cy * ny + bhx * jnp.abs(nx) + bhy * jnp.abs(ny)
    corner_pen = [face_off - (cxs[i] * nx + cys[i] * ny) for i in range(4)]
    # arrow-axis case: block corners past the arrow face
    wcx = [cx + F(sx) * bhx for sx in (1.0, 1.0, -1.0, -1.0)]
    wcy = [cy + F(sy) * bhy for sy in (1.0, -1.0, 1.0, -1.0)]
    half_along = hl * jnp.abs(nx * ux + ny * uy) + hw * jnp.abs(
        nx * wxv + ny * wyv)
    a_face_off = acx * nx + acy * ny - half_along
    wall_pen = [(wcx[i] * nx + wcy[i] * ny) - a_face_off for i in range(4)]

    pens = [jnp.where(is_wall_axis, corner_pen[i], wall_pen[i])
            for i in range(4)]
    ptx = [jnp.where(is_wall_axis, cxs[i], wcx[i]) for i in range(4)]
    pty = [jnp.where(is_wall_axis, cys[i], wcy[i]) for i in range(4)]

    # incident-edge corner pair selection (two corner indices of 4)
    cu = nx * ux + ny * uy
    cv = nx * wxv + ny * wyv
    su_i = -jnp.where(cu == 0.0, F(1.0), jnp.sign(cu))
    sv_i = -jnp.where(cv == 0.0, F(1.0), jnp.sign(cv))
    use_u = jnp.abs(cu) >= jnp.abs(cv)
    # wall-axis: su fixed -> {0,1} or {2,3}; sv fixed -> {0,2} or {1,3}
    sel_wall_a = jnp.where(use_u, jnp.where(su_i > 0, 0.0, 2.0),
                           jnp.where(sv_i > 0, 0.0, 1.0))
    sel_wall_b = jnp.where(use_u, jnp.where(su_i > 0, 1.0, 3.0),
                           jnp.where(sv_i > 0, 2.0, 3.0))
    # arrow-axis: block corners, rows [(+,+),(+,-),(-,+),(-,-)] over (x,y)
    sxn = jnp.where(nx == 0.0, F(1.0), jnp.sign(nx))
    syn = jnp.where(ny == 0.0, F(1.0), jnp.sign(ny))
    use_x = jnp.abs(nx) >= jnp.abs(ny)
    sel_arr_a = jnp.where(use_x, jnp.where(sxn > 0, 0.0, 2.0),
                          jnp.where(syn > 0, 0.0, 1.0))
    sel_arr_b = jnp.where(use_x, jnp.where(sxn > 0, 1.0, 3.0),
                          jnp.where(syn > 0, 2.0, 3.0))
    sel_a = jnp.where(is_wall_axis, sel_wall_a, sel_arr_a)
    sel_b = jnp.where(is_wall_axis, sel_wall_b, sel_arr_b)

    def pick(vals, sel):
        out = jnp.zeros_like(vals[0])
        for i in range(4):
            out = jnp.where(sel == F(float(i)), vals[i], out)
        return out

    pen_a, pen_b = pick(pens, sel_a), pick(pens, sel_b)
    pax_, pay_ = pick(ptx, sel_a), pick(pty, sel_a)
    pbx_, pby_ = pick(ptx, sel_b), pick(pty, sel_b)

    # tangential clip against the reference face extents
    tx, ty = -ny, nx
    ref_cx = jnp.where(is_wall_axis, cx * one, acx)
    ref_cy = jnp.where(is_wall_axis, cy * one, acy)
    ref_ht = jnp.where(
        is_wall_axis,
        bhx * jnp.abs(tx) + bhy * jnp.abs(ty),
        hl * jnp.abs(tx * ux + ty * uy) + hw * jnp.abs(tx * wxv + ty * wyv))
    s_a = (pax_ - ref_cx) * tx + (pay_ - ref_cy) * ty
    s_b = (pbx_ - ref_cx) * tx + (pby_ - ref_cy) * ty
    s_a_cl = jnp.clip(s_a, -ref_ht, ref_ht)
    s_b_cl = jnp.clip(s_b, -ref_ht, ref_ht)
    edge_s = (pbx_ - pax_) * tx + (pby_ - pay_) * ty
    slope = jnp.where(jnp.abs(edge_s) > F(1e-9),
                      (pen_b - pen_a) / edge_s, F(0.0) * one)
    pen_a_cl = pen_a + (s_a_cl - s_a) * slope
    pen_b_cl = pen_b + (s_b_cl - s_b) * slope
    pax_cl = pax_ + (s_a_cl - s_a) * tx
    pay_cl = pay_ + (s_a_cl - s_a) * ty
    pbx_cl = pbx_ + (s_b_cl - s_b) * tx
    pby_cl = pby_ + (s_b_cl - s_b) * ty
    # contact position: midpoint along n (sign flips by reference side)
    pos_sgn = jnp.where(is_wall_axis, F(0.5), F(-0.5))
    pax_f = pax_cl + nx * pen_a_cl * pos_sgn
    pay_f = pay_cl + ny * pen_a_cl * pos_sgn
    pbx_f = pbx_cl + nx * pen_b_cl * pos_sgn
    pby_f = pby_cl + ny * pen_b_cl * pos_sgn

    # point-keep rules (point_world._arrow_vs_boxes, probed)
    was_cl_a = jnp.abs(s_a_cl - s_a) > F(1e-12)
    was_cl_b = jnp.abs(s_b_cl - s_b) > F(1e-12)
    h_ref = jnp.where(is_wall_axis, bhx * jnp.abs(nx) + bhy * jnp.abs(ny),
                      half_along)
    c1 = F(0.02) * h_ref
    c2 = c1 / F(1.01)
    depmax = jnp.maximum(jnp.where(pen_a_cl > 0, pen_a_cl, -jnp.inf),
                         jnp.where(pen_b_cl > 0, pen_b_cl, -jnp.inf))
    thresh = jnp.where(depmax <= c1, F(0.0) * one, c2)
    # boolean select written as logic ops — jnp.where on bool operands
    # lowers to an i8->i1 trunci Mosaic rejects
    clip_a = (pen_a_cl > 0.0) & ((depmax - pen_a_cl) <= 2.0 * h_ref)
    clip_b = (pen_b_cl > 0.0) & ((depmax - pen_b_cl) <= 2.0 * h_ref)
    keep_a = (was_cl_a & clip_a) | ((~was_cl_a) & (pen_a_cl > thresh))
    keep_b = (was_cl_b & clip_b) | ((~was_cl_b) & (pen_b_cl > thresh))

    n3, t1, t2 = _make_frame_lane(nx, ny, jnp.zeros_like(nx))
    x_, y_ = rq[0], rq[1]
    vx, vy, vth = rv
    invw_k = 1.0 / bk.mass
    for pen_c, keep, px_c, py_c in ((pen_a_cl, keep_a, pax_f, pay_f),
                                    (pen_b_cl, keep_b, pbx_f, pby_f)):
        def rob_dot(d3, px_c=px_c, py_c=py_c):
            jx, jy, jr = _jac3(d3, px_c, py_c, x_, y_)
            return jx * vx + jy * vy + jr * vth

        # row = robot − block
        jn = _block_jac(ks, bk, -n3[0] * one, -n3[1] * one, -n3[2] * one)
        jt1 = _block_jac(ks, bk, -t1[0], -t1[1], -t1[2])
        jt2 = _block_jac(ks, bk, -t2[0], -t2[1], -t2[2])
        _add_contact(ks, rows, jn, jt1, jt2,
                     rob_dot(n3), rob_dot(t1), rob_dot(t2),
                     v, pen_c, overlap & keep & (~z_wins), 2.0 * one,
                     ks.dmin, ks.dmax, ks.width, ks.invw_r + invw_k)

    # z-winner rows at the arrow footprint corners inside the block
    # footprint.  For xy-only blocks J_n = 0 (no z dof) and the pyramid's
    # ±mu*t edges carry the whole interaction; a falling block's z dof
    # picks up the normal row too (the arrow can press it down/up).
    nz_sgn = jnp.where(F(az_c) <= cz, F(-1.0), F(1.0)) * one
    zn3 = (jnp.zeros_like(one), jnp.zeros_like(one), nz_sgn)
    zt1 = (jnp.zeros_like(one), one, jnp.zeros_like(one))
    zt2 = (-nz_sgn, jnp.zeros_like(one), jnp.zeros_like(one))
    zjn = _block_jac(ks, bk, -zn3[0], -zn3[1], -zn3[2])
    zjt1 = _block_jac(ks, bk, -zt1[0], -zt1[1], -zt1[2])
    zjt2 = _block_jac(ks, bk, -zt2[0], -zt2[1], -zt2[2])
    zpen = ov_z * one
    for ci in range(4):
        in_foot = ((jnp.abs(cxs[ci] - cx) <= bhx)
                   & (jnp.abs(cys[ci] - cy) <= bhy))

        def rob_dot_z(d3, ci=ci):
            jx, jy, jr = _jac3(d3, cxs[ci], cys[ci], x_, y_)
            return jx * vx + jy * vy + jr * vth

        _add_contact(ks, rows, zjn, zjt1, zjt2,
                     rob_dot_z(zn3), rob_dot_z(zt1), rob_dot_z(zt2),
                     v, zpen, overlap & z_wins & in_foot, one,
                     ks.dmin, ks.dmax, ks.width, ks.invw_r + invw_k)


# ---------------------------------------------------------------------------
# Newton solve (unrolled Cholesky, nd <= 6)
# ---------------------------------------------------------------------------

def _chol_solve(H, g, nd):
    """x = H^{-1} g for SPD H given as tuple-of-tuples of lane scalars."""
    L = [[None] * nd for _ in range(nd)]
    for j in range(nd):
        s = H[j][j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        L[j][j] = jnp.sqrt(jnp.maximum(s, F(1e-30)))
        inv = 1.0 / L[j][j]
        for i in range(j + 1, nd):
            s = H[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv
    # forward substitution L y = g
    y = [None] * nd
    for i in range(nd):
        s = g[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    # back substitution L^T x = y
    x = [None] * nd
    for i in reversed(range(nd)):
        s = y[i]
        for k in range(i + 1, nd):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return tuple(x)


def _solve_newton_lanes(ks: ObjectLanesSpec, rows, v0, a0=None):
    """Primal Newton over STACKED rows: the R pyramid rows live as
    ``(R,)`` (scalar/XLA path) or ``(R, TB)`` (lane/Pallas path) arrays so
    each Newton/line-search step is a handful of traced ops regardless of
    the world's row count — the per-row unrolled form traced ~400K ops
    for a Billiard world and took minutes to compile.

    ``a0``: unconstrained acceleration (gravity on falling-block z dofs);
    the smooth cost term becomes (x−a0)ᵀM(x−a0)/2."""
    nd = ks.nd
    M = ks.masses
    if a0 is None:
        a0 = (0.0,) * nd
    x = tuple(jnp.zeros_like(v0[0]) for _ in range(nd))
    # stack: (R, ...) leading row axis over the lane shape
    Jm = [jnp.stack([r.J[i] for r in rows]) for i in range(nd)]
    aref = jnp.stack([r.aref for r in rows])
    rinv = jnp.stack([r.rinv for r in rows])
    zero_r = jnp.zeros_like(aref)

    def jdot(vec):
        s = Jm[0] * vec[0]
        for i in range(1, nd):
            s = s + Jm[i] * vec[i]
        return s  # (R, ...)

    for _ in range(ks.newton_iters):
        jar0 = jdot(x) - aref
        w = jnp.where(jar0 < 0.0, rinv, zero_r)
        wj = w * jar0
        grad = [F(M[i]) * (x[i] - F(a0[i])) + jnp.sum(Jm[i] * wj, axis=0)
                for i in range(nd)]
        H = [[None] * nd for _ in range(nd)]
        for i in range(nd):
            jw = Jm[i] * w
            for j in range(i, nd):
                Hij = jnp.sum(jw * Jm[j], axis=0)
                H[i][j] = Hij + F(M[i]) if i == j else Hij
        for i in range(nd):
            for j in range(i):
                H[i][j] = H[j][i]
        p = _chol_solve(H, grad, nd)
        p = tuple(-pi for pi in p)
        # bisection line search on the monotone derivative; per-row dot
        # products hoisted so each evaluation is O(1) stacked ops
        jp = jdot(p)
        pMx = jnp.zeros_like(x[0])
        pMp = jnp.zeros_like(x[0])
        for i in range(nd):
            pMx = pMx + p[i] * F(M[i]) * (x[i] - F(a0[i]))
            pMp = pMp + p[i] * F(M[i]) * p[i]

        def phi_prime(t):
            jart = jar0 + t * jp
            wt = jnp.where(jart < 0.0, rinv, zero_r)
            return pMx + t * pMp + jnp.sum(jp * (wt * jart), axis=0)

        lo = jnp.zeros_like(x[0])
        hi = jnp.full_like(x[0], F(2.0))
        hi = jnp.where(phi_prime(hi) < 0.0, jnp.full_like(hi, F(4.0)), hi)
        for _ in range(ks.ls_iters):
            mid = 0.5 * (lo + hi)
            dneg = phi_prime(mid) < 0.0
            lo = jnp.where(dneg, mid, lo)
            hi = jnp.where(dneg, hi, mid)
        t = 0.5 * (lo + hi)
        x = tuple(x[i] + t * p[i] for i in range(nd))
    return x


def object_forward_lanes(ks: ObjectLanesSpec, rq, rv, q, v):
    """(nd,) object qacc; rq/rv = robot (x, y, th) pose/velocity lanes."""
    rows: List[_Row] = []
    centers = {}
    for bl in ks.balls:
        centers[id(bl)] = (F(bl.body_pos[0]) + q[bl.dof],
                           F(bl.body_pos[1]) + q[bl.dof + 1])
    for bk in ks.blocks:
        cxs = F(bk.body_pos[0])
        cys = F(bk.body_pos[1])
        czs = F(bk.body_pos[2])
        cx = cxs + (q[bk.dof_x] if bk.dof_x >= 0 else jnp.zeros_like(q[0]))
        cy = cys + (q[bk.dof_y] if bk.dof_y >= 0 else jnp.zeros_like(q[0]))
        cz = czs + (q[bk.dof_z] if bk.dof_z >= 0 else jnp.zeros_like(q[0]))
        centers[id(bk)] = (cx, cy, cz)
    for bl in ks.balls:
        _ball_rows(ks, rows, bl, rq, rv, q, v, centers)
    for bk in ks.blocks:
        _block_rows(ks, rows, bk, rq, rv, q, v, centers)
    a0 = [0.0] * ks.nd
    for bk in ks.blocks:
        if bk.dof_z >= 0:
            a0[bk.dof_z] = -9.81  # gravity projects only onto z slides
    return _solve_newton_lanes(ks, rows, v, a0=tuple(a0))


def object_step_lanes(ks: ObjectLanesSpec, rq, rv, q, v):
    """One RK4 env step of the object dofs (robot kinematic through the
    stages — the aliasing-free swept-contact sampling)."""
    h = F(ks.dt)
    A = (0.5, 0.5, 1.0)
    Bw = (1.0 / 6.0, 1.0 / 3.0, 1.0 / 3.0, 1.0 / 6.0)
    nd = ks.nd
    vs = [v]
    accs = [object_forward_lanes(ks, rq, rv, q, v)]
    for a in A:
        a = F(a)
        qi = tuple(q[i] + a * h * vs[-1][i] for i in range(nd))
        vi = tuple(v[i] + a * h * accs[-1][i] for i in range(nd))
        rqi = (rq[0] + a * h * rv[0], rq[1] + a * h * rv[1],
               rq[2] + a * h * rv[2])
        vs.append(vi)
        accs.append(object_forward_lanes(ks, rqi, rv, qi, vi))
    qf = tuple(
        q[i] + h * sum(F(b) * vi[i] for b, vi in zip(Bw, vs[:4]))
        for i in range(nd))
    vf = tuple(
        v[i] + h * sum(F(b) * ai[i] for b, ai in zip(Bw, accs))
        for i in range(nd))
    return qf, vf
