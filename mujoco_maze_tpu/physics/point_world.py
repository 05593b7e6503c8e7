"""Planar point-world contact engine: an exact replica of the reference's
``mj_step`` residual for manual-collision (Point) robots.

The reference PointEnv calls ``mj_step`` once per env step on a 3-dof planar
system (slide x, slide y, hinge z — `/root/reference/mujoco_maze/point.py:58`,
`assets/point.xml`), integrated with **RK4** over smooth dynamics plus
MuJoCo's soft-constraint contact model.  Because the system is tiny, the
whole pipeline can be replicated exactly, stage by stage (validated row-level
against MuJoCo 3 with ``tools/probe_point_mj.py``):

1. **Smooth dynamics.**  ``M(th)`` has an off-diagonal slide-hinge coupling
   from the arrow box's off-axis mass (``a = m_box*0.6``); the only bias
   force is the centrifugal term ``(a w^2 cos th, a w^2 sin th, 0)``.
   Gravity is orthogonal to all three dofs; the floor carries no normal
   force (z is not a dof, the sphere rests at exactly dist = 0).

2. **Collision.**  Sphere-vs-wall-box (single contact; MuJoCo's deep case:
   when the center is inside the box the *nearest 3D face* is chosen — for
   deep crossings that face can be the box *bottom*, giving a z normal whose
   pyramid rows become pure x/y friction pairs; these are the 1e5-scale
   "ejection" forces seen in reference rollouts).  Arrow-box-vs-wall-box
   via separating axes + reference-face clipping (2 xy points, duplicated
   at the arrow's two z levels, per-point depths, midpoint contact
   positions) — matching MuJoCo's box-box contact set on the golden
   trajectories.

3. **Constraint rows.**  Pyramidal cone (model default), 4 edges per
   contact ``J_n ± mu*J_t``; per-row reference acceleration
   ``aref = -b*(J v) + k*pen`` with ``b = 2/(dmax*tc)``,
   ``k = d(pen)/(dmax^2*tc^2*zeta^2)``, ``tc = max(solref_tc, 2*dt)`` and
   ``d(pen)`` the solimp sigmoid; regularizer
   ``R = (1-d)/d * 2*(1+mu^2) * invweight0_trans`` (all validated against
   ``efc_aref`` / ``efc_R``; z-duplicated box contacts are folded into one
   row with R halved — two identical soft rows act as one of half the
   regularization).

4. **Solver.**  MuJoCo's primal Newton: minimize over qacc
   ``0.5*|x - qacc_smooth|_M^2 + sum_i [J_i x - aref_i]_-^2 / (2 R_i)``,
   a convex C^1 piecewise quadratic; a handful of 3x3 Newton steps with an
   exact piecewise-quadratic line search reproduces ``efc_force`` to
   solver tolerance.

5. **RK4.**  The standard tableau over 4 forward evaluations reproduces
   ``mj_step`` bit-for-bit in float64 on contact-free steps and to solver
   tolerance on wall-press steps.

The **floor friction switch** is replicated bit-exactly: the sphere sits at
dist exactly 0, and MuJoCo includes the floor contact iff its computed
distance rounds *below* zero.  Probing shows the entire rounding chain is
``m22 = fl(fl(cos(th/2)^2) + fl(sin(th/2)^2))`` (mju_quat2Mat's
``q0^2 - q1^2 - q2^2 + q3^2`` with q1 = q2 = 0; the hinge xquat skips
normalization because its norm rounds to 1), then ``dist = 0.5*m22 - 0.5``
which is either ``0.0`` (excluded) or ``-2^-54`` (active pure-friction
pyramid rows — J_n = 0 since z is not a dof and the lever is zero).  The
predicate matches MuJoCo 3 on 200/200 probed golden states, and XLA's
float64 cos/sin are bit-identical to libm's on those inputs
(``tools/probe_point_mj.py``), so the switch is deterministic here too.
"""

from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np
from jax import lax


class WallBoxes(NamedTuple):
    """Static wall boxes (the maze's BLOCK cells), fixed shape + mask."""

    c: jnp.ndarray     # (W, 3) centers
    h: jnp.ndarray     # (W, 3) half extents
    mask: jnp.ndarray  # (W,) 1.0 for real walls


@dataclasses.dataclass(frozen=True)
class PointWorldParams:
    """Trace-time constants, all derived from the model XML (no calibration).

    Geometry/mass constants follow assets/point.xml (density 100): sphere
    r=0.5 at z=0.5; arrow box half (0.5, 0.1, 0.1) at body offset
    (0.6, 0, 0.5).  Contact constants follow the world-builder defaults
    (maze_env.py:102-112): every pair in the Point worlds has slide
    friction mu=1; solimp is the element-wise mean of the two geoms'
    (solmix weights equal), with the whole default class hardened to
    (.995, .995, .01) when movable blocks exist.
    """

    dt: float = 0.02
    # mass model (probed equal to MuJoCo qM / body_invweight0)
    m_sphere: float = 100.0 * (4.0 / 3.0) * math.pi * 0.125
    m_box: float = 4.0
    arm: float = 4.0 * 0.6                    # a = m_box * offset
    # I about the joint origin: 2/5 m r^2 + box inertia + parallel axis
    inertia: float = (0.4 * 100.0 * (4.0 / 3.0) * math.pi * 0.125 * 0.25
                      + 4.0 * (1.0 + 0.04) / 12.0 + 4.0 * 0.36)
    sphere_r: float = 0.5
    sphere_z: float = 0.5
    arrow_off: float = 0.6
    arrow_half_l: float = 0.5
    arrow_half_w: float = 0.1
    arrow_z_lo: float = 0.4
    arrow_z_hi: float = 0.6
    mu: float = 1.0
    zeta: float = 1.0                          # solref dampratio
    tc: float = 0.04                           # max(solref_tc=0.02, 2*dt)
    # solimp of robot-vs-wall contacts: mean of (.9,.99,.001) and the wall
    # default — (.9,.95,.001) normally, (.995,.995,.01) in block worlds
    dmin: float = 0.9
    dmax: float = 0.97
    width: float = 0.001
    # floor-contact solimp mix (sphere + floor default)
    f_dmin: float = 0.9
    f_dmax: float = 0.97
    f_width: float = 0.001
    newton_iters: int = 10
    ls_iters: int = 14
    max_contacts: int = 6

    @property
    def m(self) -> float:
        return self.m_sphere + self.m_box

    @property
    def r_com(self) -> float:
        return self.arm / self.m

    @property
    def invw_t(self) -> float:
        """MuJoCo ``body_invweight0`` (translational): mean diagonal of the
        com-point translational inverse inertia at qpos0 (the z row is 0)."""
        m, a, i = self.m, self.arm, self.inertia
        det = m * i - a * a
        r = a / m
        a_yy = i / det - 2.0 * r * a / det + r * r * m / det
        return (1.0 / m + a_yy) / 3.0

    @property
    def b_wall(self) -> float:
        return 2.0 / (self.dmax * self.tc)

    @property
    def k_wall(self) -> float:
        """k / d — multiply by the row's impedance d(pen)."""
        return 1.0 / (self.dmax * self.dmax * self.tc * self.tc
                      * self.zeta * self.zeta)

    @property
    def r_scale(self) -> float:
        """R = r_scale * (1-d)/d  (pyramidal, both worlds' mu = 1)."""
        return 2.0 * (1.0 + self.mu * self.mu) * self.invw_t


def params_for_world(any_blocks: bool, dt: float = 0.02,
                     torso_z: float = 0.0) -> PointWorldParams:
    """Contact constants for a Point world (maze_env.py:108-112 hardening).

    ``torso_z``: the torso body's z offset — 0.75 + height_offset in
    elevated worlds (maze_env.py:105-107), 0 otherwise.  The robot geoms
    ride the torso, so their contact heights shift with it (a Fall-world
    point robot passes UNDER the perched falling block)."""
    kw = dict(dt=dt, sphere_z=0.5 + torso_z, arrow_z_lo=0.4 + torso_z,
              arrow_z_hi=0.6 + torso_z)
    if not any_blocks:
        return PointWorldParams(**kw)
    # default class solimp -> (.995, .995, .01); robot geoms keep (.9,.99)
    return PointWorldParams(
        dmin=(0.9 + 0.995) / 2, dmax=(0.99 + 0.995) / 2,
        width=(0.001 + 0.01) / 2,
        f_dmin=(0.9 + 0.995) / 2, f_dmax=(0.99 + 0.995) / 2,
        f_width=(0.001 + 0.01) / 2,
        **kw,
    )


def wall_boxes_from_structure(ms, dtype=jnp.float32) -> WallBoxes:
    """Static wall boxes of a maze (BLOCK cells + elevated platforms)."""
    pos = np.concatenate([np.asarray(ms.block_pos).reshape(-1, 3),
                          np.asarray(ms.platform_pos).reshape(-1, 3)], 0)
    half = np.concatenate([np.asarray(ms.block_size).reshape(-1, 3),
                           np.asarray(ms.platform_size).reshape(-1, 3)], 0)
    n = max(len(pos), 1)
    c = np.zeros((n, 3)); h = np.ones((n, 3)) * -1.0; mask = np.zeros((n,))
    if len(pos):
        c[: len(pos)] = pos
        h[: len(pos)] = half
        mask[: len(pos)] = 1.0
    return WallBoxes(c=jnp.asarray(c, dtype), h=jnp.asarray(h, dtype),
                     mask=jnp.asarray(mask, dtype))


# ---------------------------------------------------------------------------
# solimp impedance sigmoid (power 2, midpoint 0.5 — XML defaults)
# ---------------------------------------------------------------------------

def _impedance(pen, dmin, dmax, width):
    x = jnp.clip(pen / width, 0.0, 1.0)
    y = jnp.where(x < 0.5, 2.0 * x * x, 1.0 - 2.0 * (1.0 - x) * (1.0 - x))
    return dmin + y * (dmax - dmin)


# ---------------------------------------------------------------------------
# collision: candidate contact generation (fixed shapes, masked)
# ---------------------------------------------------------------------------

class _Contacts(NamedTuple):
    """Flat candidate contact arrays (per env; leading axis = candidates)."""

    pos: jnp.ndarray     # (C, 2) xy contact position (lever arms)
    n: jnp.ndarray       # (C, 2) xy of the separation normal (robot side)
    nz: jnp.ndarray      # (C,) z component of the normal (deep sphere case)
    pen: jnp.ndarray     # (C,) penetration (>0 when touching)
    active: jnp.ndarray  # (C,) bool
    zmult: jnp.ndarray   # (C,) row multiplicity (z-duplicated box contacts)
    floor: jnp.ndarray   # (C,) 1.0 for the floor contact (f_* solimp)


def _sphere_vs_boxes(p: PointWorldParams, boxes: WallBoxes, xy):
    """MuJoCo sphere-box: shallow closest-point case + deep nearest-face
    fallback (the z faces compete — probed at `tools/probe_point_mj.py`)."""
    cx, cy, cz = xy[0], xy[1], p.sphere_z
    lo = boxes.c - boxes.h
    hi = boxes.c + boxes.h
    qx = jnp.clip(cx, lo[:, 0], hi[:, 0])
    qy = jnp.clip(cy, lo[:, 1], hi[:, 1])
    qz = jnp.clip(cz, lo[:, 2], hi[:, 2])
    dx, dy, dz = cx - qx, cy - qy, cz - qz
    d2 = dx * dx + dy * dy + dz * dz
    outside = d2 > 1e-24
    dist_out = jnp.sqrt(jnp.maximum(d2, 1e-24))
    pen_out = p.sphere_r - dist_out
    n_out = jnp.stack([dx, dy, dz], -1) / dist_out[:, None]
    # contact pos = center - n*(r + dist/2), dist = dist_out - r
    t_out = p.sphere_r + (dist_out - p.sphere_r) * 0.5
    pos_out = jnp.stack([cx - n_out[:, 0] * t_out, cy - n_out[:, 1] * t_out], -1)

    # deep: nearest of the 6 faces (3D); normal points OUT of that face
    depths = jnp.stack([cx - lo[:, 0], hi[:, 0] - cx,
                        cy - lo[:, 1], hi[:, 1] - cy,
                        cz - lo[:, 2], hi[:, 2] - cz], -1)   # (W, 6)
    face = jnp.argmin(depths, -1)
    fdepth = jnp.min(depths, -1)
    face_n = jnp.asarray(
        [[-1.0, 0, 0], [1, 0, 0], [0, -1, 0], [0, 1, 0], [0, 0, -1], [0, 0, 1]],
        xy.dtype)
    n_in = face_n[face]           # push the sphere out through the NEAR face
    pen_in = fdepth + p.sphere_r
    # contact pos = center + n_into_box*(r + dist/2), dist = -(fdepth + r)
    # (probed: midpoint between sphere surface and the near face plane)
    t_in = p.sphere_r - pen_in * 0.5
    pos_in = jnp.stack([cx - n_in[:, 0] * t_in, cy - n_in[:, 1] * t_in], -1)

    pen = jnp.where(outside, pen_out, pen_in)
    n3 = jnp.where(outside[:, None], n_out, n_in)
    pos = jnp.where(outside[:, None], pos_out, pos_in)
    active = (pen > 0.0) & (boxes.mask > 0.0)
    return _Contacts(pos=pos, n=n3[:, :2], nz=n3[:, 2], pen=pen,
                     active=active, zmult=jnp.ones_like(pen),
                     floor=jnp.zeros_like(pen))


def _arrow_vs_boxes(p: PointWorldParams, boxes: WallBoxes, xy, th):
    """Arrow box (rotated about z) vs wall boxes: 5-axis SAT (wall x/y,
    arrow u/v, and z) + reference-face contact generation.

    xy-axis winner: clip the incident box's deepest edge -> 2 points with
    per-point depths and midpoint positions, duplicated at the arrow's two
    z levels (folded into zmult=2 — identical rows).  z-axis winner (deep
    ori-first presses; probed): contact points are the arrow footprint
    corners inside the wall footprint, each with the z penetration
    (halfsum - |dz|, i.e. depth to push the arrow out through the wall's
    z face, NOT the interval overlap) and a pure-friction pyramid
    (J_n = 0 since z is not a dof).
    """
    ct, st = jnp.cos(th), jnp.sin(th)
    u = jnp.stack([ct, st])              # arrow long axis
    v = jnp.stack([-st, ct])             # arrow short axis
    ac = xy + u * p.arrow_off            # arrow center
    hl, hw = p.arrow_half_l, p.arrow_half_w
    az_c = 0.5 * (p.arrow_z_lo + p.arrow_z_hi)
    az_h = 0.5 * (p.arrow_z_hi - p.arrow_z_lo)

    W = boxes.c.shape[0]
    bc = boxes.c[:, :2]
    bh = boxes.h[:, :2]
    d = ac[None, :] - bc                 # (W, 2)

    # SAT overlaps: wall x, wall y, arrow u, arrow v, z (halfsum - |dc|)
    ov_wx = bh[:, 0] + hl * jnp.abs(u[0]) + hw * jnp.abs(v[0]) - jnp.abs(d[:, 0])
    ov_wy = bh[:, 1] + hl * jnp.abs(u[1]) + hw * jnp.abs(v[1]) - jnp.abs(d[:, 1])
    du = d @ u
    dv = d @ v
    ov_u = hl + bh[:, 0] * jnp.abs(u[0]) + bh[:, 1] * jnp.abs(u[1]) - jnp.abs(du)
    ov_v = hw + bh[:, 0] * jnp.abs(v[0]) + bh[:, 1] * jnp.abs(v[1]) - jnp.abs(dv)
    ov_z = boxes.h[:, 2] + az_h - jnp.abs(az_c - boxes.c[:, 2])
    ovs = jnp.stack([ov_wx, ov_wy, ov_u, ov_v, ov_z], -1)    # (W, 5)
    overlap_all = jnp.all(ovs > 0.0, -1) & (boxes.mask > 0.0)
    axis = jnp.argmin(ovs, -1)
    z_wins = axis == 4

    # normals per xy-axis choice, oriented to push the ARROW off the wall
    sgn_wx = jnp.sign(jnp.where(d[:, 0] == 0.0, 1.0, d[:, 0]))
    sgn_wy = jnp.sign(jnp.where(d[:, 1] == 0.0, 1.0, d[:, 1]))
    sgn_u = jnp.sign(jnp.where(du == 0.0, 1.0, du))
    sgn_v = jnp.sign(jnp.where(dv == 0.0, 1.0, dv))
    ex = jnp.asarray([1.0, 0.0], xy.dtype)
    ey = jnp.asarray([0.0, 1.0], xy.dtype)
    normals = jnp.stack([
        ex[None, :] * sgn_wx[:, None],
        ey[None, :] * sgn_wy[:, None],
        u[None, :] * sgn_u[:, None],
        v[None, :] * sgn_v[:, None],
    ], 1)                                                    # (W, 4, 2)
    axy = jnp.minimum(axis, 3)
    n = jnp.take_along_axis(normals, axy[:, None, None].repeat(2, -1), 1)[:, 0]

    # wall-axis case: clip the arrow's most-penetrating edge (2 corners)
    # against the reference face's side extents.  arrow corners:
    signs = jnp.asarray([[1.0, 1], [1, -1], [-1, 1], [-1, -1]], xy.dtype)
    corners = (ac[None, :] + signs[:, :1] * u[None, :] * hl
               + signs[:, 1:] * v[None, :] * hw)             # (4, 2)
    corners = jnp.broadcast_to(corners[None], (W, 4, 2))
    # depth of each corner along -n past the reference face
    # reference face plane: wall face at offset along n
    face_off = (bc * n).sum(-1) + (bh * jnp.abs(n)).sum(-1)   # face plane c·n
    corner_s = (corners * n[:, None, :]).sum(-1)             # (W, 4)
    corner_pen = face_off[:, None] - corner_s                # >0 = inside
    # arrow-axis case: wall corners against the arrow face
    wall_corners = (bc[:, None, :]
                    + signs[None, :, :1] * (bh[:, :1] * ex[None, :])[:, None, :]
                    + signs[None, :, 1:] * (bh[:, 1:] * ey[None, :])[:, None, :]
                    )                                        # (W, 4, 2)
    # arrow reference face plane: arrow face along -n (n pushes arrow out of
    # wall, so the arrow's face toward the wall is at ac - n*half_along_n)
    half_along = hl * jnp.abs((n * u[None, :]).sum(-1)) + hw * jnp.abs(
        (n * v[None, :]).sum(-1))
    a_face_off = (ac[None, :] * n).sum(-1) - half_along      # plane a·n
    wall_pen = (wall_corners * n[:, None, :]).sum(-1) - a_face_off[:, None]

    is_wall_axis = axis < 2
    pens = jnp.where(is_wall_axis[:, None], corner_pen, wall_pen)  # (W, 4)
    pts = jnp.where(is_wall_axis[:, None, None], corners, wall_corners)

    # incident-edge corner selection (MuJoCo box-box): the incident face is
    # the one whose outward normal is most anti-parallel to the reference
    # face normal — NOT the two deepest corners (probed at t=94,
    # tools/debug_point_rows.py: MuJoCo keeps the shallow far corner of the
    # incident edge and drops a deeper corner of the adjacent edge).
    # wall-axis case (reference face on the wall, outward normal n̂):
    # arrow edge normals are ±u (short edges, su=±1) / ±v (long, sv=±1);
    # minimize normal·n̂ -> axis with larger |c|, sign -sign(c).
    cu = n @ u                                               # (W,)
    cv = n @ v
    su_i = -jnp.sign(jnp.where(cu == 0.0, 1.0, cu))
    sv_i = -jnp.sign(jnp.where(cv == 0.0, 1.0, cv))
    i01 = jnp.asarray([0, 1]); i23 = jnp.asarray([2, 3])
    i02 = jnp.asarray([0, 2]); i13 = jnp.asarray([1, 3])
    # signs rows: [(+,+), (+,-), (-,+), (-,-)] — su fixed -> {0,1}/{2,3},
    # sv fixed -> {0,2}/{1,3}
    iu = jnp.where(su_i[:, None] > 0, i01[None, :], i23[None, :])
    iv = jnp.where(sv_i[:, None] > 0, i02[None, :], i13[None, :])
    inc_wall = jnp.where((jnp.abs(cu) >= jnp.abs(cv))[:, None], iu, iv)
    # arrow-axis case (reference face on the arrow, its outward normal -n̂):
    # wall incident face normal maximizes normal·n̂ -> ±ex/±ey by |n̂| comp.
    sx_i = jnp.sign(jnp.where(n[:, 0] == 0.0, 1.0, n[:, 0]))
    sy_i = jnp.sign(jnp.where(n[:, 1] == 0.0, 1.0, n[:, 1]))
    ix = jnp.where(sx_i[:, None] > 0, i01[None, :], i23[None, :])
    iy = jnp.where(sy_i[:, None] > 0, i02[None, :], i13[None, :])
    inc_arrow = jnp.where((jnp.abs(n[:, 0]) >= jnp.abs(n[:, 1]))[:, None],
                          ix, iy)
    top2 = jnp.where(is_wall_axis[:, None], inc_wall, inc_arrow)  # (W, 2)
    pick = lambda arr: jnp.take_along_axis(arr, top2, 1)
    pen2 = pick(pens)                                        # (W, 2)
    pt2 = jnp.take_along_axis(pts, top2[:, :, None].repeat(2, -1), 1)
    # tangential clip: project onto t = rot90(n); reference extent along t
    t = jnp.stack([-n[:, 1], n[:, 0]], -1)
    ref_c = jnp.where(is_wall_axis[:, None], bc, ac[None, :].repeat(W, 0))
    ref_ht = jnp.where(
        is_wall_axis,
        (bh * jnp.abs(t)).sum(-1),
        hl * jnp.abs((t * u[None, :]).sum(-1))
        + hw * jnp.abs((t * v[None, :]).sum(-1)),
    )
    s = ((pt2 - ref_c[:, None, :]) * t[:, None, :]).sum(-1)  # (W, 2)
    s_cl = jnp.clip(s, -ref_ht[:, None], ref_ht[:, None])
    # clipping moves the point along the incident edge; adjust pen linearly
    # along the edge direction (the segment between the two corners)
    edge = pt2[:, 1] - pt2[:, 0]
    edge_s = (edge * t).sum(-1)
    edge_pen = pen2[:, 1] - pen2[:, 0]
    slope = jnp.where(jnp.abs(edge_s) > 1e-9, edge_pen / edge_s, 0.0)
    pen_cl = pen2 + (s_cl - s) * slope[:, None]
    pt_cl = pt2 + (s_cl - s)[:, :, None] * t[:, None, :]
    # contact position = midpoint of the point and the reference face along
    # n: the penetrating point is the arrow corner (below the wall face) in
    # the wall-axis case -> +n/2, but the WALL corner (poking past the
    # arrow face in +n) in the arrow-axis case -> -n/2 (probed at t=93/94).
    pos_sgn = jnp.where(is_wall_axis, 0.5, -0.5)
    pos = pt_cl + n[:, None, :] * (pen_cl * pos_sgn[:, None])[:, :, None]

    # MuJoCo's point-keep rules (probed, margin = 0; see DESIGN.md §point):
    # * original incident-face corners: with C1 = 0.02*h_ref (reference-box
    #   halfsize along the normal) and C2 = C1/1.01, keep all pen > 0 when
    #   the deepest pen <= C1 (shallow face-ish contact), else keep only
    #   pen > C2 (probed boundary d2* = h*2/101 across h, tilt, box dims).
    # * clip-generated points (corner clamped to the reference rect, depth
    #   interpolated along the incident edge): keep iff pen > 0 and the
    #   depth gap to the deepest point is <= 2*h_ref (probed: kept at gap
    #   0.104 with h=0.1 at t=96, dropped at gap 0.216 at t=93; always kept
    #   for wall-reference where 2*h is large).
    was_clipped = jnp.abs(s_cl - s) > 1e-12
    h_ref = jnp.where(is_wall_axis, (bh * jnp.abs(n)).sum(-1), half_along)
    c1 = 0.02 * h_ref
    c2 = c1 / 1.01
    depmax = jnp.max(jnp.where(pen_cl > 0.0, pen_cl, -jnp.inf), axis=-1)
    thresh = jnp.where(depmax <= c1, 0.0, c2)
    keep_corner = pen_cl > thresh[:, None]
    keep_clip = (pen_cl > 0.0) & (
        (depmax[:, None] - pen_cl) <= 2.0 * h_ref[:, None])
    keep = jnp.where(was_clipped, keep_clip, keep_corner)
    active_xy = overlap_all[:, None] & keep & (~z_wins[:, None])
    xy_con = _Contacts(
        pos=pos.reshape(-1, 2), n=n[:, None, :].repeat(2, 1).reshape(-1, 2),
        nz=jnp.zeros_like(pen_cl).reshape(-1), pen=pen_cl.reshape(-1),
        active=active_xy.reshape(-1),
        zmult=jnp.full_like(pen_cl, 2.0).reshape(-1),
        floor=jnp.zeros_like(pen_cl).reshape(-1),
    )

    # z-axis winner: arrow footprint corners inside the wall footprint
    in_foot = (jnp.abs(corners[:, :, 0] - bc[:, None, 0]) <= bh[:, None, 0]) & (
        jnp.abs(corners[:, :, 1] - bc[:, None, 1]) <= bh[:, None, 1])  # (W,4)
    nz_sgn = jnp.sign(jnp.where(az_c == boxes.c[:, 2], -1.0,
                                az_c - boxes.c[:, 2]))       # push away along z
    active_z = overlap_all[:, None] & z_wins[:, None] & in_foot
    z_con = _Contacts(
        pos=corners.reshape(-1, 2),
        n=jnp.zeros((W * 4, 2), xy.dtype),
        nz=nz_sgn[:, None].repeat(4, 1).reshape(-1),
        pen=ov_z[:, None].repeat(4, 1).reshape(-1),
        active=active_z.reshape(-1),
        zmult=jnp.ones((W * 4,), xy.dtype),
        floor=jnp.zeros((W * 4,), xy.dtype),
    )
    cat = lambda a, b: jnp.concatenate([a, b], 0)
    return _Contacts(*(cat(a, b) for a, b in zip(xy_con, z_con)))


def _floor_contact(p: PointWorldParams, xy, th):
    """The sphere-floor contact, with MuJoCo's bit-exact inclusion switch.

    ``dist = fl(0.5*m22) - 0.5`` where ``m22 = fl(fl(cos(th/2)^2) +
    fl(sin(th/2)^2))`` (see module docstring); the contact is included iff
    dist < 0 (i.e. m22 rounds below 1), giving pure-friction pyramid rows
    (J_n = 0: z is not a dof and the xy lever is zero)."""
    w = jnp.cos(0.5 * th)
    z = jnp.sin(0.5 * th)
    m22 = w * w + z * z
    dist = 0.5 * m22 - 0.5
    active = dist < 0.0
    one = jnp.ones_like(th)
    return _Contacts(
        pos=xy[None, :], n=jnp.zeros((1, 2), xy.dtype),
        nz=one[None], pen=(-dist)[None], active=active[None],
        zmult=one[None], floor=one[None])


def _gather_contacts(p: PointWorldParams, boxes: WallBoxes, xy, th):
    cs = _sphere_vs_boxes(p, boxes, xy)
    ca = _arrow_vs_boxes(p, boxes, xy, th)
    cat = lambda a, b: jnp.concatenate([a, b], 0)
    all_c = _Contacts(*(cat(a, b) for a, b in zip(cs, ca)))
    # top-K by penetration among active
    score = jnp.where(all_c.active, all_c.pen, -jnp.inf)
    k = min(p.max_contacts, score.shape[0])
    idx = jnp.argsort(-score)[:k]
    g = lambda arr: arr[idx]
    walls = _Contacts(pos=g(all_c.pos), n=g(all_c.n), nz=g(all_c.nz),
                      pen=g(all_c.pen), active=g(all_c.active),
                      zmult=g(all_c.zmult), floor=g(all_c.floor))
    fl_c = _floor_contact(p, xy, th)
    return _Contacts(*(cat(a, b) for a, b in zip(walls, fl_c)))


# ---------------------------------------------------------------------------
# constraint rows + primal Newton solve
# ---------------------------------------------------------------------------

def _make_frame(n2, nz):
    """MuJoCo mju_makeFrame tangents for our normals.

    Probed cases: n=(±1,0,0) -> t1=(0,1,0); n=(0,0,±1) -> t1=(0,1,0).
    mju_makeFrame picks t1 = normalize((0,1,0) - n*n_y) unless n is close
    to ±y, in which case t1 = normalize((0,0,1) - n*n_z).  For planar
    normals this reduces to the formulas below.
    """
    # general: t1 = normalize(ey - n*(n·ey)) if |n_y| < 0.99? — MuJoCo uses
    # "smallest component" logic; validated against probes in
    # tools/validate_point_world.py for all wall orientations.
    near_y = jnp.abs(n2[:, 1]) > 0.99995
    ny = n2[:, 1]
    # candidate A: ey - n*(n·ey), normalized (n·ey = n_y since n_z enters
    # only for the deep-sphere case where n2=0)
    t1x_a = -n2[:, 0] * ny
    t1y_a = 1.0 - ny * ny
    t1z_a = -nz * ny
    nrm_a = jnp.sqrt(t1x_a**2 + t1y_a**2 + t1z_a**2 + 1e-30)
    # candidate B (near ±y): ez - n*(n·ez); planar normals have n_z=0 so
    # this is just ez
    t1 = jnp.where(
        near_y[:, None],
        jnp.stack([jnp.zeros_like(ny), jnp.zeros_like(ny), jnp.ones_like(ny)], -1),
        jnp.stack([t1x_a / nrm_a, t1y_a / nrm_a, t1z_a / nrm_a], -1),
    )
    n3 = jnp.stack([n2[:, 0], n2[:, 1], nz], -1)
    t2 = jnp.cross(n3, t1)
    return n3, t1, t2


def _rows_from_contacts(p: PointWorldParams, con: _Contacts, xy, v):
    """Pyramid rows (4 per contact): J (K4, 3), aref, 1/R (masked)."""
    n3, t1, t2 = _make_frame(con.n, con.nz)
    r = con.pos - xy[None, :]                                # (K, 2) lever
    # J of a direction d: (d_x, d_y, (z×r)·d = -r_y d_x + r_x d_y)
    def jac(d):
        return jnp.stack(
            [d[:, 0], d[:, 1], -r[:, 1] * d[:, 0] + r[:, 0] * d[:, 1]], -1)
    jn, jt1, jt2 = jac(n3), jac(t1), jac(t2)
    mu = p.mu
    J = jnp.stack([jn - mu * jt1, jn + mu * jt1,
                   jn - mu * jt2, jn + mu * jt2], 1)         # (K, 4, 3)
    is_f = con.floor > 0.0
    dmin = jnp.where(is_f, p.f_dmin, p.dmin)
    dmax = jnp.where(is_f, p.f_dmax, p.dmax)
    width = jnp.where(is_f, p.f_width, p.width)
    d_imp = _impedance(con.pen, dmin, dmax, width)           # (K,)
    k = d_imp / (dmax * dmax * p.tc * p.tc * p.zeta * p.zeta)
    b = 2.0 / (dmax * p.tc)
    vrow = (J @ v)                                           # (K, 4)
    aref = -b[:, None] * vrow + (k * con.pen)[:, None]
    rinv = (d_imp / (1.0 - d_imp)) / p.r_scale * con.zmult   # (K,)
    rinv = jnp.where(con.active, rinv, 0.0)
    K = J.shape[0]
    return (J.reshape(K * 4, 3), aref.reshape(K * 4),
            rinv[:, None].repeat(4, 1).reshape(K * 4))


def _mass_matrix(p: PointWorldParams, th):
    s, c = jnp.sin(th), jnp.cos(th)
    a = p.arm
    return jnp.stack([
        jnp.stack([jnp.full_like(th, p.m), jnp.zeros_like(th), -a * s]),
        jnp.stack([jnp.zeros_like(th), jnp.full_like(th, p.m), a * c]),
        jnp.stack([-a * s, a * c, jnp.full_like(th, p.inertia)]),
    ])


def _qacc_smooth(p: PointWorldParams, th, w, minv):
    bias = jnp.stack([p.arm * w * w * jnp.cos(th),
                      p.arm * w * w * jnp.sin(th),
                      jnp.zeros_like(th)])
    return minv @ bias


def _solve_newton(p: PointWorldParams, M, a0, J, aref, rinv,
                  precondition: bool = False):
    """Primal Newton on the convex piecewise-quadratic MuJoCo cost.

    ``precondition`` enables Jacobi (diagonal) scaling of the Newton
    system — needed by the float32 object solve, whose H mixes the
    near-massless object inertia (~1e-4) with contact penalty terms
    (~1e2+); the float64 exact path keeps the raw solve for bit-parity.
    """

    def cost_grad_hess(x):
        jar = J @ x - aref
        neg = (jar < 0.0) & (rinv > 0.0)
        wrow = jnp.where(neg, rinv, 0.0)
        grad = M @ (x - a0) + J.T @ (wrow * jar)
        H = M + (J.T * wrow[None, :]) @ J
        return grad, H

    def phi_prime(x, pdir, t):
        """d/dt cost(x + t p) — piecewise linear, increasing."""
        xt = x + t * pdir
        jar = J @ xt - aref
        wrow = jnp.where((jar < 0.0) & (rinv > 0.0), rinv, 0.0)
        return pdir @ (M @ (xt - a0)) + (J @ pdir) @ (wrow * jar)

    x = a0
    for _ in range(p.newton_iters):
        grad, H = cost_grad_hess(x)
        if precondition:
            s = 1.0 / jnp.sqrt(jnp.maximum(jnp.diag(H), 1e-20))
            Hs = H * s[:, None] * s[None, :]
            pdir = -s * jnp.linalg.solve(Hs, s * grad)
        else:
            pdir = -jnp.linalg.solve(H, grad)
        # exact-ish line search: bisection on the monotone derivative
        lo = jnp.zeros((), x.dtype)
        hi = jnp.full((), 2.0, x.dtype)
        hi = jnp.where(phi_prime(x, pdir, hi) < 0.0, 4.0, hi)
        for _ in range(p.ls_iters):
            mid = 0.5 * (lo + hi)
            dneg = phi_prime(x, pdir, mid) < 0.0
            lo = jnp.where(dneg, mid, lo)
            hi = jnp.where(dneg, hi, mid)
        t = 0.5 * (lo + hi)
        x = x + t * pdir
    return x


def forward(p: PointWorldParams, boxes: WallBoxes, q, v):
    """qacc(q, v): smooth + contact constraint solve (one mj_forward)."""
    th = q[2]
    M = _mass_matrix(p, th)
    minv = jnp.linalg.inv(M)
    a0 = _qacc_smooth(p, th, v[2], minv)
    con = _gather_contacts(p, boxes, q[:2], th)
    J, aref, rinv = _rows_from_contacts(p, con, q[:2], v)
    any_active = jnp.any(rinv > 0.0)
    qacc = _solve_newton(p, M, a0, J, aref, rinv)
    return jnp.where(any_active, qacc, a0)


def rk4_step(p: PointWorldParams, boxes: WallBoxes, q, v):
    """One ``mj_step`` replica (RK4 tableau A=[1/2,1/2,1], B=[1/6,1/3,1/3,1/6])."""
    h = jnp.asarray(p.dt, q.dtype)
    A = (0.5, 0.5, 1.0)
    B = (1.0 / 6.0, 1.0 / 3.0, 1.0 / 3.0, 1.0 / 6.0)
    vs = [v]
    accs = [forward(p, boxes, q, v)]
    for a in A:
        qi = q + a * h * vs[-1]
        vi = v + a * h * accs[-1]
        vs.append(vi)
        accs.append(forward(p, boxes, qi, vi))
    qf = q + h * sum(b * vi for b, vi in zip(B, vs[:4]))
    vf = v + h * sum(b * ai for b, ai in zip(B, accs))
    return qf, vf


# ---------------------------------------------------------------------------
# multi-body world: robot + hinge-type object balls (Billiard tasks)
# ---------------------------------------------------------------------------

class BallWorld(NamedTuple):
    """Static spec of the hinge-type object balls (maze_env.py:489-536):
    per ball a body at ``body_pos`` with slide-x/slide-y/hinge-z joints and
    a sphere geom of radius ``r`` at (0, 0, r), mass 1e-4*r^3."""

    r: jnp.ndarray         # (B,) radii
    mass: jnp.ndarray      # (B,)
    inertia: jnp.ndarray   # (B,) spin inertia about the hinge (2/5 m r^2)
    body_pos: jnp.ndarray  # (B, 2) body-frame origins (cell centers)

    @property
    def nb(self) -> int:
        return self.r.shape[0]


def ball_world_from_structure(ms, dtype=jnp.float64) -> "BallWorld":
    """Build the BallWorld from a maze structure's object-ball specs."""
    pos = np.asarray([ob.pos for ob in ms.object_balls], np.float64)
    r = np.asarray([ob.size for ob in ms.object_balls], np.float64)
    mass = 1e-4 * r**3
    return BallWorld(
        r=jnp.asarray(r, dtype),
        mass=jnp.asarray(mass, dtype),
        inertia=jnp.asarray(0.4 * mass * r * r, dtype),
        body_pos=jnp.asarray(pos.reshape(-1, 2), dtype),
    )


class _Rows(NamedTuple):
    J: jnp.ndarray      # (R, ndof)
    aref: jnp.ndarray   # (R,)
    rinv: jnp.ndarray   # (R,)


def _pyramid_rows(p, jn, jt1, jt2, pen, vrow_v, active, zmult,
                  dmin, dmax, width, invw, mu):
    """Generic pyramid rows from per-contact 2-body jacobians (K, ndof)."""
    J = jnp.stack([jn - mu * jt1, jn + mu * jt1,
                   jn - mu * jt2, jn + mu * jt2], 1)          # (K, 4, nd)
    d_imp = _impedance(pen, dmin, dmax, width)
    k = d_imp / (dmax * dmax * p.tc * p.tc * p.zeta * p.zeta)
    b = 2.0 / (dmax * p.tc)
    vrow = J @ vrow_v                                         # (K, 4)
    aref = -b * vrow + (k * pen)[:, None] if jnp.ndim(b) == 0 else (
        -b[:, None] * vrow + (k * pen)[:, None])
    r_scale = 2.0 * (1.0 + mu * mu) * invw
    rinv = (d_imp / (1.0 - d_imp)) / r_scale * zmult
    rinv = jnp.where(active, rinv, 0.0)
    K, nd = J.shape[0], J.shape[2]
    return _Rows(J=J.reshape(K * 4, nd), aref=aref.reshape(K * 4),
                 rinv=rinv[:, None].repeat(4, 1).reshape(K * 4))


def _rows1(p, j, pen, vrow_v, active, dmin, dmax, width, invw):
    """Single frictionless unilateral rows (joint limits): same impedance/
    aref/R laws as :func:`_pyramid_rows` without the friction pyramid —
    MuJoCo's limit constraints (solimp (0.9,0.95,0.001), solref tc clamped
    to 2·dt, R = (1−d)/d · invweight of the dof)."""
    d_imp = _impedance(pen, dmin, dmax, width)
    k = d_imp / (dmax * dmax * p.tc * p.tc * p.zeta * p.zeta)
    b = 2.0 / (dmax * p.tc)
    vrow = j @ vrow_v
    aref = -b * vrow + k * pen
    rinv = (d_imp / (1.0 - d_imp)) / invw
    rinv = jnp.where(active, rinv, 0.0)
    return _Rows(J=j, aref=aref, rinv=rinv)


def _body_jac3(d3, pos_xy, origin_xy):
    """(K, 3) jacobian of 3D direction ``d3`` at ``pos_xy`` for one planar
    slide-slide-hinge body whose hinge passes through ``origin_xy``."""
    r = pos_xy - origin_xy
    return jnp.stack(
        [d3[:, 0], d3[:, 1],
         -r[:, 1] * d3[:, 0] + r[:, 0] * d3[:, 1]], -1)


def _floor_switch(th):
    """MuJoCo's bit-exact z=const contact inclusion predicate (see
    :func:`_floor_contact`): active iff fl(cos^2(th/2)) + fl(sin^2(th/2))
    rounds below 1."""
    w = jnp.cos(0.5 * th)
    z = jnp.sin(0.5 * th)
    m22 = w * w + z * z
    dist = 0.5 * m22 - 0.5
    return dist < 0.0, -dist


def forward_world(p: PointWorldParams, boxes: WallBoxes, balls, q, v,
                  blocks=None):
    """qacc for the composed world: robot (3 dof) + B hinge balls (3 dof
    each) + movable XY blocks (1-2 dof each).

    Contact inventory (all validated row-level against MuJoCo 3 on the
    composed PointBilliard / PointPush worlds, tools/probe_point_mj.py
    pattern): robot-vs-walls + robot floor switch (as :func:`forward`), per
    ball: sphere-vs-walls, floor switch on the ball hinge angle, robot-
    sphere-vs-ball (3D tilted normal), arrow-box-vs-ball, ball-vs-ball;
    per block: robot-sphere-vs-block, arrow-vs-block, block-vs-walls,
    block-vs-block, ball-vs-block.  Blocks have momentum and no floor
    friction (probed: they glide at constant velocity until a contact).
    R uses the summed ``body_invweight0`` of the pair (probed: 269.361 for
    robot-ball at d=0.99; 151.134 for robot-block at d=0.9925)."""
    B = balls.nb if balls is not None else 0
    Bk = blocks.nb if blocks is not None else 0
    blk_base = 3 + 3 * B
    # static per-block dof column layout
    blk_cols = []
    off = blk_base
    for k in range(Bk):
        cols = {}
        if blocks.has_x[k]:
            cols["x"] = off
            off += 1
        if blocks.has_y[k]:
            cols["y"] = off
            off += 1
        blk_cols.append(cols)
    nd = off
    th = q[2]
    xy = q[:2]
    dtype = q.dtype

    # mass matrix: blockdiag(robot M, per-ball diag(m, m, I), block dofs)
    M = jnp.zeros((nd, nd), dtype)
    M = M.at[:3, :3].set(_mass_matrix(p, th))
    for i in range(B):
        o = 3 + 3 * i
        M = M.at[o, o].set(balls.mass[i])
        M = M.at[o + 1, o + 1].set(balls.mass[i])
        M = M.at[o + 2, o + 2].set(balls.inertia[i])
    for k in range(Bk):
        for c in blk_cols[k].values():
            M = M.at[c, c].set(blocks.mass[k])
    minv3 = jnp.linalg.inv(_mass_matrix(p, th))
    a0 = jnp.zeros((nd,), dtype).at[:3].set(
        _qacc_smooth(p, th, v[2], minv3))

    invw_r = p.invw_t
    rows = []
    pad = lambda j3: jnp.pad(j3, ((0, 0), (0, nd - 3)))

    # --- robot vs walls + robot floor (reuse the 3-dof machinery) --------
    con = _gather_contacts(p, boxes, xy, th)
    n3, t1, t2 = _make_frame(con.n, con.nz)
    jn = pad(_body_jac3(n3, con.pos, xy))
    jt1 = pad(_body_jac3(t1, con.pos, xy))
    jt2 = pad(_body_jac3(t2, con.pos, xy))
    is_f = con.floor > 0.0
    rows.append(_pyramid_rows(
        p, jn, jt1, jt2, con.pen, v, con.active, con.zmult,
        jnp.where(is_f, p.f_dmin, p.dmin), jnp.where(is_f, p.f_dmax, p.dmax),
        jnp.where(is_f, p.f_width, p.width), invw_r, p.mu))

    # solimp of robot-sphere-vs-ball / arrow-vs-ball / ball-vs-ball pairs:
    # both geoms carry (.9, .99, .001) (maze_env.py:509, point.xml)
    bb_dmin, bb_dmax, bb_width = 0.9, 0.99, 0.001

    for i in range(B):
        o = 3 + 3 * i
        invw_b = 2.0 / (3.0 * balls.mass[i])
        ctr = balls.body_pos[i] + jnp.stack([q[o], q[o + 1]])
        thb = q[o + 2]
        r_b = balls.r[i]
        padb = lambda j3, o=o: jnp.zeros(
            (j3.shape[0], nd), dtype).at[:, o:o + 3].set(j3)

        # ball vs walls (sphere-box, z = r_b)
        bw = _sphere_vs_boxes_r(boxes, ctr, r_b, r_b)
        bn3, bt1, bt2 = _make_frame(bw.n, bw.nz)
        rows.append(_pyramid_rows(
            p, padb(_body_jac3(bn3, bw.pos, ctr)),
            padb(_body_jac3(bt1, bw.pos, ctr)),
            padb(_body_jac3(bt2, bw.pos, ctr)),
            bw.pen, v, bw.active, bw.zmult,
            p.dmin, p.dmax, p.width, invw_b, p.mu))

        # ball floor switch (pure friction, lever 0)
        fact, fpen = _floor_switch(thb)
        fn3 = jnp.asarray([[0.0, 0.0, 1.0]], dtype)
        ft1 = jnp.asarray([[0.0, 1.0, 0.0]], dtype)
        ft2 = jnp.asarray([[-1.0, 0.0, 0.0]], dtype)
        mkj = lambda d: padb(_body_jac3(d, ctr[None, :], ctr))
        rows.append(_pyramid_rows(
            p, mkj(fn3), mkj(ft1), mkj(ft2), fpen[None],
            v, fact[None], jnp.ones((1,), dtype),
            p.f_dmin, p.f_dmax, p.f_width, invw_b, p.mu))

        # robot body sphere vs ball (3D contact: centers at z=0.5 / z=r_b)
        d3 = jnp.stack([ctr[0] - xy[0], ctr[1] - xy[1],
                        r_b - p.sphere_z])
        dist3 = jnp.sqrt(jnp.sum(d3 * d3) + 1e-30)
        nrm = d3 / dist3
        pen_rb = (p.sphere_r + r_b) - dist3
        # contact position: on the segment between centers
        t_mid = p.sphere_r + (dist3 - p.sphere_r - r_b) * 0.5
        pos_rb = xy + nrm[:2] * t_mid
        rn3, rt1, rt2 = _make_frame(nrm[None, :2], nrm[None, 2])
        jfun = lambda d: (padb(_body_jac3(d, pos_rb[None, :], ctr))
                          - pad(_body_jac3(d, pos_rb[None, :], xy)))
        rows.append(_pyramid_rows(
            p, jfun(rn3), jfun(rt1), jfun(rt2), pen_rb[None], v,
            (pen_rb > 0.0)[None], jnp.ones((1,), dtype),
            bb_dmin, bb_dmax, bb_width, invw_r + invw_b, p.mu))

        # arrow box vs ball: sphere vs rotated box -> solve in arrow frame
        ct, st = jnp.cos(th), jnp.sin(th)
        u = jnp.stack([ct, st])
        w_ax = jnp.stack([-st, ct])
        ac = xy + u * p.arrow_off
        rel = ctr - ac
        # ball center in arrow frame (x along u, y along v, z up)
        bx, by = rel @ u, rel @ w_ax
        bz = r_b - 0.5 * (p.arrow_z_lo + p.arrow_z_hi)
        hx, hy = p.arrow_half_l, p.arrow_half_w
        hz = 0.5 * (p.arrow_z_hi - p.arrow_z_lo)
        cx = jnp.clip(bx, -hx, hx)
        cy = jnp.clip(by, -hy, hy)
        cz = jnp.clip(bz, -hz, hz)
        ddx, ddy, ddz = bx - cx, by - cy, bz - cz
        dd2 = ddx * ddx + ddy * ddy + ddz * ddz
        dl = jnp.sqrt(jnp.maximum(dd2, 1e-30))
        pen_ab = r_b - dl
        # normal in world frame (pushes the ball away from the arrow)
        nf = jnp.stack([ddx, ddy, ddz]) / dl
        n_world = jnp.stack([
            nf[0] * u[0] + nf[1] * w_ax[0],
            nf[0] * u[1] + nf[1] * w_ax[1],
            nf[2],
        ])
        # contact position: ball center - n*(r + dist/2)
        t_ab = r_b + (dl - r_b) * 0.5
        pos_ab = ctr - n_world[:2] * t_ab
        an3, at1, at2 = _make_frame(n_world[None, :2], n_world[None, 2])
        jfun_a = lambda d: (padb(_body_jac3(d, pos_ab[None, :], ctr))
                            - pad(_body_jac3(d, pos_ab[None, :], xy)))
        rows.append(_pyramid_rows(
            p, jfun_a(an3), jfun_a(at1), jfun_a(at2), pen_ab[None], v,
            (pen_ab > 0.0)[None], jnp.ones((1,), dtype),
            bb_dmin, bb_dmax, bb_width, invw_r + invw_b, p.mu))

        # ball vs earlier balls
        for jprev in range(i):
            o2 = 3 + 3 * jprev
            ctr2 = balls.body_pos[jprev] + jnp.stack([q[o2], q[o2 + 1]])
            r2 = balls.r[jprev]
            d3b = jnp.stack([ctr[0] - ctr2[0], ctr[1] - ctr2[1], r_b - r2])
            distb = jnp.sqrt(jnp.sum(d3b * d3b) + 1e-30)
            nb = d3b / distb
            pen_bb = (r_b + r2) - distb
            pos_bb = ctr2 + nb[:2] * (r2 + (distb - r2 - r_b) * 0.5)
            bn, bt1b, bt2b = _make_frame(nb[None, :2], nb[None, 2])
            padb2 = lambda j3, o2=o2: jnp.zeros(
                (j3.shape[0], nd), dtype).at[:, o2:o2 + 3].set(j3)
            jf = lambda d: (padb(_body_jac3(d, pos_bb[None, :], ctr))
                            - padb2(_body_jac3(d, pos_bb[None, :], ctr2)))
            invw_b2 = 2.0 / (3.0 * balls.mass[jprev])
            rows.append(_pyramid_rows(
                p, jf(bn), jf(bt1b), jf(bt2b), pen_bb[None], v,
                (pen_bb > 0.0)[None], jnp.ones((1,), dtype),
                bb_dmin, bb_dmax, bb_width, invw_b + invw_b2, p.mu))

    # ------------------------------------------------------------------
    # movable XY blocks
    # ------------------------------------------------------------------
    # solimp of block-vs-wall contacts: both geoms are the hardened default
    # class (maze_env.py:108-112) -> (0.995, 0.995, 0.01)
    blw_dmin, blw_dmax, blw_width = 0.995, 0.995, 0.01
    blk_ctr = []
    for k in range(Bk):
        cols = blk_cols[k]
        dx = q[cols["x"]] if "x" in cols else jnp.zeros((), dtype)
        dy = q[cols["y"]] if "y" in cols else jnp.zeros((), dtype)
        blk_ctr.append(blocks.body_pos[k] + jnp.stack(
            [dx, dy, jnp.zeros((), dtype)]))

    def blk_jac(k, d3, pos_xy):
        """(K, nd) jacobian rows of 3D directions for block k."""
        cols = blk_cols[k]
        out = jnp.zeros((d3.shape[0], nd), dtype)
        if "x" in cols:
            out = out.at[:, cols["x"]].set(d3[:, 0])
        if "y" in cols:
            out = out.at[:, cols["y"]].set(d3[:, 1])
        return out

    for k in range(Bk):
        ctr3 = blk_ctr[k]
        one_box = WallBoxes(c=ctr3[None, :], h=blocks.half[k][None, :],
                            mask=jnp.ones((1,), dtype))
        invw_k = 1.0 / blocks.mass[k]

        # robot body sphere vs block (solimp = robot-wall mix: robot
        # explicit + hardened default, probed (0.9475, 0.9925, 0.0055))
        sb = _sphere_vs_boxes_r(one_box, xy, p.sphere_r, p.sphere_z)
        sn3, st1, st2 = _make_frame(sb.n, sb.nz)
        jf = lambda d, con=sb, kk=k: (
            pad(_body_jac3(d, con.pos, xy)) - blk_jac(kk, d, con.pos))
        rows.append(_pyramid_rows(
            p, jf(sn3), jf(st1), jf(st2), sb.pen, v, sb.active, sb.zmult,
            p.dmin, p.dmax, p.width, invw_r + invw_k, p.mu))

        # arrow vs block (box-box, same solimp mix)
        ab = _arrow_vs_boxes(p, one_box, xy, th)
        an3, at1, at2 = _make_frame(ab.n, ab.nz)
        jfa = lambda d, con=ab, kk=k: (
            pad(_body_jac3(d, con.pos, xy)) - blk_jac(kk, d, con.pos))
        rows.append(_pyramid_rows(
            p, jfa(an3), jfa(at1), jfa(at2), ab.pen, v, ab.active, ab.zmult,
            p.dmin, p.dmax, p.width, invw_r + invw_k, p.mu))

        # block vs static walls (parallel AABB faces)
        bwc = _aabb_vs_boxes(ctr3, blocks.half[k], boxes)
        bn3, bt1, bt2 = _make_frame(bwc.n, bwc.nz)
        jfw = lambda d, con=bwc, kk=k: blk_jac(kk, d, con.pos)
        rows.append(_pyramid_rows(
            p, jfw(bn3), jfw(bt1), jfw(bt2), bwc.pen, v, bwc.active,
            bwc.zmult, blw_dmin, blw_dmax, blw_width, invw_k, p.mu))

        # block vs earlier blocks
        for kp in range(k):
            other = WallBoxes(c=blk_ctr[kp][None, :],
                              h=blocks.half[kp][None, :],
                              mask=jnp.ones((1,), dtype))
            bb = _aabb_vs_boxes(ctr3, blocks.half[k], other)
            nb3, tb1, tb2 = _make_frame(bb.n, bb.nz)
            jfb = lambda d, con=bb, kk=k, ko=kp: (
                blk_jac(kk, d, con.pos) - blk_jac(ko, d, con.pos))
            rows.append(_pyramid_rows(
                p, jfb(nb3), jfb(tb1), jfb(tb2), bb.pen, v, bb.active,
                bb.zmult, blw_dmin, blw_dmax, blw_width,
                invw_k + 1.0 / blocks.mass[kp], p.mu))

        # balls vs block (sphere-box; solimp = ball explicit + default mix
        # — same as the robot mix)
        for i in range(B):
            o = 3 + 3 * i
            bctr = balls.body_pos[i] + jnp.stack([q[o], q[o + 1]])
            blb = _sphere_vs_boxes_r(one_box, bctr, balls.r[i], balls.r[i])
            ln3, lt1, lt2 = _make_frame(blb.n, blb.nz)
            padb_i = lambda j3, o=o: jnp.zeros(
                (j3.shape[0], nd), dtype).at[:, o:o + 3].set(j3)
            jfl = lambda d, con=blb, kk=k, o=o, bctr=bctr: (
                padb_i(_body_jac3(d, con.pos, bctr), o)
                - blk_jac(kk, d, con.pos))
            rows.append(_pyramid_rows(
                p, jfl(ln3), jfl(lt1), jfl(lt2), blb.pen, v, blb.active,
                blb.zmult, p.dmin, p.dmax, p.width,
                2.0 / (3.0 * balls.mass[i]) + invw_k, p.mu))

    J = jnp.concatenate([r.J for r in rows], 0)
    aref = jnp.concatenate([r.aref for r in rows], 0)
    rinv = jnp.concatenate([r.rinv for r in rows], 0)
    any_active = jnp.any(rinv > 0.0)
    qacc = _solve_newton(p, M, a0, J, aref, rinv)
    return jnp.where(any_active, qacc, a0)


def _aabb_vs_boxes(center3, half3, boxes: WallBoxes):
    """Axis-aligned moving box vs wall boxes: parallel-face contacts.

    Minimum xy-axis SAT; two contact points at the tangential intersection
    endpoints, duplicated over the z overlap (zmult = 2), all at the same
    penetration (parallel faces -> MuJoCo's shallow branch keeps every
    point with pen > 0)."""
    d = center3[None, :2] - boxes.c[:, :2]
    ox = boxes.h[:, 0] + half3[0] - jnp.abs(d[:, 0])
    oy = boxes.h[:, 1] + half3[1] - jnp.abs(d[:, 1])
    oz = (boxes.h[:, 2] + half3[2]
          - jnp.abs(center3[2] - boxes.c[:, 2]))
    use_x = ox <= oy
    pen = jnp.where(use_x, ox, oy)
    sx = jnp.sign(jnp.where(d[:, 0] == 0.0, 1.0, d[:, 0]))
    sy = jnp.sign(jnp.where(d[:, 1] == 0.0, 1.0, d[:, 1]))
    sgn = jnp.where(use_x, sx, sy)
    n2 = jnp.where(use_x[:, None],
                   jnp.stack([sgn, jnp.zeros_like(sgn)], -1),
                   jnp.stack([jnp.zeros_like(sgn), sgn], -1))
    # normal-axis position of the contact plane midpoint
    half_n = jnp.where(use_x, half3[0], half3[1])
    ctr_n = jnp.where(use_x, center3[0], center3[1])
    face_blk = ctr_n * sgn - half_n            # block face toward the wall
    pos_n = (face_blk + pen * 0.5) * sgn       # midpoint, in world coords
    # tangential intersection endpoints
    half_t = jnp.where(use_x, half3[1], half3[0])
    ctr_t = jnp.where(use_x, center3[1], center3[0])
    w_t = jnp.where(use_x, boxes.h[:, 1], boxes.h[:, 0])
    wc_t = jnp.where(use_x, boxes.c[:, 1], boxes.c[:, 0])
    t_lo = jnp.maximum(ctr_t - half_t, wc_t - w_t)
    t_hi = jnp.minimum(ctr_t + half_t, wc_t + w_t)
    mk = lambda t: jnp.where(use_x[:, None],
                             jnp.stack([pos_n, t], -1),
                             jnp.stack([t, pos_n], -1))
    pos = jnp.concatenate([mk(t_lo), mk(t_hi)], 0)             # (2W, 2)
    pen2 = jnp.concatenate([pen, pen], 0)
    n2c = jnp.concatenate([n2, n2], 0)
    active = (pen > 0.0) & (oz > 0.0) & (t_hi > t_lo) & (boxes.mask > 0.0)
    active2 = jnp.concatenate([active, active], 0)
    W2 = pos.shape[0]
    return _BallCon(pos=pos, n=n2c, nz=jnp.zeros((W2,), center3.dtype),
                    pen=pen2, active=active2,
                    zmult=jnp.full((W2,), 2.0, center3.dtype))


class BlockWorld(NamedTuple):
    """Static spec of movable blocks (maze_env.py:563-633): axis-aligned
    boxes with slide-x/slide-y joints (unlimited for plain push blocks),
    mass 2e-4, no damping and no floor friction (the box-plane contact sits
    at dist exactly 0 and is excluded, probed: a free block glides at
    constant velocity).

    Falling blocks (round-5, maze_env.py:574-586 + 635-648) additionally
    carry a slide-z joint: mass 0.001, shrink 0.99, LIMITED x/y ranges
    (±size_scaling) and z range (−height_offset, 0) — joint-coordinate
    limits in ``lim``.  The z dof sees gravity, the unconditional z ≥ 0
    floor-support impedance (the reference's global floor plane extends
    under chasm cells, so blocks slide with bottom on the floor — see
    envs/env.py engine note), and its joint limits; supports/limits are
    applied from the unconstrained acceleration, independent of the
    contact Newton solve (engine extra_qfrc parity).  Spinning blocks stay
    on the approximate path."""

    half: jnp.ndarray      # (Bk, 3) half extents
    mass: jnp.ndarray      # (Bk,)
    body_pos: jnp.ndarray  # (Bk, 3) body origins
    has_x: Tuple[bool, ...]   # static per-block dof flags
    has_y: Tuple[bool, ...]
    has_z: Tuple[bool, ...] = ()
    # per block: None, or joint-coordinate limit ranges
    # ((xlo, xhi) | None, (ylo, yhi) | None, (zlo, zhi) | None)
    lim: Tuple = ()

    @property
    def nb(self) -> int:
        return self.half.shape[0]

    @property
    def ndof(self) -> int:
        hz = self.has_z or (False,) * self.nb
        return sum(int(x) + int(y) + int(z)
                   for x, y, z in zip(self.has_x, self.has_y, hz))


def block_world_from_structure(ms, dtype=jnp.float64, allow_z: bool = False):
    """BlockWorld from a maze structure; returns None if any movable block
    needs spin dofs — or z dofs unless ``allow_z`` (the reduced object
    solve models those; the coupled f64 replica keeps the approximate
    path for them)."""
    specs = list(ms.movable_blocks)
    if not specs:
        return None
    for b in specs:
        if b.spin or (b.move_z and not allow_z):
            return None
    lims = []
    for b in specs:
        if b.falling:
            lims.append((
                (-float(b.xy_range), float(b.xy_range)) if b.move_x else None,
                (-float(b.xy_range), float(b.xy_range)) if b.move_y else None,
                (float(b.z_range[0]), float(b.z_range[1]))
                if b.move_z else None,
            ))
        else:
            lims.append(None)
    return BlockWorld(
        half=jnp.asarray(np.asarray([b.size for b in specs]), dtype).reshape(-1, 3),
        mass=jnp.asarray(np.asarray([b.mass for b in specs]), dtype),
        body_pos=jnp.asarray(np.asarray([b.pos for b in specs]), dtype).reshape(-1, 3),
        has_x=tuple(bool(b.move_x) for b in specs),
        has_y=tuple(bool(b.move_y) for b in specs),
        has_z=tuple(bool(b.move_z) for b in specs),
        lim=tuple(lims),
    )


class _BallCon(NamedTuple):
    pos: jnp.ndarray
    n: jnp.ndarray
    nz: jnp.ndarray
    pen: jnp.ndarray
    active: jnp.ndarray
    zmult: jnp.ndarray


def _sphere_vs_boxes_r(boxes: WallBoxes, xy, radius, z_c):
    """Sphere of ``radius`` at height ``z_c`` vs wall boxes (shallow +
    deep nearest-face cases, as :func:`_sphere_vs_boxes`)."""
    cx, cy, cz = xy[0], xy[1], z_c
    lo = boxes.c - boxes.h
    hi = boxes.c + boxes.h
    qx = jnp.clip(cx, lo[:, 0], hi[:, 0])
    qy = jnp.clip(cy, lo[:, 1], hi[:, 1])
    qz = jnp.clip(cz, lo[:, 2], hi[:, 2])
    dx, dy, dz = cx - qx, cy - qy, cz - qz
    d2 = dx * dx + dy * dy + dz * dz
    outside = d2 > 1e-24
    dist_out = jnp.sqrt(jnp.maximum(d2, 1e-24))
    pen_out = radius - dist_out
    n_out = jnp.stack([dx, dy, dz], -1) / dist_out[:, None]
    t_out = radius + (dist_out - radius) * 0.5
    pos_out = jnp.stack([cx - n_out[:, 0] * t_out,
                         cy - n_out[:, 1] * t_out], -1)
    depths = jnp.stack([cx - lo[:, 0], hi[:, 0] - cx,
                        cy - lo[:, 1], hi[:, 1] - cy,
                        cz - lo[:, 2], hi[:, 2] - cz], -1)
    face = jnp.argmin(depths, -1)
    fdepth = jnp.min(depths, -1)
    face_n = jnp.asarray(
        [[-1.0, 0, 0], [1, 0, 0], [0, -1, 0], [0, 1, 0], [0, 0, -1], [0, 0, 1]],
        xy.dtype)
    n_in = face_n[face]
    pen_in = fdepth + radius
    t_in = radius - pen_in * 0.5
    pos_in = jnp.stack([cx - n_in[:, 0] * t_in, cy - n_in[:, 1] * t_in], -1)
    pen = jnp.where(outside, pen_out, pen_in)
    n3 = jnp.where(outside[:, None], n_out, n_in)
    pos = jnp.where(outside[:, None], pos_out, pos_in)
    active = (pen > 0.0) & (boxes.mask > 0.0)
    return _BallCon(pos=pos, n=n3[:, :2], nz=n3[:, 2], pen=pen,
                    active=active, zmult=jnp.ones_like(pen))


def _aabb_vs_boxes_z3(center3, half3, boxes: WallBoxes):
    """3-axis SAT for a moving box with a z dof (falling blocks).

    Extends :func:`_aabb_vs_boxes` (xy-only SAT — correct for same-height
    push blocks) with the z axis: where the z overlap is the SAT minimum
    (a falling block perched on / popping out of its platform box,
    maze_env.py:578-586 — the block is synthesized overlapping the
    platform and MuJoCo's box-box contact pushes it on top), the xy rows
    deactivate and a ±z parallel-face row takes over with multiplicity 4
    (MuJoCo emits the 4 face-rectangle corners at equal penetration).
    Returns (xy_rows, z_rows) as _BallCon-shaped candidates."""
    base = _aabb_vs_boxes(center3, half3, boxes)
    d = center3[None, :2] - boxes.c[:, :2]
    ox = boxes.h[:, 0] + half3[0] - jnp.abs(d[:, 0])
    oy = boxes.h[:, 1] + half3[1] - jnp.abs(d[:, 1])
    dz = center3[2] - boxes.c[:, 2]
    oz = boxes.h[:, 2] + half3[2] - jnp.abs(dz)
    overlap = (ox > 0.0) & (oy > 0.0) & (oz > 0.0) & (boxes.mask > 0.0)
    z_wins = (oz <= ox) & (oz <= oy)
    xy = base._replace(
        active=base.active & ~jnp.concatenate([z_wins, z_wins], 0))
    sz = jnp.sign(jnp.where(dz == 0.0, 1.0, dz))
    W = boxes.c.shape[0]
    dtype = center3.dtype
    zr = _BallCon(
        pos=jnp.broadcast_to(center3[None, :2], (W, 2)),
        n=jnp.zeros((W, 2), dtype), nz=sz.astype(dtype),
        pen=oz, active=overlap & z_wins,
        zmult=jnp.full((W,), 4.0, dtype))
    return xy, zr


def object_forward(p: PointWorldParams, boxes: WallBoxes, balls, blocks,
                   rq3, rv3, q, v, floor_always: bool = False):
    """qacc of the object dofs with the ROBOT PRESCRIBED (kinematic).

    The float32 production path's object model (round-4): the same contact
    rows as :func:`forward_world` — robot-sphere/arrow vs ball/block, object
    vs walls, floor switch, object-object pairs, identical derived
    impedance/solref constants — but the Newton solve is restricted to the
    object dofs.  Objects are near-massless (ball 1e-4*r^3, block 2e-4,
    maze_env.py:509,602), so the robot's reaction is ~0 (probed: robot dv
    < 1e-4 across the strike table, tools/probe_f32_objects.py) and the
    reduction is behaviorally exact while staying cheap and dtype-generic.

    ``rq3``/``rv3`` are the robot's (x, y, th) pose and velocity; the robot
    columns of the pair jacobians still feed the aref damping terms (the
    relative contact velocity), then are dropped from the decision space.
    """
    B = balls.nb if balls is not None else 0
    Bk = blocks.nb if blocks is not None else 0
    blk_has_z = (blocks.has_z or (False,) * Bk) if blocks is not None else ()
    blk_base = 3 + 3 * B
    blk_cols = []
    off = blk_base
    for k in range(Bk):
        cols = {}
        if blocks.has_x[k]:
            cols["x"] = off
            off += 1
        if blocks.has_y[k]:
            cols["y"] = off
            off += 1
        if blk_has_z[k]:
            cols["z"] = off
            off += 1
        blk_cols.append(cols)
    nd = off
    nobj = nd - 3
    dtype = q.dtype
    th = rq3[2]
    xy = rq3[:2]
    # full-layout state: robot dofs prepended so every forward_world row
    # builder applies verbatim; only the solve is restricted to [3:].
    qf = jnp.concatenate([rq3, q])
    vf = jnp.concatenate([rv3, v])

    M = jnp.zeros((nobj, nobj), dtype)
    for i in range(B):
        o = 3 * i
        M = M.at[o, o].set(balls.mass[i])
        M = M.at[o + 1, o + 1].set(balls.mass[i])
        M = M.at[o + 2, o + 2].set(balls.inertia[i])
    for k in range(Bk):
        for c in blk_cols[k].values():
            M = M.at[c - 3, c - 3].set(blocks.mass[k])
    a0 = jnp.zeros((nobj,), dtype)
    # gravity on falling-block z dofs (the only dofs gravity projects onto)
    for k in range(Bk):
        if blk_has_z[k]:
            a0 = a0.at[blk_cols[k]["z"] - 3].set(jnp.asarray(-9.81, dtype))

    invw_r = p.invw_t
    rows = []
    pad = lambda j3: jnp.pad(j3, ((0, 0), (0, nd - 3)))
    bb_dmin, bb_dmax, bb_width = 0.9, 0.99, 0.001

    for i in range(B):
        o = 3 + 3 * i
        invw_b = 2.0 / (3.0 * balls.mass[i])
        ctr = balls.body_pos[i] + jnp.stack([qf[o], qf[o + 1]])
        thb = qf[o + 2]
        r_b = balls.r[i]
        padb = lambda j3, o=o: jnp.zeros(
            (j3.shape[0], nd), dtype).at[:, o:o + 3].set(j3)

        bw = _sphere_vs_boxes_r(boxes, ctr, r_b, r_b)
        bn3, bt1, bt2 = _make_frame(bw.n, bw.nz)
        rows.append(_pyramid_rows(
            p, padb(_body_jac3(bn3, bw.pos, ctr)),
            padb(_body_jac3(bt1, bw.pos, ctr)),
            padb(_body_jac3(bt2, bw.pos, ctr)),
            bw.pen, vf, bw.active, bw.zmult,
            p.dmin, p.dmax, p.width, invw_b, p.mu))

        # MuJoCo's floor switch is an ulp-level rounding artifact of the
        # hinge quaternion (see :func:`_floor_switch`): pseudo-randomly
        # active for generic angles, inactive at th = 0.  It does not
        # replicate in float32, so the production path takes the dominant
        # branch deterministically (always active — a struck ball carries
        # a generic angle and the probe shows ~every step active there,
        # tools/probe_f32_objects.py); the float64 fidelity path keeps the
        # bit-exact predicate.
        if floor_always:
            fact = jnp.ones((), jnp.bool_)
            fpen = jnp.asarray(2.0 ** -54, dtype)
        else:
            fact, fpen = _floor_switch(thb)
        fn3 = jnp.asarray([[0.0, 0.0, 1.0]], dtype)
        ft1 = jnp.asarray([[0.0, 1.0, 0.0]], dtype)
        ft2 = jnp.asarray([[-1.0, 0.0, 0.0]], dtype)
        mkj = lambda d: padb(_body_jac3(d, ctr[None, :], ctr))
        rows.append(_pyramid_rows(
            p, mkj(fn3), mkj(ft1), mkj(ft2), fpen[None],
            vf, fact[None], jnp.ones((1,), dtype),
            p.f_dmin, p.f_dmax, p.f_width, invw_b, p.mu))

        d3 = jnp.stack([ctr[0] - xy[0], ctr[1] - xy[1],
                        r_b - p.sphere_z])
        dist3 = jnp.sqrt(jnp.sum(d3 * d3) + 1e-30)
        nrm = d3 / dist3
        pen_rb = (p.sphere_r + r_b) - dist3
        t_mid = p.sphere_r + (dist3 - p.sphere_r - r_b) * 0.5
        pos_rb = xy + nrm[:2] * t_mid
        rn3, rt1, rt2 = _make_frame(nrm[None, :2], nrm[None, 2])
        jfun = lambda d: (padb(_body_jac3(d, pos_rb[None, :], ctr))
                          - pad(_body_jac3(d, pos_rb[None, :], xy)))
        rows.append(_pyramid_rows(
            p, jfun(rn3), jfun(rt1), jfun(rt2), pen_rb[None], vf,
            (pen_rb > 0.0)[None], jnp.ones((1,), dtype),
            bb_dmin, bb_dmax, bb_width, invw_r + invw_b, p.mu))

        ct, st = jnp.cos(th), jnp.sin(th)
        u = jnp.stack([ct, st])
        w_ax = jnp.stack([-st, ct])
        ac = xy + u * p.arrow_off
        rel = ctr - ac
        bx, by = rel @ u, rel @ w_ax
        bz = r_b - 0.5 * (p.arrow_z_lo + p.arrow_z_hi)
        hx, hy = p.arrow_half_l, p.arrow_half_w
        hz = 0.5 * (p.arrow_z_hi - p.arrow_z_lo)
        cx = jnp.clip(bx, -hx, hx)
        cy = jnp.clip(by, -hy, hy)
        cz = jnp.clip(bz, -hz, hz)
        ddx, ddy, ddz = bx - cx, by - cy, bz - cz
        dd2 = ddx * ddx + ddy * ddy + ddz * ddz
        dl = jnp.sqrt(jnp.maximum(dd2, 1e-30))
        pen_ab = r_b - dl
        nf = jnp.stack([ddx, ddy, ddz]) / dl
        n_world = jnp.stack([
            nf[0] * u[0] + nf[1] * w_ax[0],
            nf[0] * u[1] + nf[1] * w_ax[1],
            nf[2],
        ])
        t_ab = r_b + (dl - r_b) * 0.5
        pos_ab = ctr - n_world[:2] * t_ab
        an3, at1, at2 = _make_frame(n_world[None, :2], n_world[None, 2])
        jfun_a = lambda d: (padb(_body_jac3(d, pos_ab[None, :], ctr))
                            - pad(_body_jac3(d, pos_ab[None, :], xy)))
        rows.append(_pyramid_rows(
            p, jfun_a(an3), jfun_a(at1), jfun_a(at2), pen_ab[None], vf,
            (pen_ab > 0.0)[None], jnp.ones((1,), dtype),
            bb_dmin, bb_dmax, bb_width, invw_r + invw_b, p.mu))

        for jprev in range(i):
            o2 = 3 + 3 * jprev
            ctr2 = balls.body_pos[jprev] + jnp.stack([qf[o2], qf[o2 + 1]])
            r2 = balls.r[jprev]
            d3b = jnp.stack([ctr[0] - ctr2[0], ctr[1] - ctr2[1], r_b - r2])
            distb = jnp.sqrt(jnp.sum(d3b * d3b) + 1e-30)
            nb = d3b / distb
            pen_bb = (r_b + r2) - distb
            pos_bb = ctr2 + nb[:2] * (r2 + (distb - r2 - r_b) * 0.5)
            bn, bt1b, bt2b = _make_frame(nb[None, :2], nb[None, 2])
            padb2 = lambda j3, o2=o2: jnp.zeros(
                (j3.shape[0], nd), dtype).at[:, o2:o2 + 3].set(j3)
            jf = lambda d: (padb(_body_jac3(d, pos_bb[None, :], ctr))
                            - padb2(_body_jac3(d, pos_bb[None, :], ctr2)))
            invw_b2 = 2.0 / (3.0 * balls.mass[jprev])
            rows.append(_pyramid_rows(
                p, jf(bn), jf(bt1b), jf(bt2b), pen_bb[None], vf,
                (pen_bb > 0.0)[None], jnp.ones((1,), dtype),
                bb_dmin, bb_dmax, bb_width, invw_b + invw_b2, p.mu))

    blw_dmin, blw_dmax, blw_width = 0.995, 0.995, 0.01
    blk_ctr = []
    for k in range(Bk):
        cols = blk_cols[k]
        dx = qf[cols["x"]] if "x" in cols else jnp.zeros((), dtype)
        dy = qf[cols["y"]] if "y" in cols else jnp.zeros((), dtype)
        dz = qf[cols["z"]] if "z" in cols else jnp.zeros((), dtype)
        blk_ctr.append(blocks.body_pos[k] + jnp.stack([dx, dy, dz]))

    def blk_jac(k, d3, pos_xy):
        cols = blk_cols[k]
        out = jnp.zeros((d3.shape[0], nd), dtype)
        if "x" in cols:
            out = out.at[:, cols["x"]].set(d3[:, 0])
        if "y" in cols:
            out = out.at[:, cols["y"]].set(d3[:, 1])
        if "z" in cols:
            out = out.at[:, cols["z"]].set(d3[:, 2])
        return out

    for k in range(Bk):
        ctr3 = blk_ctr[k]
        one_box = WallBoxes(c=ctr3[None, :], h=blocks.half[k][None, :],
                            mask=jnp.ones((1,), dtype))
        invw_k = 1.0 / blocks.mass[k]

        sb = _sphere_vs_boxes_r(one_box, xy, p.sphere_r, p.sphere_z)
        sn3, st1, st2 = _make_frame(sb.n, sb.nz)
        jf = lambda d, con=sb, kk=k: (
            pad(_body_jac3(d, con.pos, xy)) - blk_jac(kk, d, con.pos))
        rows.append(_pyramid_rows(
            p, jf(sn3), jf(st1), jf(st2), sb.pen, vf, sb.active, sb.zmult,
            p.dmin, p.dmax, p.width, invw_r + invw_k, p.mu))

        ab = _arrow_vs_boxes(p, one_box, xy, th)
        an3, at1, at2 = _make_frame(ab.n, ab.nz)
        jfa = lambda d, con=ab, kk=k: (
            pad(_body_jac3(d, con.pos, xy)) - blk_jac(kk, d, con.pos))
        rows.append(_pyramid_rows(
            p, jfa(an3), jfa(at1), jfa(at2), ab.pen, vf, ab.active, ab.zmult,
            p.dmin, p.dmax, p.width, invw_r + invw_k, p.mu))

        if blk_has_z[k]:
            bwc, bwz = _aabb_vs_boxes_z3(ctr3, blocks.half[k], boxes)
            zn3, zt1, zt2 = _make_frame(bwz.n, bwz.nz)
            jfz = lambda d, con=bwz, kk=k: blk_jac(kk, d, con.pos)
            rows.append(_pyramid_rows(
                p, jfz(zn3), jfz(zt1), jfz(zt2), bwz.pen, vf, bwz.active,
                bwz.zmult, blw_dmin, blw_dmax, blw_width, invw_k, p.mu))
        else:
            bwc = _aabb_vs_boxes(ctr3, blocks.half[k], boxes)
        bn3, bt1, bt2 = _make_frame(bwc.n, bwc.nz)
        jfw = lambda d, con=bwc, kk=k: blk_jac(kk, d, con.pos)
        rows.append(_pyramid_rows(
            p, jfw(bn3), jfw(bt1), jfw(bt2), bwc.pen, vf, bwc.active,
            bwc.zmult, blw_dmin, blw_dmax, blw_width, invw_k, p.mu))

        for kp in range(k):
            other = WallBoxes(c=blk_ctr[kp][None, :],
                              h=blocks.half[kp][None, :],
                              mask=jnp.ones((1,), dtype))
            bb = _aabb_vs_boxes(ctr3, blocks.half[k], other)
            nb3, tb1, tb2 = _make_frame(bb.n, bb.nz)
            jfb = lambda d, con=bb, kk=k, ko=kp: (
                blk_jac(kk, d, con.pos) - blk_jac(ko, d, con.pos))
            rows.append(_pyramid_rows(
                p, jfb(nb3), jfb(tb1), jfb(tb2), bb.pen, vf, bb.active,
                bb.zmult, blw_dmin, blw_dmax, blw_width,
                invw_k + 1.0 / blocks.mass[kp], p.mu))

        for i in range(B):
            o = 3 + 3 * i
            bctr = balls.body_pos[i] + jnp.stack([qf[o], qf[o + 1]])
            blb = _sphere_vs_boxes_r(one_box, bctr, balls.r[i], balls.r[i])
            ln3, lt1, lt2 = _make_frame(blb.n, blb.nz)
            padb_i = lambda j3, o=o: jnp.zeros(
                (j3.shape[0], nd), dtype).at[:, o:o + 3].set(j3)
            jfl = lambda d, con=blb, kk=k, o=o, bctr=bctr: (
                padb_i(_body_jac3(d, con.pos, bctr), o)
                - blk_jac(kk, d, con.pos))
            rows.append(_pyramid_rows(
                p, jfl(ln3), jfl(lt1), jfl(lt2), blb.pen, vf, blb.active,
                blb.zmult, p.dmin, p.dmax, p.width,
                2.0 / (3.0 * balls.mass[i]) + invw_k, p.mu))

        # falling blocks (round-5): box-bottom-vs-global-floor contact
        # (the plane extends under chasm cells) + soft joint limits —
        # resolved INSIDE the Newton solve, like MuJoCo, so the deep
        # platform-overlap perch (the reference block rides on top of its
        # own platform with the z limit softly violated) balances at the
        # same force equilibrium.
        if blk_has_z[k]:
            bottom = ctr3[2] - blocks.half[k][2]
            pen_f = -bottom
            one = jnp.ones((1,), dtype)
            fn3 = jnp.asarray([[0.0, 0.0, 1.0]], dtype)
            ft1 = jnp.asarray([[0.0, 1.0, 0.0]], dtype)
            ft2 = jnp.asarray([[-1.0, 0.0, 0.0]], dtype)
            jff = lambda d, kk=k: blk_jac(kk, d, None)
            rows.append(_pyramid_rows(
                p, jff(fn3), jff(ft1), jff(ft2), pen_f[None], vf,
                (pen_f > 0.0)[None], one,
                blw_dmin, blw_dmax, blw_width, invw_k, p.mu))
        if blocks.lim and blocks.lim[k] is not None:
            lim_margin = 0.01  # reference slide joints, maze_env.py:615-648
            for key, lim_ax in zip("xyz", blocks.lim[k]):
                if key not in blk_cols[k] or lim_ax is None:
                    continue
                c = blk_cols[k][key]
                qd = qf[c]
                lo, hi = lim_ax
                for sgn, pen_l in ((1.0, (lo + lim_margin) - qd),
                                   (-1.0, qd - (hi - lim_margin))):
                    jrow = jnp.zeros((1, nd), dtype).at[0, c].set(
                        jnp.asarray(sgn, dtype))
                    rows.append(_rows1(
                        p, jrow, pen_l[None], vf, (pen_l > 0.0)[None],
                        0.9, 0.95, 0.001, invw_k))

    J = jnp.concatenate([r.J for r in rows], 0)[:, 3:]  # drop robot cols
    aref = jnp.concatenate([r.aref for r in rows], 0)
    rinv = jnp.concatenate([r.rinv for r in rows], 0)
    any_active = jnp.any(rinv > 0.0)
    qacc = _solve_newton(p, M, a0, J, aref, rinv,
                         precondition=dtype != jnp.float64)
    return jnp.where(any_active, qacc, a0)


def rk4_object_step(p: PointWorldParams, boxes: WallBoxes, balls, blocks,
                    rq3, rv3, q, v, floor_always: bool = False):
    """One RK4 env step of the object dofs with the robot kinematic.

    The robot pose advances at its prescribed velocity through the stages —
    exactly the swept-contact sampling the full engine performs (the strike
    penetration evolves within the step, so a teleporting robot transfers
    the impedance-integrated impulse, not a single-sample kick)."""
    h = jnp.asarray(p.dt, q.dtype)
    A = (0.5, 0.5, 1.0)
    B = (1.0 / 6.0, 1.0 / 3.0, 1.0 / 3.0, 1.0 / 6.0)
    fa = floor_always
    vs = [v]
    accs = [object_forward(p, boxes, balls, blocks, rq3, rv3, q, v,
                           floor_always=fa)]
    for a in A:
        qi = q + a * h * vs[-1]
        vi = v + a * h * accs[-1]
        rqi = rq3 + a * h * rv3
        vs.append(vi)
        accs.append(object_forward(p, boxes, balls, blocks, rqi, rv3, qi, vi,
                                   floor_always=fa))
    qf = q + h * sum(b * vi for b, vi in zip(B, vs[:4]))
    vf = v + h * sum(b * ai for b, ai in zip(B, accs))
    return qf, vf


def rk4_step_world(p: PointWorldParams, boxes: WallBoxes, balls,
                   q, v, blocks=None):
    """RK4 ``mj_step`` replica over the composed robot+balls+blocks world."""
    h = jnp.asarray(p.dt, q.dtype)
    A = (0.5, 0.5, 1.0)
    B = (1.0 / 6.0, 1.0 / 3.0, 1.0 / 3.0, 1.0 / 6.0)
    vs = [v]
    accs = [forward_world(p, boxes, balls, q, v, blocks)]
    for a in A:
        qi = q + a * h * vs[-1]
        vi = v + a * h * accs[-1]
        vs.append(vi)
        accs.append(forward_world(p, boxes, balls, qi, vi, blocks))
    qf = q + h * sum(b * vi for b, vi in zip(B, vs[:4]))
    vf = v + h * sum(b * ai for b, ai in zip(B, accs))
    return qf, vf
