"""Scalar-component ant dynamics (lane-friendly, Pallas-compatible).

Specialization of the generic engine for the ant topology: free-root torso
+ 4 legs × (hip z-hinge, ankle diagonal-hinge), all math expressed over
per-env lane vectors (no small-matrix ops, no gathers) so it runs inside a
Pallas kernel with the batch on lanes.

Conventions identical to physics/engine.py (MuJoCo parity): free-joint qvel
is (linear world, angular body-frame); quaternions (w,x,y,z); hinges
pre-multiply the accumulated world rotation.  Every stage is differentially
validated against the generic engine in tests/test_ant_fast.py.

State layout: q = (x, y, z, qw, qx, qy, qz, h1, a1, h2, a2, h3, a3, h4, a4)
             v = (vx, vy, vz, wx, wy, wz, ḣ1, ȧ1, ..., ḣ4, ȧ4)
Leg l ∈ {1..4} has aux offset d_l = (±0.2, ±0.2, 0) and ankle axis
(∓1, ±1, 0)/√2 (ant.xml parity; see models/ant.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .swimmer_math import (  # generic n×n unrolled lane Cholesky
    _chol5_solve as chol_solve,
    _chol_factor as chol_factor,
    _chol_inv_columns as chol_inv_columns,
    _chol_resolve as chol_resolve,
)

SQRT2INV = 1.0 / np.sqrt(2.0)


# Trace-time constant folding (see ops/_fold.py): floor-row normals are
# exactly (0,0,1) with constant tangent frames, linear-dof Jacobian entries
# are basis vectors, body inertias are model constants — the contact
# machinery dominated the round-4 instruction count (~145K of 187K traced
# ops in row assembly + the Jacobi solver), and much of it folds.
from ._fold import cadd, cdiv, cmul, cneg, csub, is_const

# (sx, sy) per leg, ankle axis (ax, ay) unnormalized — models/ant.py legs
LEGS = [
    (+1.0, +1.0, -1.0, +1.0),
    (-1.0, +1.0, +1.0, +1.0),
    (-1.0, -1.0, -1.0, +1.0),
    (+1.0, -1.0, +1.0, +1.0),
]


class AntConsts(NamedTuple):
    """Static per-body constants from the built RigidModel."""

    masses: np.ndarray        # (13,)
    coms: np.ndarray          # (13, 3) body-frame com
    inertias: np.ndarray      # (13, 3, 3) about com, body frame
    armature: np.ndarray      # (14,)
    damping: np.ndarray       # (14,)
    hip_range: tuple          # (lo, hi) radians
    ankle_ranges: np.ndarray  # (4, 2)
    gear: float
    ctrl_hi: float
    act_dofadr: tuple         # ctrl index → dof (reference actuator order)
    timestep: float
    gravity: float


def consts_from_model(model) -> AntConsts:
    return AntConsts(
        masses=np.asarray(model.body_mass, np.float64),
        coms=np.asarray(model.body_com, np.float64),
        inertias=np.asarray(model.body_inertia, np.float64),
        armature=np.asarray(model.dof_armature, np.float64),
        damping=np.asarray(model.dof_damping, np.float64),
        hip_range=tuple(model.jnt_range[1]),
        ankle_ranges=np.asarray(
            [model.jnt_range[2 + 2 * l] for l in range(4)], np.float64
        ),
        gear=float(model.act_gear[0]),
        ctrl_hi=float(model.act_ctrlrange[0][1]),
        act_dofadr=tuple(int(a) for a in model.act_dofadr),
        timestep=float(model.timestep),
        gravity=9.81,
    )


class Vec3(NamedTuple):
    """Lane-scalar 3-vector; components may be python floats (trace-time
    constants) — all operations fold them via cmul/cadd."""

    x: object
    y: object
    z: object

    def __add__(self, o):
        return Vec3(cadd(self.x, o.x), cadd(self.y, o.y), cadd(self.z, o.z))

    def __sub__(self, o):
        return Vec3(csub(self.x, o.x), csub(self.y, o.y), csub(self.z, o.z))

    def scale(self, s):
        return Vec3(cmul(self.x, s), cmul(self.y, s), cmul(self.z, s))

    def dot(self, o):
        return cadd(cadd(cmul(self.x, o.x), cmul(self.y, o.y)),
                    cmul(self.z, o.z))

    def cross(self, o):
        return Vec3(
            csub(cmul(self.y, o.z), cmul(self.z, o.y)),
            csub(cmul(self.z, o.x), cmul(self.x, o.z)),
            csub(cmul(self.x, o.y), cmul(self.y, o.x)),
        )


class Mat3(NamedTuple):
    """Row-major 3x3 of lane scalars."""

    xx: object; xy: object; xz: object
    yx: object; yy: object; yz: object
    zx: object; zy: object; zz: object

    def mul_vec(self, v: Vec3) -> Vec3:
        return Vec3(
            cadd(cadd(cmul(self.xx, v.x), cmul(self.xy, v.y)),
                 cmul(self.xz, v.z)),
            cadd(cadd(cmul(self.yx, v.x), cmul(self.yy, v.y)),
                 cmul(self.yz, v.z)),
            cadd(cadd(cmul(self.zx, v.x), cmul(self.zy, v.y)),
                 cmul(self.zz, v.z)),
        )

    def tmul_vec(self, v: Vec3) -> Vec3:
        return Vec3(
            cadd(cadd(cmul(self.xx, v.x), cmul(self.yx, v.y)),
                 cmul(self.zx, v.z)),
            cadd(cadd(cmul(self.xy, v.x), cmul(self.yy, v.y)),
                 cmul(self.zy, v.z)),
            cadd(cadd(cmul(self.xz, v.x), cmul(self.yz, v.y)),
                 cmul(self.zz, v.z)),
        )

    def mul(self, o: "Mat3") -> "Mat3":
        a = self
        return Mat3(*[
            cadd(cadd(cmul(ar[0], oc[0]), cmul(ar[1], oc[1])),
                 cmul(ar[2], oc[2]))
            for ar in ((a.xx, a.xy, a.xz), (a.yx, a.yy, a.yz),
                       (a.zx, a.zy, a.zz))
            for oc in ((o.xx, o.yx, o.zx), (o.xy, o.yy, o.zy),
                       (o.xz, o.yz, o.zz))
        ])

    def col(self, j: int) -> Vec3:
        return (
            Vec3(self.xx, self.yx, self.zx),
            Vec3(self.xy, self.yy, self.zy),
            Vec3(self.xz, self.yz, self.zz),
        )[j]


def quat_to_mat3(qw, qx, qy, qz) -> Mat3:
    return Mat3(
        1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qw * qz), 2 * (qx * qz + qw * qy),
        2 * (qx * qy + qw * qz), 1 - 2 * (qx * qx + qz * qz), 2 * (qy * qz - qw * qx),
        2 * (qx * qz - qw * qy), 2 * (qy * qz + qw * qx), 1 - 2 * (qx * qx + qy * qy),
    )


def axis_angle_mat3(axis: Vec3, angle) -> Mat3:
    """Rodrigues rotation about a unit axis (lane scalars)."""
    c = jnp.cos(angle)
    s = jnp.sin(angle)
    t = 1.0 - c
    x, y, z = axis.x, axis.y, axis.z
    return Mat3(
        c + t * x * x, t * x * y - s * z, t * x * z + s * y,
        t * x * y + s * z, c + t * y * y, t * y * z - s * x,
        t * x * z - s * y, t * y * z + s * x, c + t * z * z,
    )


class AntFK(NamedTuple):
    """World poses + joint axes/anchors; body order matches models/ant.py:
    0 torso, then per leg l: (1+3l) legB, (2+3l) aux, (3+3l) foot."""

    R: list          # 13 × Mat3
    pos: list        # 13 × Vec3
    com: list        # 13 × Vec3 (world com)
    hip_axis: list   # 4 × Vec3 (world)
    hip_anchor: list     # 4 × Vec3
    ankle_axis: list     # 4 × Vec3
    ankle_anchor: list   # 4 × Vec3


def fk_ant(ac: AntConsts, q) -> AntFK:
    """q: tuple of 15 lane scalars."""
    x, y, z, qw, qx, qy, qz = q[:7]
    R0 = quat_to_mat3(qw, qx, qy, qz)
    p0 = Vec3(x, y, z)
    R = [R0]
    pos = [p0]
    hip_axis, hip_anchor, ankle_axis, ankle_anchor = [], [], [], []
    for l, (sx, sy, ax_, ay_) in enumerate(LEGS):
        h = q[7 + 2 * l]
        a = q[8 + 2 * l]
        d = Vec3(0.2 * sx, 0.2 * sy, 0.0)  # trace-time const, folds in FK
        # leg body: welded to torso (identity offset)
        R.append(R0)
        pos.append(p0)
        # aux body: offset d in torso frame, hip hinge about torso z-axis
        anchor_h = p0 + R0.mul_vec(d)
        w_h = R0.col(2)
        Rh = axis_angle_mat3(w_h, h)
        R_aux = Rh.mul(R0)
        p_aux = anchor_h  # jnt_pos = 0 → body origin is the anchor
        R.append(R_aux)
        pos.append(p_aux)
        # foot body: offset d in aux frame, ankle hinge about (ax, ay, 0)/√2
        anchor_a = p_aux + R_aux.mul_vec(d)
        axis_local = Vec3(ax_ * SQRT2INV, ay_ * SQRT2INV, 0.0)
        w_a = R_aux.mul_vec(axis_local)
        Ra = axis_angle_mat3(w_a, a)
        R_foot = Ra.mul(R_aux)
        p_foot = anchor_a
        R.append(R_foot)
        pos.append(p_foot)
        hip_axis.append(w_h)
        hip_anchor.append(anchor_h)
        ankle_axis.append(w_a)
        ankle_anchor.append(anchor_a)
    com = []
    for k in range(13):
        c = ac.coms[k]
        cl = Vec3(float(c[0]), float(c[1]), float(c[2]))
        com.append(pos[k] + R[k].mul_vec(cl))
    return AntFK(R, pos, com, hip_axis, hip_anchor, ankle_axis, ankle_anchor)


# body index helpers
def _leg_bodies(l: int):
    return (1 + 3 * l, 2 + 3 * l, 3 + 3 * l)  # legB (welded), aux, foot


def _dofs_of_body(k: int):
    """dofs (v-layout) moving body k: free 0-5 always; leg dofs as below."""
    dofs = [0, 1, 2, 3, 4, 5]
    if k == 0:
        return dofs
    l = (k - 1) // 3
    kind = (k - 1) % 3
    if kind >= 1:
        dofs.append(6 + 2 * l)      # hip moves aux + foot
    if kind == 2:
        dofs.append(7 + 2 * l)      # ankle moves foot
    return dofs


def _zero3(like):
    return Vec3(0.0, 0.0, 0.0)


_EX = Vec3(1.0, 0.0, 0.0)
_EY = Vec3(0.0, 1.0, 0.0)
_EZ = Vec3(0.0, 0.0, 1.0)


def body_dof_jacobians(fk: AntFK, k: int, point: Vec3):
    """(W_d, J_d) per dof d for the velocity of ``point`` on body k.

    W_d: world angular basis (Vec3 or None); J_d: linear velocity basis.
    Linear-dof entries are trace-time constant basis vectors (fold in
    downstream dot products)."""
    out = {}
    R0 = fk.R[0]
    p0 = fk.pos[0]
    out[0] = (None, _EX)
    out[1] = (None, _EY)
    out[2] = (None, _EZ)
    rel0 = point - p0
    for j in range(3):
        w = R0.col(j)
        out[3 + j] = (w, w.cross(rel0))
    if k != 0:
        l = (k - 1) // 3
        kind = (k - 1) % 3
        if kind >= 1:
            w = fk.hip_axis[l]
            out[6 + 2 * l] = (w, w.cross(point - fk.hip_anchor[l]))
        if kind == 2:
            w = fk.ankle_axis[l]
            out[7 + 2 * l] = (w, w.cross(point - fk.ankle_anchor[l]))
    return out


def _world_inertia(ac: AntConsts, fk: AntFK, k: int) -> Mat3:
    """Iw = R Ic Rᵀ with Ic a trace-time constant Mat3 (zero entries of
    the model inertia fold out of both mat muls)."""
    Ic = ac.inertias[k]
    R = fk.R[k]
    Icm = Mat3(*[float(Ic[r, c]) for r in range(3) for c in range(3)])
    return R.mul(Icm).mul(
        Mat3(R.xx, R.yx, R.zx, R.xy, R.yy, R.zy, R.xz, R.yz, R.zz)
    )


def mass_matrix(ac: AntConsts, fk: AntFK):
    """14x14 list-of-lists of lane scalars (Jacobian form).  Entries may be
    python floats (trace-time constants — e.g. the linear-linear block is
    the constant total mass)."""
    n = 14
    M = [[0.0] * n for _ in range(n)]
    for k in range(13):
        m = float(ac.masses[k])
        Iw = _world_inertia(ac, fk, k)
        jac = body_dof_jacobians(fk, k, fk.com[k])
        dofs = _dofs_of_body(k)
        cache = {}
        for d in dofs:
            W, J = jac[d]
            IwW = Iw.mul_vec(W) if W is not None else None
            cache[d] = (W, J, IwW)
        for ii, d1 in enumerate(dofs):
            W1, J1, IwW1 = cache[d1]
            for d2 in dofs[ii:]:
                W2, J2, _ = cache[d2]
                term = cmul(J1.dot(J2), m)
                if W1 is not None and W2 is not None:
                    term = cadd(term, W2.dot(IwW1))
                lo, hi = min(d1, d2), max(d1, d2)
                M[lo][hi] = cadd(M[lo][hi], term)
    for i in range(n):
        M[i][i] = cadd(M[i][i], float(ac.armature[i]))
        for j in range(i):
            M[i][j] = M[j][i]
    return M


def _motion_cross(w1: Vec3, v1: Vec3, w2: Vec3, v2: Vec3):
    """Spatial motion cross [(w1,v1) ×ₘ (w2,v2)] (engine parity):
    (w1×w2, w1×v2 + v1×w2), with trace-time constants folding."""
    return (w1.cross(w2), w1.cross(v2) + v1.cross(w2))


def rne_bias(ac: AntConsts, fk: AntFK, v):
    """qfrc_bias (gravity + velocity products), scalar port of
    physics/engine.py kin_dyn + rne_bias for the ant topology."""
    like = fk.pos[0].x
    zero3 = _zero3(like)
    vx, vy, vz, wx, wy, wz = v[:6]
    R0 = fk.R[0]
    p0 = fk.pos[0]

    # cdof rows (world origin): (omega_dir, vel_dir); linear rows are
    # trace-time constant basis vectors
    cdof = {}
    cdof[0] = (zero3, _EX)
    cdof[1] = (zero3, _EY)
    cdof[2] = (zero3, _EZ)
    for j in range(3):
        a = R0.col(j)
        cdof[3 + j] = (a, p0.cross(a))
    for l in range(4):
        a = fk.hip_axis[l]
        cdof[6 + 2 * l] = (a, fk.hip_anchor[l].cross(a))
        a = fk.ankle_axis[l]
        cdof[7 + 2 * l] = (a, fk.ankle_anchor[l].cross(a))

    # torso velocity + free-joint cdofdot (engine rules: lin rows zero;
    # angular rows use the body's FULL velocity)
    w_torso = zero3
    v_lin = Vec3(vx, vy, vz)
    for j in range(3):
        w_torso = w_torso + cdof[3 + j][0].scale(v[3 + j])
        v_lin = v_lin + cdof[3 + j][1].scale(v[3 + j])
    v_torso = (w_torso, v_lin)
    cdofdot = {0: (zero3, zero3), 1: (zero3, zero3), 2: (zero3, zero3)}
    for j in range(3):
        cdofdot[3 + j] = _motion_cross(*v_torso, *cdof[3 + j])
    # leg joints: cdofdot uses velocity BEFORE the joint (its parent body)
    body_vel = [v_torso]
    for l in range(4):
        hipd, ankd = 6 + 2 * l, 7 + 2 * l
        legb = v_torso
        cdofdot[hipd] = _motion_cross(*legb, *cdof[hipd])
        w_aux = legb[0] + cdof[hipd][0].scale(v[hipd])
        v_aux = (w_aux, legb[1] + cdof[hipd][1].scale(v[hipd]))
        cdofdot[ankd] = _motion_cross(*v_aux, *cdof[ankd])
        w_f = v_aux[0] + cdof[ankd][0].scale(v[ankd])
        v_foot = (w_f, v_aux[1] + cdof[ankd][1].scale(v[ankd]))
        body_vel.extend([legb, v_aux, v_foot])

    # cacc per body: a0 = (0, +g ẑ) [fictitious base acc], plus cdofdot·qdot
    g = float(ac.gravity)
    a0 = (zero3, Vec3(0.0, 0.0, g))
    cacc = [None] * 13
    torso_acc = a0
    for j in range(3):
        torso_acc = (
            torso_acc[0] + cdofdot[3 + j][0].scale(v[3 + j]),
            torso_acc[1] + cdofdot[3 + j][1].scale(v[3 + j]),
        )
    cacc[0] = torso_acc
    for l in range(4):
        hipd, ankd = 6 + 2 * l, 7 + 2 * l
        b = _leg_bodies(l)
        cacc[b[0]] = torso_acc
        aux_acc = (
            torso_acc[0] + cdofdot[hipd][0].scale(v[hipd]),
            torso_acc[1] + cdofdot[hipd][1].scale(v[hipd]),
        )
        cacc[b[1]] = aux_acc
        cacc[b[2]] = (
            aux_acc[0] + cdofdot[ankd][0].scale(v[ankd]),
            aux_acc[1] + cdofdot[ankd][1].scale(v[ankd]),
        )

    # spatial force per body: f = I a + v ×* (I v)
    def spatial_I_mul(k, mot):
        alpha, a_lin = mot
        m = float(ac.masses[k])
        c = fk.com[k]
        Iw = _world_inertia(ac, fk, k)
        # Io α = Iw α + m c × (c × α) ... Io = Iw − m c× c× (world, origin)
        IwA = Iw.mul_vec(alpha)
        moment = IwA - c.cross(c.cross(alpha)).scale(m) + c.cross(a_lin).scale(m)
        force = (a_lin - c.cross(alpha)).scale(m)
        return moment, force

    def force_cross(mot, frc):
        w, vl = mot
        mang, mlin = frc
        return (w.cross(mang) + vl.cross(mlin), w.cross(mlin))

    cfrc = []
    for k in range(13):
        Ia = spatial_I_mul(k, cacc[k])
        Iv = spatial_I_mul(k, body_vel[k])
        vxf = force_cross(body_vel[k], Iv)
        cfrc.append((Ia[0] + vxf[0], Ia[1] + vxf[1]))

    # subtree accumulation: foot→aux→legB, all→torso
    sub = [cfrc[k] for k in range(13)]
    for l in range(4):
        b = _leg_bodies(l)
        sub[b[1]] = (sub[b[1]][0] + sub[b[2]][0], sub[b[1]][1] + sub[b[2]][1])
        sub[b[0]] = (sub[b[0]][0] + sub[b[1]][0], sub[b[0]][1] + sub[b[1]][1])
        sub[0] = (sub[0][0] + sub[b[0]][0], sub[0][1] + sub[b[0]][1])

    bias = [None] * 14
    for d in range(6):
        wdir, vdir = cdof[d]
        bias[d] = cadd(wdir.dot(sub[0][0]), vdir.dot(sub[0][1]))
    for l in range(4):
        b = _leg_bodies(l)
        f_aux = (sub[b[1]][0], sub[b[1]][1])   # aux subtree (aux + foot)
        f_foot = (cfrc[b[2]][0], cfrc[b[2]][1])
        wdir, vdir = cdof[6 + 2 * l]
        bias[6 + 2 * l] = cadd(wdir.dot(f_aux[0]), vdir.dot(f_aux[1]))
        wdir, vdir = cdof[7 + 2 * l]
        bias[7 + 2 * l] = cadd(wdir.dot(f_foot[0]), vdir.dot(f_foot[1]))
    return bias


class AntBlock(NamedTuple):
    """One movable maze block (slide-jointed box body) in the ant kernel.

    TPU analog of the reference's movable-block world synthesis
    (`maze_env.py:563-633`): axis-aligned box with 1-3 slide dofs appended
    after the ant's 14 (model dof layout), travel limits encoding
    block-vs-wall collision, and the unconditional z>=0 floor-support
    impedance for "falling" blocks (see envs/env.py support note)."""

    base: tuple          # (3,) body position (world)
    half: tuple          # (3,) box half extents
    inv_mass: float
    axes: tuple          # axis index (0/1/2) per dof, model order
    vadr: tuple          # absolute dof indices (q index = vadr + 1)
    ranges: tuple        # ((lo, hi),) per dof, qpos offsets from base
    falling_zdof: int    # vadr of the supported z dof, or -1
    margin: float        # box geom margin
    # reachable platforms for the coupled z support (px, py, ox, oy, top)
    # with ox/oy the combined half extents (contact.falling_support_force)
    plats: tuple = ()


class AntBall(NamedTuple):
    """One free-jointed object ball (AntBilliard worlds).

    TPU analog of the reference's freejoint object-ball synthesis
    (`maze_env.py:539-560`, Ant's ``OBJBALL_TYPE = "freejoint"``): a lone
    free body (7 qpos / 6 qvel — linear world, angular body-frame) with a
    sphere geom at body-frame ``com`` and isotropic inertia."""

    qadr: int            # absolute qpos address (7 wide)
    vadr: int            # absolute dof address (6 wide)
    radius: float
    mass: float
    com: tuple           # (3,) body-frame com == sphere geom offset
    inertia: float       # isotropic inertia about the com (2/5 m r²)
    margin: float        # geom margin
    solimp: tuple        # (d0, dmax, width) of the ball geom
    solref_tc: float     # clamped time constant of the ball geom
    friction: float


class AntWorld(NamedTuple):
    """Static maze collision data for the ant kernel."""

    box_center: np.ndarray   # (B, 3) static AABBs (walls + platforms)
    box_half: np.ndarray     # (B, 3)
    box_margin: np.ndarray   # (B,)
    floor_margin: float
    sph_body: np.ndarray     # (S,) test-sphere body index
    sph_local: np.ndarray    # (S, 3)
    sph_radius: np.ndarray   # (S,)
    sph_margin: np.ndarray   # (S,)
    sph_solimp: np.ndarray   # (S, 3) per-sphere solimp (pair mixing)
    friction: float
    solimp: tuple            # (d0, dmax, width)
    solref_tc: float         # clamped time constant
    n_near_boxes: int        # torso-proximity box prune count
    blocks: tuple = ()       # movable AntBlocks (AntPush/AntFall worlds)
    balls: tuple = ()        # free-jointed AntBalls (AntBilliard worlds)


def nv_total(aw: AntWorld) -> int:
    return 14 + sum(len(b.axes) for b in aw.blocks) + 6 * len(aw.balls)


def free_joints(aw: AntWorld) -> tuple:
    """(qadr, vadr) of every free joint in the lane layout (root + balls)."""
    return ((0, 0),) + tuple((bl.qadr, bl.vadr) for bl in aw.balls)


def world_from_spec(spec, n_near_boxes: int = 4) -> AntWorld:
    cs = spec.contact_set
    model = spec.dynamic_model
    g0 = model.geoms[0][1]
    tc = max(g0.solref[0], 2.0 * spec.robot.timestep)

    # world bodies appended after the ant's 13: slide-jointed movable blocks
    # and/or free-jointed object balls
    falling = {zdof for _, zdof in getattr(spec, "_falling_blocks", ())}
    blocks = []
    balls = []
    N_ANT_BODIES = 13
    FREE_T, SLIDE_T = 0, 2
    ball_bodies = set()
    dbox_by_body = {int(b): k for k, b in enumerate(cs.dbox_body)}
    geom_by_body = {b: g for b, g in model.geoms}
    for bodyidx in range(N_ANT_BODIES, model.nbody):
        jids = [j for j in range(model.njnt) if int(model.jnt_body[j]) == bodyidx]
        jtypes = {int(model.jnt_type[j]) for j in jids}
        if jtypes == {FREE_T}:
            # free-jointed object ball (envs/env.py _build_engine_world)
            (j,) = jids
            g = geom_by_body[bodyidx]
            r = float(g.size[0])
            m = float(model.body_mass[bodyidx])
            balls.append(
                AntBall(
                    qadr=int(model.jnt_qposadr[j]),
                    vadr=int(model.jnt_dofadr[j]),
                    radius=r,
                    mass=m,
                    com=tuple(float(x) for x in model.body_com[bodyidx]),
                    inertia=float(model.body_inertia[bodyidx][0][0]),
                    margin=float(g.margin),
                    solimp=tuple(g.solimp),
                    solref_tc=max(float(g.solref[0]),
                                  2.0 * spec.robot.timestep),
                    friction=float(g.friction[0]),
                )
            )
            ball_bodies.add(bodyidx)
            continue
        assert jtypes <= {SLIDE_T}, (
            "ant kernel: only slide-jointed blocks (no SPIN/ball dofs)"
        )
        axes, vadr, ranges = [], [], []
        fall_z = -1
        for j in jids:
            ax = np.asarray(model.jnt_axis[j], np.float64)
            axis = int(np.argmax(np.abs(ax)))
            d = int(model.jnt_dofadr[j])
            axes.append(axis)
            vadr.append(d)
            ranges.append(tuple(float(r) for r in model.jnt_range[j]))
            if d in falling:
                fall_z = d
        k = dbox_by_body[bodyidx]
        half_k = tuple(float(x) for x in cs.dbox_half[k])
        base_k = tuple(float(x) for x in model.body_pos[bodyidx])
        plats = ()
        if fall_z >= 0:
            # platforms reachable within the falling block's xy travel
            # (coupled support, physics/contact.falling_support_force)
            ms = spec.structure
            mb = ms.movable_blocks[len(blocks)]
            pl = []
            for ppos, psize in zip(ms.platform_pos, ms.platform_size):
                if (abs(ppos[0] - base_k[0])
                        < mb.xy_range + half_k[0] + psize[0] + 1e-9
                        and abs(ppos[1] - base_k[1])
                        < mb.xy_range + half_k[1] + psize[1] + 1e-9):
                    pl.append((float(ppos[0]), float(ppos[1]),
                               float(psize[0] + half_k[0]),
                               float(psize[1] + half_k[1]),
                               float(ppos[2] + psize[2])))
            plats = tuple(pl)
        blocks.append(
            AntBlock(
                base=base_k,
                half=half_k,
                inv_mass=float(1.0 / model.body_mass[bodyidx]),
                axes=tuple(axes),
                vadr=tuple(vadr),
                ranges=tuple(ranges),
                falling_zdof=fall_z,
                margin=float(cs.dbox_margin[k]),
                plats=plats,
            )
        )

    # robot test spheres: exclude the ball spheres (handled via AntBall —
    # the contact set lists them because ball geoms are spheres)
    robot_sph = np.asarray(
        [s for s in range(len(cs.sph_body))
         if int(cs.sph_body[s]) not in ball_bodies], np.int32)

    return AntWorld(
        box_center=np.asarray(cs.box_center, np.float64),
        box_half=np.asarray(cs.box_half, np.float64),
        box_margin=np.asarray(cs.box_margin, np.float64),
        floor_margin=float(cs.floor_margin),
        sph_body=np.asarray(cs.sph_body, np.int32)[robot_sph],
        sph_local=np.asarray(cs.sph_local, np.float64)[robot_sph],
        sph_radius=np.asarray(cs.sph_radius, np.float64)[robot_sph],
        sph_margin=np.asarray(cs.sph_margin, np.float64)[robot_sph],
        sph_solimp=np.asarray(cs.sph_solimp, np.float64)[robot_sph],
        friction=float(g0.friction[0]),
        solimp=tuple(g0.solimp),
        solref_tc=tc,
        n_near_boxes=min(n_near_boxes, len(cs.box_center)),
        blocks=tuple(blocks),
        balls=tuple(balls),
    )


def _ball_kin(bl: AntBall, q):
    """(pos, R, com_w) of a free-jointed ball from the lane state."""
    a = bl.qadr
    pos = Vec3(q[a], q[a + 1], q[a + 2])
    R = quat_to_mat3(q[a + 3], q[a + 4], q[a + 5], q[a + 6])
    cl = Vec3(
        jnp.full_like(q[a], bl.com[0]), jnp.full_like(q[a], bl.com[1]),
        jnp.full_like(q[a], bl.com[2]),
    )
    return pos, R, pos + R.mul_vec(cl)


def _ball_jac_entries(bl: AntBall, pos: Vec3, R: Mat3, point: Vec3,
                      direction: Vec3, sign: float):
    """Sparse J entries of ``direction`` at ``point`` for the ball's 6 dofs
    (linear world axes, angular body axes — engine free-joint convention).
    Angular entries use the triple-product form (w×rel)·dir = w·(rel×dir)
    so the cross is computed once, not per dof."""
    out = {}
    out[bl.vadr + 0] = cmul(sign, direction.x)
    out[bl.vadr + 1] = cmul(sign, direction.y)
    out[bl.vadr + 2] = cmul(sign, direction.z)
    c = (point - pos).cross(direction)
    for k in range(3):
        out[bl.vadr + 3 + k] = cmul(sign, R.col(k).dot(c))
    return out


def _ball_mass_block(bl: AntBall, pos: Vec3, R: Mat3, com_w: Vec3, like):
    """6x6 mass matrix (list of lists of lane scalars) of one free ball.

    Same Jacobian form as :func:`mass_matrix`: M[i][j] = m J_i·J_j +
    W_j·(I_w W_i); linear dofs have W = None, J = e_k; angular dofs have
    W = R·e_k (body axes), J = W × (com − pos)."""
    m = bl.mass
    I_iso = bl.inertia
    # I_w = R (I_iso·1) Rᵀ = I_iso·1 for the isotropic ball inertia
    Ws = [R.col(k) for k in range(3)]
    Js_ang = [w.cross(com_w - pos) for w in Ws]
    es = [_EX, _EY, _EZ]
    M = [[0.0 for _ in range(6)] for _ in range(6)]
    for i in range(3):
        M[i][i] = float(m)
        for j in range(3):
            M[i][3 + j] = cmul(m, Js_ang[j].dot(es[i]))
            M[3 + j][i] = M[i][3 + j]
    for i in range(3):
        for j in range(i, 3):
            t = cadd(cmul(m, Js_ang[i].dot(Js_ang[j])),
                     cmul(I_iso, Ws[j].dot(Ws[i])))
            M[3 + i][3 + j] = t
            M[3 + j][3 + i] = t
    return M


def _ball_bias(bl: AntBall, pos: Vec3, R: Mat3, com_w: Vec3, v, gravity):
    """6 bias lanes (gravity + velocity products) of one free ball —
    mirror of the torso free-joint section of :func:`rne_bias`."""
    like = pos.x
    zero3 = _zero3(like)
    a = bl.vadr
    cdof = [(zero3, _EX), (zero3, _EY), (zero3, _EZ)]
    for k in range(3):
        w = R.col(k)
        cdof.append((w, pos.cross(w)))
    w_b = zero3
    for k in range(3):
        w_b = w_b + cdof[3 + k][0].scale(v[a + 3 + k])
    v_lin = Vec3(v[a], v[a + 1], v[a + 2])
    for k in range(3):
        v_lin = v_lin + cdof[3 + k][1].scale(v[a + 3 + k])
    v_ball = (w_b, v_lin)
    # cacc: fictitious base acc (0, +g ẑ) + body-fixed angular cdofdots
    acc = (zero3, Vec3(0.0, 0.0, gravity))
    for k in range(3):
        dcd = _motion_cross(*v_ball, *cdof[3 + k])
        acc = (acc[0] + dcd[0].scale(v[a + 3 + k]),
               acc[1] + dcd[1].scale(v[a + 3 + k]))

    def spatial_I(mot):
        alpha, a_lin = mot
        m = bl.mass
        c = com_w
        # I_w = I_iso (isotropic); Io α = I_w α − m c×(c×α) + m c×a_lin
        moment = (alpha.scale(bl.inertia)
                  - c.cross(c.cross(alpha)).scale(m)
                  + c.cross(a_lin).scale(m))
        force = (a_lin - c.cross(alpha)).scale(m)
        return moment, force

    Ia = spatial_I(acc)
    Iv = spatial_I(v_ball)
    vxf = (v_ball[0].cross(Iv[0]) + v_ball[1].cross(Iv[1]),
           v_ball[0].cross(Iv[1]))
    f = (Ia[0] + vxf[0], Ia[1] + vxf[1])
    return [cadd(wd.dot(f[0]), vd.dot(f[1])) for wd, vd in cdof]


def _sphere_aabb_nearest2(cx, cy, cz, r, box_center, box_half, box_margin):
    """Nearest-2 static AABBs for one sphere center (branch-free min
    chains); returns [(p Vec3, n Vec3, dist, box_margin lane), ...]."""
    B = len(box_center)
    like = cx
    INF = jnp.full_like(like, np.inf)
    cand = []
    for b in range(B):
        bc, bh = box_center[b], box_half[b]
        lx = cx - float(bc[0])
        ly = cy - float(bc[1])
        lz = cz - float(bc[2])
        hx, hy, hz = float(bh[0]), float(bh[1]), float(bh[2])
        clx = jnp.clip(lx, -hx, hx)
        cly = jnp.clip(ly, -hy, hy)
        clz = jnp.clip(lz, -hz, hz)
        dxo, dyo, dzo = lx - clx, ly - cly, lz - clz
        d2_out = dxo * dxo + dyo * dyo + dzo * dzo + 1e-12
        inv_out = jax.lax.rsqrt(d2_out)
        d_out = d2_out * inv_out
        outside = d_out > 1e-6
        ex = hx - jnp.abs(lx)
        ey = hy - jnp.abs(ly)
        ez = hz - jnp.abs(lz)
        mmin = jnp.minimum(jnp.minimum(ex, ey), ez)
        is_x = ex <= jnp.minimum(ey, ez)
        is_y = (~is_x) & (ey <= ez)
        is_z = (~is_x) & (~is_y)
        nix = jnp.where(is_x, jnp.where(lx >= 0, 1.0, -1.0), 0.0)
        niy = jnp.where(is_y, jnp.where(ly >= 0, 1.0, -1.0), 0.0)
        niz = jnp.where(is_z, jnp.where(lz >= 0, 1.0, -1.0), 0.0)
        dist = jnp.where(outside, d_out - r, -mmin - r)
        nrm = Vec3(jnp.where(outside, dxo * inv_out, nix),
                   jnp.where(outside, dyo * inv_out, niy),
                   jnp.where(outside, dzo * inv_out, niz))
        p = Vec3(float(bc[0]) + jnp.where(outside, clx, lx - nix * (-mmin)),
                 float(bc[1]) + jnp.where(outside, cly, ly - niy * (-mmin)),
                 float(bc[2]) + jnp.where(outside, clz, lz - niz * (-mmin)))
        marg = jnp.full_like(like, float(box_margin[b]))
        cand.append((dist - marg, p, nrm, dist, marg))
    if len(cand) <= 2:
        return [(p, n, d, m) for _, p, n, d, m in cand]
    best = [INF, _zero3(like), _zero3(like), like * 0, like * 0]
    second = [INF, _zero3(like), _zero3(like), like * 0, like * 0]
    for eff, p, nrm, dist, marg in cand:
        cur = [eff, p, nrm, dist, marg]
        b1 = cur[0] < best[0]
        b2 = (~b1) & (cur[0] < second[0])

        def pick(cond, a_, b_):
            if isinstance(a_, Vec3):
                return Vec3(jnp.where(cond, a_.x, b_.x),
                            jnp.where(cond, a_.y, b_.y),
                            jnp.where(cond, a_.z, b_.z))
            return jnp.where(cond, a_, b_)

        new_second = [pick(b1, bb, pick(b2, cc, ss))
                      for bb, cc, ss in zip(best, cur, second)]
        best = [pick(b1, cc, bb) for cc, bb in zip(cur, best)]
        second = new_second
    return [(sel[1], sel[2], sel[3], sel[4]) for sel in (best, second)]


def _ball_rows(ac: AntConsts, aw: AntWorld, fk: AntFK, q, centers):
    """Candidate contacts involving free object balls (AntBilliard worlds):
    ball vs floor, ball vs nearest-2 static AABBs, every robot test sphere
    vs ball (contact.py pair enumeration), ball vs ball.  Per-row solimp /
    solref / friction follow contact_qfrc's pair mixing (sphere values for
    static contacts; element means + friction max for dynamic pairs)."""
    if not aw.balls:
        return []
    assert not aw.blocks, (
        "ant kernel: ball+block worlds (none registered) unsupported"
    )
    like = fk.pos[0].x
    rows = []
    kin = [(bl,) + _ball_kin(bl, q) for bl in aw.balls]
    up = _EZ
    for bi, (bl, bpos, bR, bcom) in enumerate(kin):
        sol_b = (bl.solimp[0], bl.solimp[1], bl.solimp[2], bl.solref_tc,
                 bl.friction)
        ctr = bcom  # sphere geom center == body com (geom at (0,0,r))
        r = bl.radius
        # floor
        p = Vec3(ctr.x, ctr.y, ctr.z - r)
        rows.append((None, p, up, ctr.z - r,
                     bl.margin + aw.floor_margin, (), ((bl, 1.0),), sol_b))
        # nearest-2 static wall boxes (the ball roams the whole maze, so it
        # gets its own prune anchor rather than the torso's)
        for (pb, nb, db, mb) in _sphere_aabb_nearest2(
                ctr.x, ctr.y, ctr.z, r,
                aw.box_center, aw.box_half, aw.box_margin):
            rows.append((None, pb, nb, db, bl.margin + mb, (),
                         ((bl, 1.0),), sol_b))
        # robot test spheres vs ball (pair rows: i = sphere, j = ball;
        # normal points ball → sphere, contact.py:424-440).  All 37
        # candidates are kept — a straddling ant can press several spheres
        # (even of one capsule) into the ball at once, and pruning was
        # measured to break the engine differential in deep-overlap states.
        for s in range(len(aw.sph_body)):
            body = int(aw.sph_body[s])
            rs = float(aw.sph_radius[s])
            c = centers[s]
            d = c - ctr
            d2 = d.dot(d) + 1e-12
            inv = jax.lax.rsqrt(d2)
            dn = d2 * inv
            n = d.scale(inv)
            dist = dn - (rs + r)
            pos_c = ctr + n.scale(r + dist * 0.5)
            si = aw.sph_solimp[s]
            sp = (0.5 * (float(si[0]) + bl.solimp[0]),
                  0.5 * (float(si[1]) + bl.solimp[1]),
                  0.5 * (float(si[2]) + bl.solimp[2]),
                  max(aw.solref_tc, bl.solref_tc),
                  max(aw.friction, bl.friction))
            rows.append((body, pos_c, n, dist,
                         float(aw.sph_margin[s]) + bl.margin, (),
                         ((bl, -1.0),), sp))
        # ball vs earlier balls
        for bj in range(bi):
            bl2, _, _, bcom2 = kin[bj]
            d = bcom2 - ctr
            d2 = d.dot(d) + 1e-12
            inv = jax.lax.rsqrt(d2)
            dn = d2 * inv
            n = d.scale(inv)  # points ball_i → ball_j (i first body)
            dist = dn - (bl2.radius + bl.radius)
            pos_c = ctr + n.scale(bl.radius + dist * 0.5)
            sp = (0.5 * (bl.solimp[0] + bl2.solimp[0]),
                  0.5 * (bl.solimp[1] + bl2.solimp[1]),
                  0.5 * (bl.solimp[2] + bl2.solimp[2]),
                  max(bl.solref_tc, bl2.solref_tc),
                  max(bl.friction, bl2.friction))
            rows.append((None, pos_c, n, dist, bl.margin + bl2.margin, (),
                         ((bl2, 1.0), (bl, -1.0)), sp))
    return rows


def _contact_rows(ac: AntConsts, aw: AntWorld, fk: AntFK, q=None):
    """Detect candidate contacts; returns list of
    (body, point Vec3, normal Vec3, dist, margin, xdofs) lane entries.

    ``xdofs`` is a tuple of (vdof, axis) extra Jacobian entries for contacts
    against a movable block: the row entry for direction ``dir`` is
    ``-dir[axis]`` (the block is the second body; sign_mask parity with
    physics/contact.py contact_qfrc)."""
    like = fk.pos[0].x
    rows = []
    # sphere world centers
    centers = []
    for s in range(len(aw.sph_body)):
        k = int(aw.sph_body[s])
        lc = aw.sph_local[s]
        lv = Vec3(
            jnp.full_like(like, float(lc[0])), jnp.full_like(like, float(lc[1])),
            jnp.full_like(like, float(lc[2])),
        )
        centers.append(fk.pos[k] + fk.R[k].mul_vec(lv))
    # floor contacts: the normal/tangent frame is trace-time constant
    # ((0,0,1)/(0,1,0)/(-1,0,0)) — J entries, A pairs and solver scatter
    # terms for these rows fold substantially
    up = _EZ
    for s, c in enumerate(centers):
        r = float(aw.sph_radius[s])
        dist = c.z - r
        p = Vec3(c.x, c.y, c.z - r)
        rows.append((int(aw.sph_body[s]), p, up, dist,
                     float(aw.sph_margin[s]) + aw.floor_margin, (), (), None))
    # movable blocks: sphere vs axis-aligned moving box (all pairs — the
    # worlds have 1-3 blocks; no prune needed)
    for bl in aw.blocks:
        # box center = base + slide-dof offsets along the moving axes
        off = [jnp.zeros_like(like) for _ in range(3)]
        for axis, d in zip(bl.axes, bl.vadr):
            off[axis] = q[d + 1]  # qpos index of a non-free dof = vdof + 1
        bcx = off[0] + np.float32(bl.base[0])
        bcy = off[1] + np.float32(bl.base[1])
        bcz = off[2] + np.float32(bl.base[2])
        hx, hy, hz = (np.float32(h) for h in bl.half)
        xdofs = tuple(zip(bl.vadr, bl.axes))
        for s, c in enumerate(centers):
            r = float(aw.sph_radius[s])
            body = int(aw.sph_body[s])
            lx, ly, lz = c.x - bcx, c.y - bcy, c.z - bcz
            clx = jnp.clip(lx, -hx, hx)
            cly = jnp.clip(ly, -hy, hy)
            clz = jnp.clip(lz, -hz, hz)
            dxo, dyo, dzo = lx - clx, ly - cly, lz - clz
            d2_out = dxo * dxo + dyo * dyo + dzo * dzo + 1e-12
            inv_out = jax.lax.rsqrt(d2_out)
            d_out = d2_out * inv_out
            outside = d_out > 1e-6
            ex = hx - jnp.abs(lx)
            ey = hy - jnp.abs(ly)
            ez = hz - jnp.abs(lz)
            mmin = jnp.minimum(jnp.minimum(ex, ey), ez)
            is_x = ex <= jnp.minimum(ey, ez)
            is_y = (~is_x) & (ey <= ez)
            is_z = (~is_x) & (~is_y)
            nix = jnp.where(is_x, jnp.where(lx >= 0, 1.0, -1.0), 0.0)
            niy = jnp.where(is_y, jnp.where(ly >= 0, 1.0, -1.0), 0.0)
            niz = jnp.where(is_z, jnp.where(lz >= 0, 1.0, -1.0), 0.0)
            dist = jnp.where(outside, d_out - r, -mmin - r)
            nrm = Vec3(
                jnp.where(outside, dxo * inv_out, nix),
                jnp.where(outside, dyo * inv_out, niy),
                jnp.where(outside, dzo * inv_out, niz),
            )
            p = Vec3(
                bcx + jnp.where(outside, clx, lx - nix * (-mmin)),
                bcy + jnp.where(outside, cly, ly - niy * (-mmin)),
                bcz + jnp.where(outside, clz, lz - niz * (-mmin)),
            )
            rows.append((body, p, nrm, dist,
                         float(aw.sph_margin[s]) + bl.margin, xdofs, (),
                         None))
    rows += _ball_rows(ac, aw, fk, q, centers)
    B = len(aw.box_center)
    if B == 0:
        return rows
    # torso-proximity prune: nearest n boxes to the torso (the ant spans
    # ~1.5 m << cell size, so its spheres can only touch those)
    NB = aw.n_near_boxes
    torso = fk.pos[0]
    INF = jnp.full_like(like, np.inf)
    # wall boxes usually share half extents / margins (uniform maze cells):
    # uniform fields are trace-time constants and drop out of the
    # branch-free insertion chains entirely
    all_fields = {
        "cx": aw.box_center[:, 0], "cy": aw.box_center[:, 1],
        "cz": aw.box_center[:, 2],
        "hx": aw.box_half[:, 0], "hy": aw.box_half[:, 1],
        "hz": aw.box_half[:, 2], "m": aw.box_margin,
    }
    uni = {k: float(vals[0]) for k, vals in all_fields.items()
           if bool(np.all(vals == vals[0]))}
    var_keys = [k for k in all_fields if k not in uni]
    near = [dict(d=INF, **{k: like * 0 for k in var_keys})
            for _ in range(NB)]
    for b in range(B):
        bc = aw.box_center[b]
        bh = aw.box_half[b]
        dx = jnp.maximum(jnp.abs(torso.x - bc[0]) - bh[0], 0.0)
        dy = jnp.maximum(jnp.abs(torso.y - bc[1]) - bh[1], 0.0)
        dz = jnp.maximum(jnp.abs(torso.z - bc[2]) - bh[2], 0.0)
        d = dx * dx + dy * dy + dz * dz
        cur = dict(d=d, **{
            k: jnp.full_like(like, float(all_fields[k][b]))
            for k in var_keys
        })
        # insertion into the sorted near-list (branch-free)
        for slot in range(NB):
            better = cur["d"] < near[slot]["d"]
            new_slot = {
                key: jnp.where(better, cur[key], near[slot][key])
                for key in cur
            }
            cur = {
                key: jnp.where(better, near[slot][key], cur[key])
                for key in cur
            }
            near[slot] = new_slot
    for slot in range(NB):
        near[slot].update(uni)
    # per sphere vs each near box: sphere-AABB contact, keeping only the
    # two nearest per sphere (a sphere touches at most two boxes at a
    # corner) — branch-free min chains
    for s, c in enumerate(centers):
        r = float(aw.sph_radius[s])
        body = int(aw.sph_body[s])
        sm = float(aw.sph_margin[s])
        cand = []
        for slot in range(NB):
            nb = near[slot]
            lx = c.x - nb["cx"]
            ly = c.y - nb["cy"]
            lz = c.z - nb["cz"]
            clx = jnp.clip(lx, -nb["hx"], nb["hx"])
            cly = jnp.clip(ly, -nb["hy"], nb["hy"])
            clz = jnp.clip(lz, -nb["hz"], nb["hz"])
            dxo = lx - clx
            dyo = ly - cly
            dzo = lz - clz
            d2_out = dxo * dxo + dyo * dyo + dzo * dzo + 1e-12
            inv_out = jax.lax.rsqrt(d2_out)
            d_out = d2_out * inv_out
            outside = d_out > 1e-6
            # inside: min-exit axis (branch-free)
            ex = nb["hx"] - jnp.abs(lx)
            ey = nb["hy"] - jnp.abs(ly)
            ez = nb["hz"] - jnp.abs(lz)
            mmin = jnp.minimum(jnp.minimum(ex, ey), ez)
            is_x = ex <= jnp.minimum(ey, ez)
            is_y = (~is_x) & (ey <= ez)
            is_z = (~is_x) & (~is_y)
            sgnx = jnp.where(lx >= 0, 1.0, -1.0)
            sgny = jnp.where(ly >= 0, 1.0, -1.0)
            sgnz = jnp.where(lz >= 0, 1.0, -1.0)
            nix = jnp.where(is_x, sgnx, 0.0)
            niy = jnp.where(is_y, sgny, 0.0)
            niz = jnp.where(is_z, sgnz, 0.0)
            dist = jnp.where(outside, d_out - r, -mmin - r)
            nx = jnp.where(outside, dxo * inv_out, nix)
            ny = jnp.where(outside, dyo * inv_out, niy)
            nz = jnp.where(outside, dzo * inv_out, niz)
            px = nb["cx"] + jnp.where(outside, clx, lx - nix * (-mmin))
            py = nb["cy"] + jnp.where(outside, cly, ly - niy * (-mmin))
            pz = nb["cz"] + jnp.where(outside, clz, lz - niz * (-mmin))
            cand.append((dist - nb["m"], Vec3(px, py, pz),
                         Vec3(nx, ny, nz), dist, sm + nb["m"]))
        if len(cand) <= 2:
            for _, p, nrm, dist, marg in cand:
                rows.append((body, p, nrm, dist, marg, (), (), None))
        else:
            # uniform margins (the usual case: one wall-box class) make the
            # margin-adjusted key equivalent to dist itself — the margin
            # drops out of the selection chain as a trace-time constant
            margs = [cd[4] for cd in cand]
            uniform_marg = (all(is_const(m) for m in margs)
                            and len({float(m) for m in margs}) == 1)
            like0 = cand[0][3]
            INFc = jnp.full_like(like0, np.inf)

            def pick(cond, a, b_):
                if isinstance(a, Vec3):
                    return Vec3(
                        jnp.where(cond, a.x, b_.x),
                        jnp.where(cond, a.y, b_.y),
                        jnp.where(cond, a.z, b_.z),
                    )
                return jnp.where(cond, a, b_)

            if uniform_marg:
                entries = [[cd[3], cd[1], cd[2]] for cd in cand]
            else:
                entries = [[cd[0], cd[1], cd[2], cd[3],
                            (like0 * 0 + cd[4] if isinstance(cd[4], jax.Array)
                             else like0 * 0 + float(cd[4]))]
                           for cd in cand]
            best = [INFc] + [_zero3(like0) if isinstance(e, Vec3)
                             else like0 * 0 for e in entries[0][1:]]
            second = list(best)
            for cur in entries:
                b1 = cur[0] < best[0]
                b2 = (~b1) & (cur[0] < second[0])
                new_second = [
                    pick(b1, bb, pick(b2, cc, ss))
                    for bb, cc, ss in zip(best, cur, second)
                ]
                best = [pick(b1, cc, bb) for cc, bb in zip(cur, best)]
                second = new_second
            for sel in (best, second):
                if uniform_marg:
                    rows.append((body, sel[1], sel[2], sel[0],
                                 float(margs[0]), (), (), None))
                else:
                    rows.append((body, sel[1], sel[2], sel[3], sel[4],
                                 (), (), None))
    return rows


def forward_ant(ac: AntConsts, aw: AntWorld, q, v, ctrl,
                solver_iters: int = 6):
    """qacc (tuple of nv lane scalars) with contacts + limits.

    Dof layout: 14 ant dofs, then block slide / ball free dofs (model
    order).  The mass matrix is block-diagonal — dense 14x14 ant block, a
    diagonal for the (uncoupled) block slides, and a dense 6x6 per free
    ball — so the Cholesky stays small per tree; coupling happens only
    through contact rows."""
    like = q[0]
    NV = nv_total(aw)
    fk = fk_ant(ac, q)
    M = mass_matrix(ac, fk)
    bias = [0.0] * NV
    for d, b in enumerate(rne_bias(ac, fk, v)):
        bias[d] = b
    # block dofs: gravity on z slides (pure translation, no vel products);
    # a trace-time constant — folds through qacc0 and the solver
    blk_inv = {}
    for bl in aw.blocks:
        for axis, d in zip(bl.axes, bl.vadr):
            blk_inv[d] = float(bl.inv_mass)
            if axis == 2:
                bias[d] = float(ac.gravity) / bl.inv_mass
    # free object balls: 6x6 mass block + full gravity/gyroscopic bias
    ball_blocks = []  # (AntBall, M6, eye_cols6)
    for bl in aw.balls:
        bpos, bR, bcom = _ball_kin(bl, q)
        for k, b6 in enumerate(_ball_bias(bl, bpos, bR, bcom, v,
                                          float(ac.gravity))):
            bias[bl.vadr + k] = b6
        M6 = _ball_mass_block(bl, bpos, bR, bcom, like)
        L6 = chol_factor(M6)
        cols6 = chol_inv_columns(L6)  # Minv6 columns, factor reused
        ball_blocks.append((bl, L6, cols6))
    ball_of_dof = {}
    for bi, (bl, _, _) in enumerate(ball_blocks):
        for k in range(6):
            ball_of_dof[bl.vadr + k] = bi
    tau = [0.0] * NV
    for u in range(8):
        c = jnp.clip(ctrl[u], -ac.ctrl_hi, ac.ctrl_hi)
        dof = ac.act_dofadr[u]
        tau[dof] = cadd(tau[dof], float(ac.gear) * c)
    for d in range(14):
        tau[d] = csub(tau[d], cmul(float(ac.damping[d]), v[d]))

    rhs0 = [csub(tau[i], bias[i]) for i in range(14)]
    qacc0, L = chol_solve(M, rhs0)
    qacc0 = list(qacc0) + [0.0] * (NV - 14)
    for d, inv in blk_inv.items():
        qacc0[d] = cmul(csub(tau[d], bias[d]), float(inv))
    for bl, L6, _ in ball_blocks:
        r6 = [csub(tau[bl.vadr + k], bias[bl.vadr + k]) for k in range(6)]
        sol6 = chol_resolve(L6, r6)
        for k in range(6):
            qacc0[bl.vadr + k] = sol6[k]

    # M⁻¹ columns needed: limited dofs (6..13) + contact rows use full Minv.
    # Reuses the factor L (and the unit-rhs sparsity) — ~10K fewer lane ops
    # per forward than refactorizing per column.
    eye_cols = chol_inv_columns(L)  # eye_cols[d] = Minv[:, d] (ant block)

    def minv_entry(d1, d2):
        """Minv[d1, d2] as a lane scalar / python float, or None if 0."""
        if d1 < 14 and d2 < 14:
            return eye_cols[d2][d1]
        b1 = ball_of_dof.get(d1)
        b2 = ball_of_dof.get(d2)
        if b1 is not None and b1 == b2:
            bl, _, cols6 = ball_blocks[b1]
            return cols6[d2 - bl.vadr][d1 - bl.vadr]
        if d1 == d2 and d1 in blk_inv:
            return blk_inv[d1]
        return None

    def minv_diag(d):
        if d < 14:
            return eye_cols[d][d]
        if d in ball_of_dof:
            bl, _, cols6 = ball_blocks[ball_of_dof[d]]
            return cols6[d - bl.vadr][d - bl.vadr]
        return blk_inv[d]

    f_con = [0.0] * NV

    # joint limits (engine.limit_force parity) — ant hips/ankles + block
    # slide travel limits (the block-vs-wall collision analog)
    tc = float(max(0.02, 2.0 * ac.timestep))
    d0l, dmaxl, widthl = 0.9, 0.95, 0.001
    b_imp_l = 2.0 / (dmaxl * tc)
    limited = [
        (6 + u,
         ac.hip_range if u % 2 == 0 else tuple(ac.ankle_ranges[u // 2]))
        for u in range(8)
    ]
    for bl in aw.blocks:
        for d, rng in zip(bl.vadr, bl.ranges):
            if d == bl.falling_zdof:
                continue  # coupled with the platform support below
            limited.append((d, rng))
    for dof, (lo, hi) in limited:
        qd = q[dof + 1]  # qpos index of a non-free dof = vdof + 1
        vd = v[dof]
        a0 = qacc0[dof]
        if dof < 14:
            m_eff = 1.0 / jnp.maximum(minv_diag(dof), 1e-12)
        else:
            m_eff = 1.0 / max(blk_inv[dof], 1e-12)  # python constant
        for sign, viol in (
            (1.0, jnp.maximum(qd - hi, 0.0)),
            (-1.0, jnp.maximum(lo - qd, 0.0)),
        ):
            active = viol > 0
            dimp = d0l + (dmaxl - d0l) * jnp.clip(viol / widthl, 0.0, 1.0)
            k_imp = dimp / (dmaxl * dmaxl * tc * tc)
            aref = -b_imp_l * (sign * vd) - k_imp * viol
            f_out = m_eff * dimp * (aref - cmul(sign, a0))
            f_out = jnp.minimum(f_out, 0.0)
            f_con[dof] = cadd(f_con[dof],
                              jnp.where(active, sign * f_out, 0.0))

    # falling blocks: coupled platform-support + upper-z-limit solve
    # (physics/contact.falling_support_force — envs/env.py support_qfrc
    # parity; the reference block perches ON TOP of its platform)
    for bl in aw.blocks:
        if bl.falling_zdof < 0:
            continue
        from ..physics.contact import falling_support_force

        d = bl.falling_zdof
        tcs = float(max(0.02, 2.0 * ac.timestep))
        z = q[d + 1]
        bottom = float(bl.base[2]) + z - float(bl.half[2])
        cxb = jnp.full_like(like, float(bl.base[0]))
        cyb = jnp.full_like(like, float(bl.base[1]))
        for axis, dd in zip(bl.axes, bl.vadr):
            if axis == 0:
                cxb = cxb + q[dd + 1]
            elif axis == 1:
                cyb = cyb + q[dd + 1]
        s = jnp.zeros_like(like)
        for (px, py, ox, oy, top) in bl.plats:
            over = ((jnp.abs(cxb - px) < ox) & (jnp.abs(cyb - py) < oy))
            s = jnp.maximum(s, jnp.where(over, top, 0.0))
        a0_d = qacc0[d]
        if is_const(a0_d):
            a0_d = jnp.full_like(like, a0_d)
        f_net = falling_support_force(
            z, bottom, s, v[d], a0_d, blk_inv[d] + 1e-12, tcs)
        f_con[d] = cadd(f_con[d], f_net)

    # contacts
    rows = _contact_rows(ac, aw, fk, q)
    if rows:
        d0c_w, dmaxc_w, widthc_w = aw.solimp
        tcc_w = aw.solref_tc
        # per-contact data: J rows (normal + 2 tangents) as sparse dof dicts
        ball_kin_cache = {bl.vadr: _ball_kin(bl, q) for bl in aw.balls}
        con = []
        for body, p, nrm, dist, margin, xdofs, balls_sgn, solpar in rows:
            # tangent frame; a trace-time-constant normal (floor rows:
            # (0,0,1)) yields a constant frame — J entries, A pairs and
            # solver terms for those rows then fold
            if all(is_const(cc) for cc in nrm):
                import math as _math

                if abs(float(nrm.x)) < 0.5:
                    ref = _EX
                else:
                    ref = _EY
                t1 = nrm.cross(ref)
                t1n = _math.sqrt(t1.dot(t1) + 1e-12)
                t1 = t1.scale(1.0 / t1n)
                t2 = nrm.cross(t1)
            else:
                use_x = jnp.abs(nrm.x) < 0.5
                ref = Vec3(jnp.where(use_x, 1.0, 0.0),
                           jnp.where(use_x, 0.0, 1.0), 0.0)
                t1 = nrm.cross(ref)
                inv_t1 = jax.lax.rsqrt(t1.dot(t1) + 1e-12)
                t1 = t1.scale(inv_t1)
                t2 = nrm.cross(t1)
            if body is not None:
                dofs = _dofs_of_body(body)
                rel0 = p - fk.pos[0]
                # leg-dof Jacobians J = w×(p−anchor): computed ONCE per row
                # and dotted with each of the 3 directions (the per-
                # direction triple-product form would redo the cross 3×)
                leg_J = {}
                for dd in dofs[6:]:
                    ll = (dd - 6) // 2
                    if dd % 2 == 0:   # hip dof 6+2l
                        w, anch = fk.hip_axis[ll], fk.hip_anchor[ll]
                    else:             # ankle dof 7+2l
                        w, anch = fk.ankle_axis[ll], fk.ankle_anchor[ll]
                    leg_J[dd] = w.cross(p - anch)
            else:
                dofs = ()
                rel0 = None
                leg_J = {}

            def jrow(direction):
                row = {}
                if dofs:
                    # linear free dofs: J = eₖ → entry is the direction
                    # component (folds for constant frames)
                    for dd, comp in ((0, direction.x), (1, direction.y),
                                     (2, direction.z)):
                        row[dd] = comp
                    # torso angular dofs via the triple product
                    # (w×rel0)·dir = w·(rel0×dir): one shared cross (and a
                    # free one for trace-time-constant directions)
                    c0 = rel0.cross(direction)
                    for j in range(3):
                        row[3 + j] = fk.R[0].col(j).dot(c0)
                    for dd, Jl in leg_J.items():
                        row[dd] = Jl.dot(direction)
                # block dofs: relative velocity is sphere minus box, and a
                # slide dof moves the box along its axis → entry -dir[axis]
                for d, axis in xdofs:
                    row[d] = cneg(
                        (direction.x, direction.y, direction.z)[axis])
                # free-ball dofs: second (or only) body of the contact
                for bl, sgn in balls_sgn:
                    bpos, bR, _ = ball_kin_cache[bl.vadr]
                    for d, val in _ball_jac_entries(
                            bl, bpos, bR, p, direction, sgn).items():
                        row[d] = cadd(row.get(d, 0.0), val)
                # prune structural zeros (constant-frame rows)
                return {d: val for d, val in row.items()
                        if not (is_const(val) and val == 0.0)}

            con.append(dict(
                dist=dist, margin=margin, solpar=solpar,
                Jn=jrow(nrm), Jt1=jrow(t1), Jt2=jrow(t2),
            ))

        def minv_mul(vec):
            """Minv @ vec over the block-diagonal structure (folding:
            structurally-zero scatter entries cost nothing)."""
            out = []
            for i in range(14):
                s = 0.0
                for j in range(14):
                    s = cadd(s, cmul(eye_cols[j][i], vec[j]))
                out.append(s)
            for d in range(14, NV):
                out.append(0.0)
            for d, inv in blk_inv.items():
                out[d] = cmul(vec[d], float(inv))
            for bl, _, cols6 in ball_blocks:
                for i in range(6):
                    s = 0.0
                    for j in range(6):
                        s = cadd(s, cmul(cols6[j][i], vec[bl.vadr + j]))
                    out[bl.vadr + i] = s
            return out

        def sparse_dot(row, vec):
            s = 0.0
            for d, val in row.items():
                s = cadd(s, cmul(val, vec[d]))
            return s

        # per-row A = J Minv Jᵀ via the row's sparse dof support
        all_rows = []
        mus = []
        # 2·Minv[d1,d2] hoisted once per distinct pair (the A loop folds
        # symmetric off-diagonal pairs with a factor 2; pre-doubling saves
        # one mul per pair per row-direction ≈ 7K traced ops)
        mv2_cache: dict = {}

        def minv2_entry(d1, d2):
            key = (d1, d2)
            if key not in mv2_cache:
                mv = minv_entry(d1, d2)
                mv2_cache[key] = None if mv is None else cmul(2.0, mv)
            return mv2_cache[key]

        for c in con:
            # per-row constants: the world default, or the contact pair's
            # own solimp/solref/friction mix (ball rows — contact.py parity)
            if c["solpar"] is None:
                d0c, dmaxc, widthc, tcc, mu_c = (
                    d0c_w, dmaxc_w, widthc_w, tcc_w, aw.friction)
            else:
                d0c, dmaxc, widthc, tcc, mu_c = c["solpar"]
            b_imp = 2.0 / (dmaxc * tcc)
            mus.append(mu_c)
            active = c["dist"] < c["margin"]
            r = csub(c["dist"], c["margin"])
            imp = d0c + (dmaxc - d0c) * jnp.clip(-r * (1.0 / widthc),
                                                 0.0, 1.0)
            k_imp = imp * (1.0 / (dmaxc * dmaxc * tcc * tcc))
            for kind, row in (("n", c["Jn"]), ("t1", c["Jt1"]), ("t2", c["Jt2"])):
                # A = J Minv Jᵀ over the row's sparse support; Minv is
                # symmetric, so off-diagonal pairs are folded once with a
                # factor 2 (halves the dominant madd count of this stage);
                # constant J entries (floor rows) fold their products
                items = list(row.items())
                A = 0.0
                for i1, (d1, v1) in enumerate(items):
                    mv = minv_entry(d1, d1)
                    if mv is not None:
                        A = cadd(A, cmul(cmul(v1, mv), v1))
                    for d2, v2 in items[i1 + 1:]:
                        mv2 = minv2_entry(d1, d2)
                        if mv2 is None:
                            continue
                        A = cadd(A, cmul(cmul(v1, mv2), v2))
                A = cadd(A, 1e-9)
                v_r = sparse_dot(row, list(v))
                a0_r = sparse_dot(row, qacc0)
                if kind == "n":
                    aref = csub(cmul(-b_imp, v_r), cmul(k_imp, r))
                else:
                    aref = cmul(-b_imp, v_r)
                all_rows.append(dict(
                    row=row, A=A, aref=aref, a0=a0_r, imp=imp,
                    active=active, kind=kind,
                ))
        nc = len(con)

        # projected Jacobi over the regularized Delassus (contact.py parity)
        def project(fs):
            out = list(fs)
            for i in range(nc):
                fn = jnp.maximum(fs[3 * i], 0.0)
                fn = jnp.where(all_rows[3 * i]["active"], fn, 0.0)
                ft1, ft2 = fs[3 * i + 1], fs[3 * i + 2]
                inv_ftn = jax.lax.rsqrt(ft1 * ft1 + ft2 * ft2 + 1e-12)
                scale = jnp.minimum(1.0, mus[i] * fn * inv_ftn)
                out[3 * i] = fn
                out[3 * i + 1] = jnp.where(
                    all_rows[3 * i + 1]["active"], ft1 * scale, 0.0
                )
                out[3 * i + 2] = jnp.where(
                    all_rows[3 * i + 2]["active"], ft2 * scale, 0.0
                )
            return out

        inv_denom = []
        for rr in all_rows:
            Rreg = (1.0 - rr["imp"]) / jnp.maximum(rr["imp"], 1e-6) * rr["A"]
            # one reciprocal per row reused across init + every iteration
            # (replaces solver_iters+1 divides per row with multiplies)
            inv_denom.append(1.0 / (rr["A"] + Rreg + 1e-9))
            rr["Rreg"] = Rreg
        fs = project([
            csub(rr["aref"], rr["a0"]) * inv_dn
            for rr, inv_dn in zip(all_rows, inv_denom)
        ])
        omega = 0.6
        for _ in range(solver_iters):
            # x = Minv (Jᵀ f) accumulated densely
            x = [0.0] * NV
            for rr, f in zip(all_rows, fs):
                for d, val in rr["row"].items():
                    x[d] = cadd(x[d], cmul(val, f))
            x = minv_mul(x)
            new_fs = []
            for rr, f, inv_dn in zip(all_rows, fs, inv_denom):
                a_f = sparse_dot(rr["row"], x)
                resid = csub(csub(csub(rr["aref"], rr["a0"]), a_f),
                             rr["Rreg"] * f)
                new_fs.append(f + omega * resid * inv_dn)
            fs = project(new_fs)
        for rr, f in zip(all_rows, fs):
            for d, val in rr["row"].items():
                f_con[d] = cadd(f_con[d], cmul(val, f))

    rhs = [csub(cadd(tau[i], f_con[i]), bias[i]) for i in range(14)]
    qacc = chol_resolve(L, rhs)
    qacc = list(qacc) + [0.0] * (NV - 14)
    for d, inv in blk_inv.items():
        qacc[d] = cmul(csub(cadd(tau[d], f_con[d]), bias[d]), float(inv))
    for bl, L6, _ in ball_blocks:
        r6 = [csub(cadd(tau[bl.vadr + k], f_con[bl.vadr + k]),
                   bias[bl.vadr + k]) for k in range(6)]
        sol6 = chol_resolve(L6, r6)
        for k in range(6):
            qacc[bl.vadr + k] = sol6[k]
    # every dof must leave as a lane vector (kernel outputs / integrators)
    return tuple(x if not is_const(x) else jnp.full_like(like, x)
                 for x in qacc)


def _quat_step(q, v, h, qa, va, out):
    """Free-joint quaternion update q[qa+3:qa+7] ⊞ v[va+3:va+6]·h."""
    wx, wy, wz = v[va + 3], v[va + 4], v[va + 5]
    s2 = wx * wx + wy * wy + wz * wz + 1e-18
    inv_a = jax.lax.rsqrt(s2)
    angle = s2 * inv_a
    half = angle * h * 0.5
    sh = jnp.sin(half) * inv_a
    dw = jnp.cos(half)
    dx = wx * sh
    dy = wy * sh
    dz = wz * sh
    qw, qx, qy, qz = q[qa + 3], q[qa + 4], q[qa + 5], q[qa + 6]
    # right-multiply: quat ∘ dq (body-frame angular velocity)
    nw = qw * dw - qx * dx - qy * dy - qz * dz
    nx = qw * dx + qx * dw + qy * dz - qz * dy
    ny = qw * dy - qx * dz + qy * dw + qz * dx
    nz = qw * dz + qx * dy - qy * dx + qz * dw
    inv_n = jax.lax.rsqrt(nw * nw + nx * nx + ny * ny + nz * nz)
    out[qa + 3], out[qa + 4], out[qa + 5], out[qa + 6] = (
        nw * inv_n, nx * inv_n, ny * inv_n, nz * inv_n)


def integrate_ant(q, v, h, extra_free=()):
    """q ⊞ v·h with MuJoCo free-joint semantics (engine.integrate_pos
    parity: world-frame linear, body-frame angular exponential).  Extra
    trailing block slide dofs integrate linearly; ``extra_free`` lists
    (qadr, vadr) of additional free joints (object balls), each of which
    shifts the qpos/dof alignment of everything after it by one."""
    out = list(q)
    for i in range(3):
        out[i] = q[i] + v[i] * h
    wx, wy, wz = v[3], v[4], v[5]
    s2 = wx * wx + wy * wy + wz * wz + 1e-18
    inv_a = jax.lax.rsqrt(s2)
    angle = s2 * inv_a
    half = angle * h * 0.5
    sh = jnp.sin(half) * inv_a
    dw = jnp.cos(half)
    dx = wx * sh
    dy = wy * sh
    dz = wz * sh
    qw, qx, qy, qz = q[3], q[4], q[5], q[6]
    # right-multiply: quat ∘ dq (body-frame angular velocity)
    nw = qw * dw - qx * dx - qy * dy - qz * dz
    nx = qw * dx + qx * dw + qy * dz - qz * dy
    ny = qw * dy - qx * dz + qy * dw + qz * dx
    nz = qw * dz + qx * dy - qy * dx + qz * dw
    inv_n = jax.lax.rsqrt(nw * nw + nx * nx + ny * ny + nz * nz)
    out[3], out[4], out[5], out[6] = (nw * inv_n, nx * inv_n, ny * inv_n,
                                      nz * inv_n)
    free_spans = sorted((qa, va) for qa, va in extra_free)
    covered = set()
    for qa, va in free_spans:
        for i in range(3):
            out[qa + i] = q[qa + i] + v[va + i] * h
        _quat_step(q, v, h, qa, va, out)
        covered.update(range(qa, qa + 7))
    for i in range(7, len(q)):
        if i in covered:
            continue
        # qpos → dof alignment: the root free joint shifts by 1, each
        # earlier extra free joint by another 1
        shift = 1 + sum(1 for qa, _ in free_spans if qa < i)
        out[i] = q[i] + v[i - shift] * h
    return tuple(out)


def rk4_step_ant(ac: AntConsts, aw: AntWorld, q, v, ctrl, solver_iters=6):
    """One RK4 step (mj tableau) of ac.timestep with contacts+limits."""
    h = ac.timestep
    xf = tuple((bl.qadr, bl.vadr) for bl in aw.balls)

    def acc(q_, v_):
        return forward_ant(ac, aw, q_, v_, ctrl, solver_iters)

    def vadd(a, b, s):
        return tuple(x + y * s for x, y in zip(a, b))

    a1 = acc(q, v)
    q2 = integrate_ant(q, v, h / 2, xf)
    v2 = vadd(v, a1, h / 2)
    a2 = acc(q2, v2)
    q3 = integrate_ant(q, v2, h / 2, xf)
    v3 = vadd(v, a2, h / 2)
    a3 = acc(q3, v3)
    q4 = integrate_ant(q, v3, h, xf)
    v4 = vadd(v, a3, h)
    a4 = acc(q4, v4)
    v_avg = tuple((va + 2 * vb + 2 * vc + vd) / 6.0
                  for va, vb, vc, vd in zip(v, v2, v3, v4))
    a_avg = tuple((aa + 2 * ab + 2 * ac_ + ad) / 6.0
                  for aa, ab, ac_, ad in zip(a1, a2, a3, a4))
    return integrate_ant(q, v_avg, h, xf), vadd(v, a_avg, h)
