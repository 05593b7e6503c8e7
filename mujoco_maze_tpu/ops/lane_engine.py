"""Generic scalar-lane rigid-body engine: any RigidModel as lane math.

:mod:`.ant_math` re-derives the contact pipeline for the *ant topology* as
per-env lane vectors so the whole step fuses into one Pallas kernel.  This
module is the same formulation made generic: every stage (FK, Jacobian-form
mass matrix, RNE bias, the inertia-box fluid model, joint limits, the
contact rows from a :class:`~..physics.contact.ContactSet`, the projected
Jacobi solver, quaternion integration) is driven by the static
:class:`~..physics.model.RigidModel` at trace time, supporting FREE / BALL
/ SLIDE / HINGE joints and any tree topology (multiple roots: the robot
tree plus free world bodies).

It backs the generic fused kernel (:mod:`.engine_pallas`) — the fast path
for *custom* robots composed through the extension API, which the
hand-written kernels don't know about.  Differentially validated against
the vmapped engine in tests/test_engine_pallas.py (swimmer incl. fluid,
ant incl. contacts, block and free-ball worlds).

Conventions identical to physics/engine.py (MuJoCo parity): spatial motion
vectors [ω; v] at the world origin; free-joint qvel is (linear world,
angular body-frame); quaternions (w, x, y, z).
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

from ..physics.model import BALL, FREE, HINGE, SLIDE, RigidModel
from .ant_math import (
    Mat3,
    Vec3,
    _motion_cross,
    _zero3,
    axis_angle_mat3,
    quat_to_mat3,
)
from .swimmer_math import _chol5_solve as chol_solve  # generic n×n unrolled

_NVJ = {FREE: 6, BALL: 3, SLIDE: 1, HINGE: 1}


class LaneWorld(NamedTuple):
    """Static lowering of (RigidModel, ContactSet, env support params)."""

    model: RigidModel
    # contact data (numpy; empty arrays when the world has no contacts)
    sph_body: np.ndarray
    sph_local: np.ndarray
    sph_radius: np.ndarray
    sph_margin: np.ndarray
    sph_solref: np.ndarray
    sph_solimp: np.ndarray
    sph_friction: np.ndarray
    sph_vs_static: np.ndarray
    box_center: np.ndarray
    box_half: np.ndarray
    box_margin: np.ndarray
    has_floor: bool
    floor_margin: float
    pair_i: np.ndarray
    pair_j: np.ndarray
    dbox_body: np.ndarray
    dbox_local: np.ndarray
    dbox_half: np.ndarray
    dbox_margin: np.ndarray
    dbox_solref: np.ndarray
    dbox_solimp: np.ndarray
    dbox_friction: np.ndarray
    qpair_s: np.ndarray
    qpair_b: np.ndarray
    # (bodyidx, zdof, half_z, plats) coupled-support slides (round-5:
    # physics/contact.falling_support_force — platform-aware perch)
    falling: tuple = ()
    n_near_boxes: int = 4


def world_from_spec(spec, n_near_boxes: int = 4) -> LaneWorld:
    """Lower an engine-world MazeEnvSpec (robot + composed world)."""
    cs = spec.contact_set
    return LaneWorld(
        model=spec.dynamic_model,
        sph_body=np.asarray(cs.sph_body, np.int32),
        sph_local=np.asarray(cs.sph_local, np.float64),
        sph_radius=np.asarray(cs.sph_radius, np.float64),
        sph_margin=np.asarray(cs.sph_margin, np.float64),
        sph_solref=np.asarray(cs.sph_solref, np.float64),
        sph_solimp=np.asarray(cs.sph_solimp, np.float64),
        sph_friction=np.asarray(cs.sph_friction, np.float64),
        sph_vs_static=np.asarray(cs.sph_vs_static, bool),
        box_center=np.asarray(cs.box_center, np.float64),
        box_half=np.asarray(cs.box_half, np.float64),
        box_margin=np.asarray(cs.box_margin, np.float64),
        has_floor=bool(cs.has_floor),
        floor_margin=float(cs.floor_margin),
        pair_i=np.asarray(cs.pair_i, np.int32),
        pair_j=np.asarray(cs.pair_j, np.int32),
        dbox_body=np.asarray(cs.dbox_body, np.int32),
        dbox_local=np.asarray(cs.dbox_local, np.float64),
        dbox_half=np.asarray(cs.dbox_half, np.float64),
        dbox_margin=np.asarray(cs.dbox_margin, np.float64),
        dbox_solref=np.asarray(cs.dbox_solref, np.float64),
        dbox_solimp=np.asarray(cs.dbox_solimp, np.float64),
        dbox_friction=np.asarray(cs.dbox_friction, np.float64),
        qpair_s=np.asarray(cs.qpair_s, np.int32),
        qpair_b=np.asarray(cs.qpair_b, np.int32),
        falling=tuple(getattr(spec, "_falling_support", ())),
        n_near_boxes=n_near_boxes,
    )


def smooth_world_from_model(model: RigidModel) -> LaneWorld:
    """A contact-free LaneWorld (smooth dynamics only)."""
    z3 = np.zeros((0, 3))
    z2 = np.zeros((0, 2))
    z1 = np.zeros((0,))
    zi = np.zeros((0,), np.int32)
    return LaneWorld(
        model=model, sph_body=zi, sph_local=z3, sph_radius=z1,
        sph_margin=z1, sph_solref=z2, sph_solimp=z3, sph_friction=z1,
        sph_vs_static=np.zeros((0,), bool), box_center=z3, box_half=z3,
        box_margin=z1, has_floor=False, floor_margin=0.0, pair_i=zi,
        pair_j=zi, dbox_body=zi, dbox_local=z3, dbox_half=z3, dbox_margin=z1,
        dbox_solref=z2, dbox_solimp=z3, dbox_friction=z1, qpair_s=zi,
        qpair_b=zi,
    )


# ---------------------------------------------------------------------------
# static topology helpers
# ---------------------------------------------------------------------------


def _jnt_by_body(model) -> Dict[int, List[int]]:
    out: Dict[int, List[int]] = {}
    for j in range(model.njnt):
        out.setdefault(int(model.jnt_body[j]), []).append(j)
    return out


def _chain_dofs(model) -> Dict[int, List[int]]:
    """body -> dofs on its root path (engine._dofs_of_body_chain parity)."""
    jbb = _jnt_by_body(model)
    chain: Dict[int, List[int]] = {}
    for i in range(model.nbody):
        p = int(model.body_parent[i])
        dofs = list(chain[p]) if p >= 0 else []
        for j in jbb.get(i, []):
            va = int(model.jnt_dofadr[j])
            dofs.extend(range(va, va + _NVJ[int(model.jnt_type[j])]))
        chain[i] = dofs
    return chain


def _trees(model) -> List[List[int]]:
    """Per kinematic tree (root body + descendants), its dof list."""
    chain = _chain_dofs(model)
    root_of = {}
    for i in range(model.nbody):
        p = int(model.body_parent[i])
        root_of[i] = i if p < 0 else root_of[p]
    trees: Dict[int, List[int]] = {}
    jbb = _jnt_by_body(model)
    for i in range(model.nbody):
        dofs = trees.setdefault(root_of[i], [])
        for j in jbb.get(i, []):
            va = int(model.jnt_dofadr[j])
            dofs.extend(range(va, va + _NVJ[int(model.jnt_type[j])]))
    return [sorted(d) for d in trees.values() if d]



def _cvec(x, like) -> Vec3:
    """Static (3,) numpy -> Vec3 of broadcast lane scalars."""
    return Vec3(
        jnp.full_like(like, float(x[0])),
        jnp.full_like(like, float(x[1])),
        jnp.full_like(like, float(x[2])),
    )


def _cmat(Mnp, like) -> Mat3:
    return Mat3(*[
        jnp.full_like(like, float(Mnp[r][c]))
        for r in range(3) for c in range(3)
    ])


def _quat_to_mat_np(q):
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ], np.float64)


# ---------------------------------------------------------------------------
# FK + per-dof motion basis
# ---------------------------------------------------------------------------


class LaneFK(NamedTuple):
    R: list            # per body Mat3
    pos: list          # per body Vec3
    com: list          # per body Vec3
    # per dof: (W Vec3 | None, anchor Vec3 | axis Vec3) — rotational dofs
    # store (axis, anchor); linear dofs store (None, axis)
    dof_W: list
    dof_ref: list


def fk_lane(model: RigidModel, q) -> LaneFK:
    """q: tuple of nq lane scalars.  engine.fk parity."""
    like = q[0]
    jbb = _jnt_by_body(model)
    R_list, p_list, c_list = [], [], []
    dof_W = [None] * model.nv
    dof_ref = [None] * model.nv
    one = jnp.ones_like(like)
    zero = jnp.zeros_like(like)
    eye = Mat3(one, zero, zero, zero, one, zero, zero, zero, one)
    for i in range(model.nbody):
        p = int(model.body_parent[i])
        R_par = R_list[p] if p >= 0 else eye
        p_par = p_list[p] if p >= 0 else _zero3(like)
        R = R_par.mul(_cmat(_quat_to_mat_np(model.body_quat[i]), like))
        pos = p_par + R_par.mul_vec(_cvec(model.body_pos[i], like))
        for j in jbb.get(i, []):
            jt = int(model.jnt_type[j])
            qa = int(model.jnt_qposadr[j])
            va = int(model.jnt_dofadr[j])
            axis = _cvec(model.jnt_axis[j], like)
            jpos = _cvec(model.jnt_pos[j], like)
            if jt == FREE:
                pos = Vec3(q[qa], q[qa + 1], q[qa + 2])
                R = quat_to_mat3(q[qa + 3], q[qa + 4], q[qa + 5], q[qa + 6])
                for k in range(3):
                    e = [zero, zero, zero]
                    e[k] = one
                    dof_W[va + k] = None
                    dof_ref[va + k] = Vec3(*e)
                for k in range(3):
                    dof_W[va + 3 + k] = R.col(k)
                    dof_ref[va + 3 + k] = pos
            elif jt == BALL:
                Rj = quat_to_mat3(q[qa], q[qa + 1], q[qa + 2], q[qa + 3])
                anchor = pos + R.mul_vec(jpos)
                R = R.mul(Rj)
                pos = anchor - R.mul_vec(jpos)
                for k in range(3):
                    dof_W[va + k] = R.col(k)
                    dof_ref[va + k] = anchor
            elif jt == SLIDE:
                axis_w = R.mul_vec(axis)
                pos = pos + axis_w.scale(q[qa])
                dof_W[va] = None
                dof_ref[va] = axis_w
            elif jt == HINGE:
                axis_w = R.mul_vec(axis)
                Rj = axis_angle_mat3(axis_w, q[qa])
                anchor = pos + R.mul_vec(jpos)
                R = Rj.mul(R)
                pos = anchor - R.mul_vec(jpos)
                dof_W[va] = axis_w
                dof_ref[va] = anchor
        R_list.append(R)
        p_list.append(pos)
        c_list.append(pos + R.mul_vec(_cvec(model.body_com[i], like)))
    return LaneFK(R_list, p_list, c_list, dof_W, dof_ref)


def point_jacobian(fk: LaneFK, chain: List[int], point: Vec3):
    """{dof: (W | None, J)} — velocity basis of ``point`` for chain dofs."""
    out = {}
    for d in chain:
        W = fk.dof_W[d]
        if W is None:
            out[d] = (None, fk.dof_ref[d])
        else:
            out[d] = (W, W.cross(point - fk.dof_ref[d]))
    return out


# ---------------------------------------------------------------------------
# mass matrix (Jacobian form) and RNE bias
# ---------------------------------------------------------------------------


def _world_inertia(model, fk, i, like) -> Mat3:
    R = fk.R[i]
    Icm = _cmat(np.asarray(model.body_inertia[i]), like)
    Rt = Mat3(R.xx, R.yx, R.zx, R.xy, R.yy, R.zy, R.xz, R.yz, R.zz)
    return R.mul(Icm).mul(Rt)


def mass_blocks(model: RigidModel, fk: LaneFK, chain: Dict[int, List[int]],
                trees: List[List[int]], like):
    """Per-tree dense mass matrix (list-of-lists of lanes, +armature)."""
    nv = model.nv
    M = [[None] * nv for _ in range(nv)]
    for t, dofs in enumerate(trees):
        for d1 in dofs:
            for d2 in dofs:
                M[d1][d2] = jnp.zeros_like(like)
    for k in range(model.nbody):
        dofs = chain[k]
        if not dofs:
            continue
        m = float(model.body_mass[k])
        Iw = _world_inertia(model, fk, k, like)
        jac = point_jacobian(fk, dofs, fk.com[k])
        cache = {}
        for d in dofs:
            W, J = jac[d]
            cache[d] = (W, J, Iw.mul_vec(W) if W is not None else None)
        for ii, d1 in enumerate(dofs):
            W1, J1, IwW1 = cache[d1]
            for d2 in dofs[ii:]:
                W2, J2, _ = cache[d2]
                term = J1.dot(J2) * m
                if W1 is not None and W2 is not None:
                    term = term + W2.dot(IwW1)
                lo, hi = min(d1, d2), max(d1, d2)
                M[lo][hi] = M[lo][hi] + term
    for t, dofs in enumerate(trees):
        for ii, d1 in enumerate(dofs):
            M[d1][d1] = M[d1][d1] + float(model.dof_armature[d1])
            for d2 in dofs[:ii]:
                M[d1][d2] = M[d2][d1]
    return M


def rne_bias_lane(model: RigidModel, fk: LaneFK, v, like):
    """Gravity + velocity-product bias per dof (engine.rne_bias parity)."""
    jbb = _jnt_by_body(model)
    zero3 = _zero3(like)

    # cdof per dof as (w Vec3, vel Vec3) at world origin
    cdof = [None] * model.nv
    for d in range(model.nv):
        W = fk.dof_W[d]
        if W is None:
            cdof[d] = (zero3, fk.dof_ref[d])
        else:
            cdof[d] = (W, fk.dof_ref[d].cross(W))

    # body velocities + cdofdot (engine.kin_dyn rules)
    cdofdot = [None] * model.nv
    body_vel = []
    for i in range(model.nbody):
        p = int(model.body_parent[i])
        bv = body_vel[p] if p >= 0 else (zero3, zero3)
        for j in jbb.get(i, []):
            jt = int(model.jnt_type[j])
            va = int(model.jnt_dofadr[j])
            if jt == FREE:
                for k in range(3):
                    bv = (bv[0], bv[1] + cdof[va + k][1].scale(v[va + k]))
                    cdofdot[va + k] = (zero3, zero3)
                for k in range(3):
                    bv = (bv[0] + cdof[va + 3 + k][0].scale(v[va + 3 + k]),
                          bv[1] + cdof[va + 3 + k][1].scale(v[va + 3 + k]))
                for k in range(3):
                    cdofdot[va + 3 + k] = _motion_cross(
                        *bv, *cdof[va + 3 + k])
            elif jt == BALL:
                for k in range(3):
                    bv = (bv[0] + cdof[va + k][0].scale(v[va + k]),
                          bv[1] + cdof[va + k][1].scale(v[va + k]))
                for k in range(3):
                    cdofdot[va + k] = _motion_cross(*bv, *cdof[va + k])
            else:
                cdofdot[va] = _motion_cross(*bv, *cdof[va])
                bv = (bv[0] + cdof[va][0].scale(v[va]),
                      bv[1] + cdof[va][1].scale(v[va]))
        body_vel.append(bv)

    # cacc with fictitious base acceleration -gravity
    g = np.asarray(model.gravity, np.float64)
    a_base = (zero3, _cvec(-g, like))
    cacc = []
    for i in range(model.nbody):
        p = int(model.body_parent[i])
        a = cacc[p] if p >= 0 else a_base
        for j in jbb.get(i, []):
            va = int(model.jnt_dofadr[j])
            for k in range(_NVJ[int(model.jnt_type[j])]):
                a = (a[0] + cdofdot[va + k][0].scale(v[va + k]),
                     a[1] + cdofdot[va + k][1].scale(v[va + k]))
        cacc.append(a)

    # spatial force per body: f = I a + v ×* (I v)
    def spatial_I_mul(i, mot):
        alpha, a_lin = mot
        m = float(model.body_mass[i])
        c = fk.com[i]
        Iw = _world_inertia(model, fk, i, like)
        IwA = Iw.mul_vec(alpha)
        moment = IwA - c.cross(c.cross(alpha)).scale(m) + c.cross(
            a_lin).scale(m)
        force = (a_lin - c.cross(alpha)).scale(m)
        return moment, force

    def fcross(mot, frc):
        w, vl = mot
        mang, mlin = frc
        return (w.cross(mang) + vl.cross(mlin), w.cross(mlin))

    cfrc = []
    for i in range(model.nbody):
        Ia = spatial_I_mul(i, cacc[i])
        Iv = spatial_I_mul(i, body_vel[i])
        vxf = fcross(body_vel[i], Iv)
        cfrc.append((Ia[0] + vxf[0], Ia[1] + vxf[1]))

    # subtree accumulation (children before parents: reversed body order)
    sub = list(cfrc)
    for i in reversed(range(model.nbody)):
        p = int(model.body_parent[i])
        if p >= 0:
            sub[p] = (sub[p][0] + sub[i][0], sub[p][1] + sub[i][1])

    dof_body = {}
    for j in range(model.njnt):
        va = int(model.jnt_dofadr[j])
        for k in range(_NVJ[int(model.jnt_type[j])]):
            dof_body[va + k] = int(model.jnt_body[j])
    bias = []
    for d in range(model.nv):
        w, vl = cdof[d]
        f = sub[dof_body[d]]
        bias.append(w.dot(f[0]) + vl.dot(f[1]))
    return bias, cdof, body_vel


def fluid_lane(model: RigidModel, fk: LaneFK, cdof, body_vel,
               chain: Dict[int, List[int]], like):
    """MuJoCo inertia-box fluid model (engine.fluid_force parity)."""
    nv = model.nv
    qfrc = [jnp.zeros_like(like) for _ in range(nv)]
    if model.viscosity == 0.0 and model.fluid_density == 0.0:
        return qfrc
    pi = np.pi
    for i in range(model.nbody):
        if model.body_mass[i] <= 0:
            continue
        R = fk.R[i]
        com = fk.com[i]
        w_w, vl = body_vel[i]
        v_w = vl + w_w.cross(com)
        w_b = R.tmul_vec(w_w)
        v_b = R.tmul_vec(v_w)
        box = 2.0 * np.asarray(model.body_fluid_box[i], np.float64)
        force = _zero3(like)
        torque = _zero3(like)
        if model.viscosity > 0:
            diam = float(np.mean(box))
            force = force + v_b.scale(-3.0 * pi * diam * model.viscosity)
            torque = torque + w_b.scale(-pi * diam**3 * model.viscosity)
        if model.fluid_density > 0:
            fr, tr = [], []
            for k in range(3):
                j, l = (k + 1) % 3, (k + 2) % 3
                vk = (v_b.x, v_b.y, v_b.z)[k]
                wk = (w_b.x, w_b.y, w_b.z)[k]
                fr.append((force.x, force.y, force.z)[k]
                          - 0.5 * model.fluid_density
                          * float(box[j] * box[l]) * jnp.abs(vk) * vk)
                tr.append((torque.x, torque.y, torque.z)[k]
                          - model.fluid_density * float(box[k])
                          * float(box[j]**4 + box[l]**4) / 64.0
                          * jnp.abs(wk) * wk)
            force = Vec3(*fr)
            torque = Vec3(*tr)
        f_w = R.mul_vec(force)
        t_w = R.mul_vec(torque)
        fs = (t_w + com.cross(f_w), f_w)
        for d in chain[i]:
            w, vl_d = cdof[d]
            qfrc[d] = qfrc[d] + w.dot(fs[0]) + vl_d.dot(fs[1])
    return qfrc


# ---------------------------------------------------------------------------
# contacts: candidate rows from the ContactSet
# ---------------------------------------------------------------------------


def _contact_rows_lane(lw: LaneWorld, model, fk: LaneFK,
                       chain: Dict[int, List[int]], like):
    """Rows: dict(p, n, dist, margin, jparts, solpar) — jparts is
    [(chain_dofs, jac, sign)] / [(xdofs,)...] resolved lazily in the
    solver.  Mixing rules follow contact.contact_qfrc."""
    rows = []
    S = len(lw.sph_body)
    if S == 0:
        return rows
    centers = []
    for s in range(S):
        k = int(lw.sph_body[s])
        centers.append(fk.pos[k] + fk.R[k].mul_vec(
            _cvec(lw.sph_local[s], like)))
    up = Vec3(jnp.zeros_like(like), jnp.zeros_like(like),
              jnp.ones_like(like))
    tc_clamp = 2.0 * float(model.timestep)

    def solpar(srf, sim, fric):
        return (float(sim[0]), float(sim[1]), float(sim[2]),
                max(float(srf[0]), tc_clamp), float(fric))

    # floor
    if lw.has_floor:
        for s in np.nonzero(lw.sph_vs_static)[0]:
            c = centers[s]
            r = float(lw.sph_radius[s])
            rows.append(dict(
                p=Vec3(c.x, c.y, c.z - r), n=up, dist=c.z - r,
                margin=float(lw.sph_margin[s]) + lw.floor_margin,
                bodies=((int(lw.sph_body[s]), 1.0),), xdofs=(),
                solpar=solpar(lw.sph_solref[s], lw.sph_solimp[s],
                              lw.sph_friction[s])))

    # static AABBs: group spheres by tree root, prune boxes per root anchor
    Bx = len(lw.box_center)
    if Bx > 0:
        root_of = {}
        for i in range(model.nbody):
            p = int(model.body_parent[i])
            root_of[i] = i if p < 0 else root_of[p]
        by_root: Dict[int, List[int]] = {}
        for s in np.nonzero(lw.sph_vs_static)[0]:
            by_root.setdefault(root_of[int(lw.sph_body[s])], []).append(s)
        NB = min(lw.n_near_boxes, Bx)
        for root, sphs in by_root.items():
            anchor = fk.pos[root]
            # branch-free nearest-NB boxes to the root anchor
            INF = jnp.full_like(like, np.inf)
            near = [dict(d=INF, c=_zero3(like), h=_zero3(like),
                         m=jnp.zeros_like(like)) for _ in range(NB)]
            for b in range(Bx):
                bc, bh = lw.box_center[b], lw.box_half[b]
                dx = jnp.maximum(jnp.abs(anchor.x - float(bc[0]))
                                 - float(bh[0]), 0.0)
                dy = jnp.maximum(jnp.abs(anchor.y - float(bc[1]))
                                 - float(bh[1]), 0.0)
                dz = jnp.maximum(jnp.abs(anchor.z - float(bc[2]))
                                 - float(bh[2]), 0.0)
                cur = dict(
                    d=dx * dx + dy * dy + dz * dz,
                    c=_cvec(bc, like), h=_cvec(bh, like),
                    m=jnp.full_like(like, float(lw.box_margin[b])))
                for slot in range(NB):
                    better = cur["d"] < near[slot]["d"]

                    def pick(cond, a, b_):
                        if isinstance(a, Vec3):
                            return Vec3(jnp.where(cond, a.x, b_.x),
                                        jnp.where(cond, a.y, b_.y),
                                        jnp.where(cond, a.z, b_.z))
                        return jnp.where(cond, a, b_)

                    new_slot = {k_: pick(better, cur[k_], near[slot][k_])
                                for k_ in cur}
                    cur = {k_: pick(better, near[slot][k_], cur[k_])
                           for k_ in cur}
                    near[slot] = new_slot
            for s in sphs:
                c = centers[s]
                r = float(lw.sph_radius[s])
                body = int(lw.sph_body[s])
                sp = solpar(lw.sph_solref[s], lw.sph_solimp[s],
                            lw.sph_friction[s])
                cand = []
                for slot in range(NB):
                    nb = near[slot]
                    res = _sphere_box_lane(c, r, nb["c"], nb["h"])
                    cand.append((res[2] - nb["m"],) + res + (nb["m"],))
                sel = _keep2(cand, like)
                for p, n, dist, marg in sel:
                    rows.append(dict(
                        p=p, n=n, dist=dist,
                        margin=float(lw.sph_margin[s]) + marg,
                        bodies=((body, 1.0),), xdofs=(), solpar=sp))

    # dynamic sphere-sphere pairs
    for pi_ in range(len(lw.pair_i)):
        i, j = int(lw.pair_i[pi_]), int(lw.pair_j[pi_])
        ci, cj = centers[i], centers[j]
        ri, rj = float(lw.sph_radius[i]), float(lw.sph_radius[j])
        d = ci - cj
        dn = jnp.sqrt(d.dot(d) + 1e-12)
        n = d.scale(1.0 / dn)
        dist = dn - (ri + rj)
        pos = cj + n.scale(rj + dist * 0.5)
        rows.append(dict(
            p=pos, n=n, dist=dist,
            margin=float(lw.sph_margin[i] + lw.sph_margin[j]),
            bodies=((int(lw.sph_body[i]), 1.0), (int(lw.sph_body[j]), -1.0)),
            xdofs=(),
            solpar=solpar((lw.sph_solref[i] + lw.sph_solref[j]) / 2,
                          (lw.sph_solimp[i] + lw.sph_solimp[j]) / 2,
                          max(lw.sph_friction[i], lw.sph_friction[j]))))

    # spheres vs dynamic boxes (axis-aligned: maze blocks never rotate)
    for pq in range(len(lw.qpair_s)):
        s, bi = int(lw.qpair_s[pq]), int(lw.qpair_b[pq])
        c = centers[s]
        r = float(lw.sph_radius[s])
        bbody = int(lw.dbox_body[bi])
        bc = fk.pos[bbody] + fk.R[bbody].mul_vec(
            _cvec(lw.dbox_local[bi], like))
        # block bodies are slide-jointed: rotation stays identity, so the
        # box is an AABB at its current center (physics/contact.py treats
        # the general rotated case; slide-only is exact here)
        res = _sphere_box_lane(c, r, bc, _cvec(lw.dbox_half[bi], like))
        p, n, dist = res
        rows.append(dict(
            p=p, n=n, dist=dist,
            margin=float(lw.sph_margin[s] + lw.dbox_margin[bi]),
            bodies=((int(lw.sph_body[s]), 1.0), (bbody, -1.0)), xdofs=(),
            solpar=solpar((lw.sph_solref[s] + lw.dbox_solref[bi]) / 2,
                          (lw.sph_solimp[s] + lw.dbox_solimp[bi]) / 2,
                          max(lw.sph_friction[s], lw.dbox_friction[bi]))))
    return rows


def _sphere_box_lane(c: Vec3, r: float, bc: Vec3, bh: Vec3):
    """Sphere vs box (lane Vec3 center/half): (pos, normal, dist)."""
    lx, ly, lz = c.x - bc.x, c.y - bc.y, c.z - bc.z
    clx = jnp.clip(lx, -bh.x, bh.x)
    cly = jnp.clip(ly, -bh.y, bh.y)
    clz = jnp.clip(lz, -bh.z, bh.z)
    dxo, dyo, dzo = lx - clx, ly - cly, lz - clz
    d_out = jnp.sqrt(dxo * dxo + dyo * dyo + dzo * dzo + 1e-12)
    outside = d_out > 1e-6
    ex = bh.x - jnp.abs(lx)
    ey = bh.y - jnp.abs(ly)
    ez = bh.z - jnp.abs(lz)
    mmin = jnp.minimum(jnp.minimum(ex, ey), ez)
    is_x = ex <= jnp.minimum(ey, ez)
    is_y = (~is_x) & (ey <= ez)
    is_z = (~is_x) & (~is_y)
    nix = jnp.where(is_x, jnp.where(lx >= 0, 1.0, -1.0), 0.0)
    niy = jnp.where(is_y, jnp.where(ly >= 0, 1.0, -1.0), 0.0)
    niz = jnp.where(is_z, jnp.where(lz >= 0, 1.0, -1.0), 0.0)
    dist = jnp.where(outside, d_out - r, -mmin - r)
    n = Vec3(jnp.where(outside, dxo / d_out, nix),
             jnp.where(outside, dyo / d_out, niy),
             jnp.where(outside, dzo / d_out, niz))
    p = Vec3(bc.x + jnp.where(outside, clx, lx - nix * (-mmin)),
             bc.y + jnp.where(outside, cly, ly - niy * (-mmin)),
             bc.z + jnp.where(outside, clz, lz - niz * (-mmin)))
    return p, n, dist


def _keep2(cand, like):
    """Branch-free nearest-2 of (eff, p, n, dist, margin) candidates."""
    if len(cand) <= 2:
        return [(p, n, d, m) for _, p, n, d, m in cand]
    INF = jnp.full_like(like, np.inf)
    best = [INF, _zero3(like), _zero3(like), like * 0, like * 0]
    second = [INF, _zero3(like), _zero3(like), like * 0, like * 0]
    for eff, p, n, dist, marg in cand:
        cur = [eff, p, n, dist, marg]
        b1 = cur[0] < best[0]
        b2 = (~b1) & (cur[0] < second[0])

        def pick(cond, a, b_):
            if isinstance(a, Vec3):
                return Vec3(jnp.where(cond, a.x, b_.x),
                            jnp.where(cond, a.y, b_.y),
                            jnp.where(cond, a.z, b_.z))
            return jnp.where(cond, a, b_)

        new_second = [pick(b1, bb, pick(b2, cc, ss))
                      for bb, cc, ss in zip(best, cur, second)]
        best = [pick(b1, cc, bb) for cc, bb in zip(cur, best)]
        second = new_second
    return [(sel[1], sel[2], sel[3], sel[4]) for sel in (best, second)]


# ---------------------------------------------------------------------------
# forward dynamics
# ---------------------------------------------------------------------------


def forward_lane(lw: LaneWorld, q, v, ctrl, solver_iters: int | None = None):
    """qacc (tuple of nv lanes): smooth + limits + contacts.

    Transliteration of engine.forward + contact.contact_qfrc in the lane
    formulation, generic over the model topology."""
    if solver_iters is None:
        from ..physics.contact import CONTACT_SOLVER_ITERS

        solver_iters = CONTACT_SOLVER_ITERS  # lane == engine parity
    model = lw.model
    like = q[0]
    nv = model.nv
    fk = fk_lane(model, q)
    chain = _chain_dofs(model)
    trees = _trees(model)
    M = mass_blocks(model, fk, chain, trees, like)
    bias, cdof, body_vel = rne_bias_lane(model, fk, v, like)
    qfrc_fluid = fluid_lane(model, fk, cdof, body_vel, chain, like)

    tau = [jnp.zeros_like(like) for _ in range(nv)]
    for u in range(model.nu):
        lo, hi = model.act_ctrlrange[u]
        c = jnp.clip(ctrl[u], float(lo), float(hi))
        d = int(model.act_dofadr[u])
        tau[d] = tau[d] + float(model.act_gear[u]) * c
    for d in range(nv):
        tau[d] = (tau[d] + qfrc_fluid[d]
                  - float(model.dof_damping[d]) * v[d])

    # per-tree Cholesky solves
    def tree_solve(rhs):
        out = [None] * nv
        for dofs in trees:
            if len(dofs) == 1:
                d = dofs[0]
                out[d] = rhs[d] / M[d][d]
            else:
                Msub = [[M[d1][d2] for d2 in dofs] for d1 in dofs]
                sol, _ = chol_solve(Msub, [rhs[d] for d in dofs])
                for k, d in enumerate(dofs):
                    out[d] = sol[k]
        return out

    qacc0 = tree_solve([tau[d] - bias[d] for d in range(nv)])

    # per-tree Minv columns (for limits' m_eff and contact A/propagation)
    minv = {}  # (d1, d2) -> lane; only within-tree pairs stored
    for dofs in trees:
        if len(dofs) == 1:
            d = dofs[0]
            minv[(d, d)] = 1.0 / M[d][d]
            continue
        Msub = [[M[d1][d2] for d2 in dofs] for d1 in dofs]
        n = len(dofs)
        one = jnp.ones_like(like)
        zero = jnp.zeros_like(like)
        for kk, dcol in enumerate(dofs):
            e = [one if ii == kk else zero for ii in range(n)]
            col, _ = chol_solve(Msub, e)
            for ii, drow in enumerate(dofs):
                minv[(drow, dcol)] = col[ii]

    def minv_entry(d1, d2):
        return minv.get((d1, d2))

    f_con = [jnp.zeros_like(like) for _ in range(nv)]

    # joint limits (engine.limit_force parity)
    tc = max(0.02, 2.0 * float(model.timestep))
    d0l, dmaxl, widthl = 0.9, 0.95, 0.001
    b_l = 2.0 / (dmaxl * tc)
    for j in range(model.njnt):
        if not model.jnt_limited[j]:
            continue
        jt = int(model.jnt_type[j])
        if jt not in (HINGE, SLIDE):
            continue
        qa = int(model.jnt_qposadr[j])
        va = int(model.jnt_dofadr[j])
        lo, hi = model.jnt_range[j]
        qd, vd, a0 = q[qa], v[va], qacc0[va]
        m_eff = 1.0 / jnp.maximum(minv[(va, va)], 1e-12)
        for sign, viol in ((1.0, jnp.maximum(qd - float(hi), 0.0)),
                           (-1.0, jnp.maximum(float(lo) - qd, 0.0))):
            active = viol > 0
            dimp = d0l + (dmaxl - d0l) * jnp.clip(viol / widthl, 0.0, 1.0)
            k_imp = dimp / (dmaxl * dmaxl * tc * tc)
            aref = -b_l * (sign * vd) - k_imp * viol
            f_out = jnp.minimum(m_eff * dimp * (aref - sign * a0), 0.0)
            f_con[va] = f_con[va] + jnp.where(active, sign * f_out, 0.0)

    # falling-block coupled platform-support + z-limit (envs/env.py
    # support_qfrc parity, physics/contact.falling_support_force)
    tcs = max(0.02, 2.0 * float(model.timestep))
    for bodyidx, zdof, half_z, plats in lw.falling:
        from ..physics.contact import falling_support_force

        bpz = float(model.body_pos[bodyidx][2])
        zq = fk.pos[bodyidx].z - bpz
        bottom = bpz + zq - half_z
        cxb, cyb = fk.pos[bodyidx].x, fk.pos[bodyidx].y
        s = jnp.zeros_like(zq)
        for (px, py, ox, oy, top) in plats:
            over = ((jnp.abs(cxb - px) < ox) & (jnp.abs(cyb - py) < oy))
            s = jnp.maximum(s, jnp.where(over, top, 0.0))
        f_net = falling_support_force(
            zq, bottom, s, v[zdof], qacc0[zdof],
            minv[(zdof, zdof)] + 1e-12, tcs)
        f_con[zdof] = f_con[zdof] + f_net

    # contacts
    rows = _contact_rows_lane(lw, model, fk, chain, like)
    if rows:
        triples = []
        mus = []
        for c in rows:
            nrm = c["n"]
            use_x = jnp.abs(nrm.x) < 0.5
            ref = Vec3(jnp.where(use_x, 1.0, 0.0),
                       jnp.where(use_x, 0.0, 1.0), jnp.zeros_like(like))
            t1 = nrm.cross(ref)
            t1n = jnp.sqrt(t1.dot(t1) + 1e-12)
            t1 = Vec3(t1.x / t1n, t1.y / t1n, t1.z / t1n)
            t2 = nrm.cross(t1)

            def jrow(direction, c=c):
                row = {}
                for body, sgn in c["bodies"]:
                    jac = point_jacobian(fk, chain[body], c["p"])
                    for d, (W, J) in jac.items():
                        val = J.dot(direction) * sgn
                        row[d] = row.get(d, jnp.zeros_like(like)) + val
                return row

            d0c, dmaxc, widthc, tcc, mu_c = c["solpar"]
            mus.append(mu_c)
            b_imp = 2.0 / (dmaxc * tcc)
            active = c["dist"] < c["margin"]
            r = c["dist"] - c["margin"]
            imp = d0c + (dmaxc - d0c) * jnp.clip(-r / widthc, 0.0, 1.0)
            k_imp = imp / (dmaxc * dmaxc * tcc * tcc)
            trip = []
            for kind, row in (("n", jrow(nrm)), ("t1", jrow(t1)),
                              ("t2", jrow(t2))):
                A = jnp.zeros_like(like)
                for d1, v1 in row.items():
                    for d2, v2 in row.items():
                        mv = minv_entry(d1, d2)
                        if mv is None:
                            continue
                        A = A + v1 * mv * v2
                A = A + 1e-9
                v_r = sum(val * v[d] for d, val in row.items())
                a0_r = sum(val * qacc0[d] for d, val in row.items())
                aref = (-b_imp * v_r - k_imp * r if kind == "n"
                        else -b_imp * v_r)
                trip.append(dict(row=row, A=A, aref=aref, a0=a0_r,
                                 imp=imp, active=active))
            triples.append(trip)
        nc = len(rows)
        # row layout [n..., t1..., t2...] (contact.py/ant_math parity)
        all_rows = ([t[0] for t in triples] + [t[1] for t in triples]
                    + [t[2] for t in triples])
        denom = []
        for rr in all_rows:
            Rreg = (1.0 - rr["imp"]) / jnp.maximum(rr["imp"], 1e-6) * rr["A"]
            denom.append(rr["A"] + Rreg + 1e-9)
            rr["Rreg"] = Rreg

        def project(fs):
            out = list(fs)
            for i in range(nc):
                fn = jnp.maximum(fs[i], 0.0)
                fn = jnp.where(all_rows[i]["active"], fn, 0.0)
                ft1, ft2 = fs[nc + i], fs[2 * nc + i]
                ftn = jnp.sqrt(ft1 * ft1 + ft2 * ft2 + 1e-12)
                scale = jnp.minimum(1.0, mus[i] * fn / ftn)
                out[i] = fn
                out[nc + i] = jnp.where(
                    all_rows[nc + i]["active"], ft1 * scale, 0.0)
                out[2 * nc + i] = jnp.where(
                    all_rows[2 * nc + i]["active"], ft2 * scale, 0.0)
            return out

        fs = project([(rr["aref"] - rr["a0"]) / dn
                      for rr, dn in zip(all_rows, denom)])
        omega = 0.6
        for _ in range(solver_iters):
            x = [jnp.zeros_like(like) for _ in range(nv)]
            for rr, f in zip(all_rows, fs):
                for d, val in rr["row"].items():
                    x[d] = x[d] + val * f
            # x <- Minv x (within trees)
            x2 = [jnp.zeros_like(like) for _ in range(nv)]
            for dofs in trees:
                for d1 in dofs:
                    acc = jnp.zeros_like(like)
                    for d2 in dofs:
                        acc = acc + minv[(d1, d2)] * x[d2]
                    x2[d1] = acc
            new_fs = []
            for rr, f, dn in zip(all_rows, fs, denom):
                a_f = sum(val * x2[d] for d, val in rr["row"].items())
                resid = rr["aref"] - rr["a0"] - a_f - rr["Rreg"] * f
                new_fs.append(f + omega * resid / dn)
            fs = project(new_fs)
        for rr, f in zip(all_rows, fs):
            for d, val in rr["row"].items():
                f_con[d] = f_con[d] + val * f

    return tuple(tree_solve([tau[d] + f_con[d] - bias[d]
                             for d in range(nv)]))


# ---------------------------------------------------------------------------
# integration
# ---------------------------------------------------------------------------


def _quat_step_lane(q, v, h, qa, va, out):
    wx, wy, wz = v[va], v[va + 1], v[va + 2]
    angle = jnp.sqrt(wx * wx + wy * wy + wz * wz + 1e-18)
    half = angle * h * 0.5
    sh = jnp.sin(half) / angle
    dw = jnp.cos(half)
    dx, dy, dz = wx * sh, wy * sh, wz * sh
    qw, qx, qy, qz = q[qa], q[qa + 1], q[qa + 2], q[qa + 3]
    nw = qw * dw - qx * dx - qy * dy - qz * dz
    nx = qw * dx + qx * dw + qy * dz - qz * dy
    ny = qw * dy - qx * dz + qy * dw + qz * dx
    nz = qw * dz + qx * dy - qy * dx + qz * dw
    norm = jnp.sqrt(nw * nw + nx * nx + ny * ny + nz * nz)
    out[qa], out[qa + 1], out[qa + 2], out[qa + 3] = (
        nw / norm, nx / norm, ny / norm, nz / norm)


def integrate_lane(model: RigidModel, q, v, h):
    """q ⊞ v·h with MuJoCo quaternion semantics (engine.integrate_pos)."""
    out = list(q)
    for j in range(model.njnt):
        jt = int(model.jnt_type[j])
        qa = int(model.jnt_qposadr[j])
        va = int(model.jnt_dofadr[j])
        if jt == FREE:
            for k in range(3):
                out[qa + k] = q[qa + k] + v[va + k] * h
            _quat_step_lane(q, v, h, qa + 3, va + 3, out)
        elif jt == BALL:
            _quat_step_lane(q, v, h, qa, va, out)
        else:
            out[qa] = q[qa] + v[va] * h
    return tuple(out)


def rk4_step_lane(lw: LaneWorld, q, v, ctrl, solver_iters: int | None = None):
    """One RK4 step of lw.model.timestep (engine.rk4_step tableau)."""
    model = lw.model
    h = float(model.timestep)

    def acc(q_, v_):
        return forward_lane(lw, q_, v_, ctrl, solver_iters)

    def vadd(a, b, s):
        return tuple(x + y * s for x, y in zip(a, b))

    a1 = acc(q, v)
    q2 = integrate_lane(model, q, v, h / 2)
    v2 = vadd(v, a1, h / 2)
    a2 = acc(q2, v2)
    q3 = integrate_lane(model, q, v2, h / 2)
    v3 = vadd(v, a2, h / 2)
    a3 = acc(q3, v3)
    q4 = integrate_lane(model, q, v3, h)
    v4 = vadd(v, a3, h)
    a4 = acc(q4, v4)
    v_avg = tuple((va + 2 * vb + 2 * vc + vd) / 6.0
                  for va, vb, vc, vd in zip(v, v2, v3, v4))
    a_avg = tuple((aa + 2 * ab + 2 * ac_ + ad) / 6.0
                  for aa, ab, ac_, ad in zip(a1, a2, a3, a4))
    return integrate_lane(model, q, v_avg, h), vadd(v, a_avg, h)
