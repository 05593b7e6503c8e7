"""Batch-last ("lane-major") generic forward dynamics: the XLA fallback.

The per-env engine (:mod:`.engine` + :mod:`.contact`) vectorizes with
``jax.vmap``, which leaves every intermediate shaped ``(B, small, small)``.
This module is the same pipeline *transposed*: every dynamic array carries
the batch as its LAST axis — vectors are ``(3, B)``, rotations
``(3, 3, B)``, the mass matrix ``(nv, nv, B)`` — so the batch rides the
128-wide VPU lanes at full utilization.

Measured on a v5e chip (AntUMaze @4096, B=4096): 65K env-steps/s vs the
vmapped path's 59K — only +10%, because the path is NOT lane-bound: stage
profiling shows the smooth tree stages (FK/velocity kinematics, hundreds
of small stacked ops each lowering to its own fused kernel) dominate at
~28 ms/forward while the dense contact solve adds only ~2.4 ms.  The
pipeline is dispatch/fusion-bound, and the two escape hatches both dead-
end in XLA: per-component scalar unrolling (ant_math style) exceeds
practical XLA:TPU compile time even for a single forward instance, and
further batching across tree levels trades little for much complexity.
The structural fix is a single fused launch — the Pallas kernels
(:mod:`..ops`), which cover every registered env ID at 7-9x this path.
This module remains the *generic* fallback for custom robots composed
through the extension API (any RigidModel topology), and the measured
analysis above is why it is a fallback rather than the fast path.

Semantics are a transliteration of ``engine.forward``/``contact.
contact_qfrc``/``engine.rk4_step`` (same constants, same candidate
enumeration, same projected-Jacobi solver) and are differentially tested
against the vmapped path in tests/test_engine_batched.py.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .model import BALL, FREE, HINGE, SLIDE, RigidModel
from . import engine as _eng

# ---------------------------------------------------------------------------
# batch-last (component-major) small algebra
# ---------------------------------------------------------------------------


def _const(x, dtype, trail=1):
    """Static numpy constant -> jnp array with a broadcastable batch axis."""
    a = jnp.asarray(np.asarray(x, np.float64), dtype)
    return a.reshape(a.shape + (1,) * trail)


def quat_to_mat_b(q):
    """(4, B) -> (3, 3, B)."""
    w, x, y, z = q[0], q[1], q[2], q[3]
    rows = [
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ]
    return jnp.stack([jnp.stack(r) for r in rows])


def m3_mul(A, B):
    """(3,3,*) @ (3,3,*) with trailing broadcast."""
    return jnp.stack([
        jnp.stack([
            sum(A[i, k] * B[k, j] for k in range(3)) for j in range(3)
        ]) for i in range(3)
    ])


def m3_vec(A, v):
    """(3,3,*) @ (3,*)."""
    return jnp.stack([sum(A[i, k] * v[k] for k in range(3)) for i in range(3)])


def m3T_vec(A, v):
    return jnp.stack([sum(A[k, i] * v[k] for k in range(3)) for i in range(3)])


def m3_T(A):
    return jnp.stack([
        jnp.stack([A[j, i] for j in range(3)]) for i in range(3)
    ])


def cross_b(a, b):
    return jnp.stack([
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    ])


def skew_b(v):
    z = jnp.zeros_like(v[0])
    return jnp.stack([
        jnp.stack([z, -v[2], v[1]]),
        jnp.stack([v[2], z, -v[0]]),
        jnp.stack([-v[1], v[0], z]),
    ])


def motion_cross_b(v, m):
    """v ×ₘ m on (6, *) spatial motion vectors (engine parity)."""
    w, vl = v[:3], v[3:]
    mw, ml = m[:3], m[3:]
    return jnp.concatenate([cross_b(w, mw), cross_b(w, ml) + cross_b(vl, mw)])


def force_cross_b(v, f):
    w, vl = v[:3], v[3:]
    fm, fl = f[:3], f[3:]
    return jnp.concatenate([cross_b(w, fm) + cross_b(vl, fl), cross_b(w, fl)])


def make_spatial_inertia_b(mass, com, inertia_c):
    """(6,6,B) spatial inertia at the world origin (math3d parity)."""
    cx = skew_b(com)
    Io = inertia_c + mass * m3_mul(cx, m3_T(cx))
    mcx = mass * cx
    mcxT = mass * m3_T(cx)
    B = com.shape[-1]
    mI = jnp.broadcast_to(
        (mass * jnp.eye(3, dtype=com.dtype))[..., None], (3, 3, B))
    top = jnp.concatenate([Io, mcx], axis=1)
    bot = jnp.concatenate([mcxT, mI], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def _chol_lanes(M_ll):
    """Unrolled Cholesky on a list-of-lists of (B,) lanes; returns L."""
    n = len(M_ll)
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = M_ll[j][j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        L[j][j] = jnp.sqrt(jnp.maximum(s, 1e-12))
        inv = 1.0 / L[j][j]
        for i in range(j + 1, n):
            s = M_ll[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv
    return L


def _cho_solve_lanes(L, b):
    """Solve L Lᵀ x = b for lists of (B,) lanes."""
    n = len(L)
    y = [None] * n
    for i in range(n):
        acc = b[i]
        for k in range(i):
            acc = acc - L[i][k] * y[k]
        y[i] = acc / L[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        acc = y[i]
        for k in range(i + 1, n):
            acc = acc - L[k][i] * x[k]
        x[i] = acc / L[i][i]
    return x


def spd_inverse_b(M):
    """(n,n,B) SPD inverse via unrolled Cholesky on lanes."""
    n = M.shape[0]
    M_ll = [[M[i, j] for j in range(n)] for i in range(n)]
    L = _chol_lanes(M_ll)
    one = jnp.ones_like(M[0, 0])
    zero = jnp.zeros_like(M[0, 0])
    cols = []
    for d in range(n):
        e = [one if i == d else zero for i in range(n)]
        cols.append(_cho_solve_lanes(L, e))
    # cols[d][i] = Minv[i, d]
    return jnp.stack([jnp.stack([cols[j][i] for j in range(n)])
                      for i in range(n)])


# ---------------------------------------------------------------------------
# FK / velocity kinematics (ports of engine.fk / engine.kin_dyn)
# ---------------------------------------------------------------------------


class FkB(NamedTuple):
    body_rot: List[jnp.ndarray]    # per body (3,3,B)
    body_pos: List[jnp.ndarray]    # per body (3,B)
    body_com: List[jnp.ndarray]    # per body (3,B)
    jnt_axis_w: List[jnp.ndarray]
    jnt_anchor_w: List[jnp.ndarray]


def _jnt_by_body(model):
    out = {}
    for j in range(model.njnt):
        out.setdefault(int(model.jnt_body[j]), []).append(j)
    return out


def fk_b(model: RigidModel, qpos: jnp.ndarray) -> FkB:
    """engine.fk with trailing batch; qpos is (nq, B)."""
    dtype = qpos.dtype
    B = qpos.shape[-1]
    rots, poss, coms = [], [], []
    jaxis = [None] * model.njnt
    janchor = [None] * model.njnt
    jbb = _jnt_by_body(model)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype)[..., None], (3, 3, B))
    zero3 = jnp.zeros((3, B), dtype)

    for i in range(model.nbody):
        p = int(model.body_parent[i])
        R_par = rots[p] if p >= 0 else eye
        p_par = poss[p] if p >= 0 else zero3
        R_off = _const(
            _eng._quat_to_mat_static(model.body_quat[i]), dtype)
        R = m3_mul(R_par, R_off)
        pos = p_par + m3_vec(R_par, _const(model.body_pos[i], dtype))
        for j in jbb.get(i, []):
            jt = int(model.jnt_type[j])
            qadr = int(model.jnt_qposadr[j])
            axis = _const(model.jnt_axis[j], dtype)
            jpos = _const(model.jnt_pos[j], dtype)
            if jt == FREE:
                pos = qpos[qadr:qadr + 3]
                R = quat_to_mat_b(qpos[qadr + 3:qadr + 7])
                jaxis[j] = R
                janchor[j] = pos
            elif jt == BALL:
                Rj = quat_to_mat_b(qpos[qadr:qadr + 4])
                anchor = pos + m3_vec(R, jpos)
                R = m3_mul(R, Rj)
                pos = anchor - m3_vec(R, jpos)
                jaxis[j] = R
                janchor[j] = anchor
            elif jt == SLIDE:
                axis_w = m3_vec(R, axis)
                pos = pos + axis_w * qpos[qadr]
                jaxis[j] = axis_w
                janchor[j] = pos
            elif jt == HINGE:
                angle = qpos[qadr]
                axis_w = m3_vec(R, axis)
                c, s = jnp.cos(angle), jnp.sin(angle)
                K = skew_b(axis_w)
                Rj = eye + s * K + (1 - c) * m3_mul(K, K)
                anchor = pos + m3_vec(R, jpos)
                R = m3_mul(Rj, R)
                pos = anchor - m3_vec(R, jpos)
                jaxis[j] = axis_w
                janchor[j] = anchor
        rots.append(R)
        poss.append(pos)
        coms.append(pos + m3_vec(R, _const(model.body_com[i], dtype)))
    return FkB(rots, poss, coms, jaxis, janchor)


class KinDynB(NamedTuple):
    fkr: FkB
    cdof: jnp.ndarray       # (nv, 6, B)
    cdof_dot: jnp.ndarray   # (nv, 6, B)
    cvel: List[jnp.ndarray]  # per body (6, B)
    cinr: List[jnp.ndarray]  # per body (6, 6, B)


def kin_dyn_b(model: RigidModel, qpos, qvel) -> KinDynB:
    dtype = qpos.dtype
    B = qpos.shape[-1]
    fkr = fk_b(model, qpos)
    cdof_rows = [None] * model.nv
    cdofdot_rows = [None] * model.nv
    cvel: List[jnp.ndarray] = []
    zeros6 = jnp.zeros((6, B), dtype)
    zeros3 = jnp.zeros((3, B), dtype)
    jbb = _jnt_by_body(model)

    def e3(k):
        v = np.zeros(3)
        v[k] = 1.0
        return jnp.broadcast_to(_const(v, dtype), (3, B))

    for i in range(model.nbody):
        p = int(model.body_parent[i])
        v = cvel[p] if p >= 0 else zeros6
        for j in jbb.get(i, []):
            jt = int(model.jnt_type[j])
            vadr = int(model.jnt_dofadr[j])
            basis = fkr.jnt_axis_w[j]
            anchor = fkr.jnt_anchor_w[j]
            if jt == FREE:
                for k in range(3):
                    cdof_rows[vadr + k] = jnp.concatenate([zeros3, e3(k)])
                    cdofdot_rows[vadr + k] = zeros6
                    v = v + cdof_rows[vadr + k] * qvel[vadr + k]
                for k in range(3):
                    a_w = basis[:, k]
                    cdof_rows[vadr + 3 + k] = jnp.concatenate(
                        [a_w, cross_b(anchor, a_w)])
                    v = v + cdof_rows[vadr + 3 + k] * qvel[vadr + 3 + k]
                for k in range(3):
                    cdofdot_rows[vadr + 3 + k] = motion_cross_b(
                        v, cdof_rows[vadr + 3 + k])
            elif jt == BALL:
                for k in range(3):
                    a_w = basis[:, k]
                    cdof_rows[vadr + k] = jnp.concatenate(
                        [a_w, cross_b(anchor, a_w)])
                    v = v + cdof_rows[vadr + k] * qvel[vadr + k]
                for k in range(3):
                    cdofdot_rows[vadr + k] = motion_cross_b(
                        v, cdof_rows[vadr + k])
            elif jt == SLIDE:
                cdof_rows[vadr] = jnp.concatenate([zeros3, basis])
                cdofdot_rows[vadr] = motion_cross_b(v, cdof_rows[vadr])
                v = v + cdof_rows[vadr] * qvel[vadr]
            elif jt == HINGE:
                cdof_rows[vadr] = jnp.concatenate(
                    [basis, cross_b(anchor, basis)])
                cdofdot_rows[vadr] = motion_cross_b(v, cdof_rows[vadr])
                v = v + cdof_rows[vadr] * qvel[vadr]
        cvel.append(v)

    cdof = jnp.stack(cdof_rows)
    cdof_dot = jnp.stack(cdofdot_rows)
    cinr = []
    for i in range(model.nbody):
        Ic = m3_mul(
            m3_mul(fkr.body_rot[i], _const(model.body_inertia[i], dtype)),
            m3_T(fkr.body_rot[i]))
        cinr.append(make_spatial_inertia_b(
            float(model.body_mass[i]), fkr.body_com[i], Ic))
    return KinDynB(fkr, cdof, cdof_dot, cvel, cinr)


# ---------------------------------------------------------------------------
# CRBA / RNE / fluid / limits (ports with trailing batch)
# ---------------------------------------------------------------------------


def crb_mass_matrix_b(model: RigidModel, kd: KinDynB) -> jnp.ndarray:
    dtype = kd.cdof.dtype
    dof_body, chain_mask, dof_anc, subtree = _eng.get_masks(model)
    nb = model.nbody
    cinr_stack = jnp.stack(kd.cinr)                      # (nb, 6, 6, B)
    B = cinr_stack.shape[-1]
    sub = jnp.asarray(subtree, dtype)                    # (nb, nb)
    crb = (sub @ cinr_stack.reshape(nb, -1)).reshape(nb, 6, 6, B)
    crb_per_dof = crb[np.asarray(dof_body)]              # (nv, 6, 6, B)
    # F[d,y,b] = Σ_z crb_per_dof[d,y,z,b] * cdof[d,z,b]
    F = sum(crb_per_dof[:, :, z, :] * kd.cdof[:, None, z, :]
            for z in range(6))                           # (nv, 6, B)
    # Mfull[d,e,b] = Σ_y F[d,y,b] * cdof[e,y,b]
    Mfull = sum(F[:, None, y, :] * kd.cdof[None, :, y, :]
                for y in range(6))                       # (nv, nv, B)
    mask = jnp.asarray(dof_anc)[..., None]
    M = jnp.where(mask, Mfull,
                  jnp.where(jnp.swapaxes(mask, 0, 1),
                            jnp.swapaxes(Mfull, 0, 1), 0.0))
    M = M + _const(np.diag(np.asarray(model.dof_armature)), dtype)
    return M


def rne_bias_b(model: RigidModel, kd: KinDynB, qvel) -> jnp.ndarray:
    dtype = kd.cdof.dtype
    B = qvel.shape[-1]
    grav = _const(model.gravity, dtype)
    a0 = jnp.concatenate(
        [jnp.zeros((3, B), dtype), jnp.broadcast_to(-grav, (3, B))])
    jbb = _jnt_by_body(model)
    nvj = {FREE: 6, BALL: 3, SLIDE: 1, HINGE: 1}

    cacc: List[jnp.ndarray] = []
    for i in range(model.nbody):
        p = int(model.body_parent[i])
        a = cacc[p] if p >= 0 else a0
        for j in jbb.get(i, []):
            va = int(model.jnt_dofadr[j])
            for k in range(nvj[int(model.jnt_type[j])]):
                a = a + kd.cdof_dot[va + k] * qvel[va + k]
        cacc.append(a)

    def imul(I66, m6):
        return sum(I66[:, z, :] * m6[None, z, :] for z in range(6))

    cfrc = jnp.stack([
        imul(kd.cinr[i], cacc[i])
        + force_cross_b(kd.cvel[i], imul(kd.cinr[i], kd.cvel[i]))
        for i in range(model.nbody)
    ])                                                   # (nb, 6, B)
    dof_body, chain_mask, dof_anc, subtree = _eng.get_masks(model)
    nb = model.nbody
    sub = jnp.asarray(subtree, dtype)
    fsub = (sub @ cfrc.reshape(nb, -1)).reshape(nb, 6, B)
    fsub_per_dof = fsub[np.asarray(dof_body)]            # (nv, 6, B)
    return sum(kd.cdof[:, z, :] * fsub_per_dof[:, z, :] for z in range(6))


def fluid_force_b(model: RigidModel, kd: KinDynB, qvel) -> jnp.ndarray:
    dtype = qvel.dtype
    B = qvel.shape[-1]
    qfrc = jnp.zeros((model.nv, B), dtype)
    if model.viscosity == 0.0 and model.fluid_density == 0.0:
        return qfrc
    fs_full = [jnp.zeros((6, B), dtype)] * model.nbody
    pi = np.pi
    for i in range(model.nbody):
        if model.body_mass[i] <= 0:
            continue
        R = kd.fkr.body_rot[i]
        com = kd.fkr.body_com[i]
        v6 = kd.cvel[i]
        w_w = v6[:3]
        v_w = v6[3:] + cross_b(w_w, com)
        w_b = m3T_vec(R, w_w)
        v_b = m3T_vec(R, v_w)
        box = 2.0 * np.asarray(model.body_fluid_box[i], np.float64)
        force = jnp.zeros((3, B), dtype)
        torque = jnp.zeros((3, B), dtype)
        if model.viscosity > 0:
            diam = float(np.mean(box))
            force = force - 3.0 * pi * diam * model.viscosity * v_b
            torque = torque - pi * diam**3 * model.viscosity * w_b
        if model.fluid_density > 0:
            frows, trows = [], []
            for k in range(3):
                j, l = (k + 1) % 3, (k + 2) % 3
                frows.append(
                    force[k]
                    - 0.5 * model.fluid_density * float(box[j] * box[l])
                    * jnp.abs(v_b[k]) * v_b[k])
                trows.append(
                    torque[k]
                    - model.fluid_density * float(box[k])
                    * float(box[j] ** 4 + box[l] ** 4) / 64.0
                    * jnp.abs(w_b[k]) * w_b[k])
            force = jnp.stack(frows)
            torque = jnp.stack(trows)
        f_w = m3_vec(R, force)
        t_w = m3_vec(R, torque)
        fs_full[i] = jnp.concatenate([t_w + cross_b(com, f_w), f_w])
    _, chain_mask, _, _ = _eng.get_masks(model)
    fs_stack = jnp.stack(fs_full)                        # (nb, 6, B)
    # proj[v,i,b] = Σ_z cdof[v,z,b] * fs[i,z,b], masked by chain
    cm = np.asarray(chain_mask)
    out = jnp.zeros((model.nv, B), dtype)
    rows = []
    for v in range(model.nv):
        acc = jnp.zeros((B,), dtype)
        for i in range(model.nbody):
            if not cm[v, i]:
                continue
            acc = acc + sum(kd.cdof[v, z, :] * fs_stack[i, z, :]
                            for z in range(6))
        rows.append(acc)
    return jnp.stack(rows)


def limit_force_b(model, qpos, qvel, qacc0, minv_diag):
    """engine.limit_force with trailing batch."""
    dtype = qpos.dtype
    B = qpos.shape[-1]
    qfrc = jnp.zeros((model.nv, B), dtype)
    tc = max(0.02, 2.0 * model.timestep)
    d0, dmax, width = 0.9, 0.95, 0.001
    b = 2.0 / (dmax * tc)
    for j in range(model.njnt):
        if not model.jnt_limited[j]:
            continue
        jt = int(model.jnt_type[j])
        if jt not in (HINGE, SLIDE):
            continue
        qadr = int(model.jnt_qposadr[j])
        vadr = int(model.jnt_dofadr[j])
        lo, hi = model.jnt_range[j]
        q = qpos[qadr]
        v = qvel[vadr]
        a0 = qacc0[vadr]
        m_eff = 1.0 / jnp.maximum(minv_diag[vadr], 1e-12)
        for sign, viol in (
            (1.0, jnp.maximum(q - hi, 0.0)),
            (-1.0, jnp.maximum(lo - q, 0.0)),
        ):
            active = viol > 0
            d = d0 + (dmax - d0) * jnp.clip(viol / width, 0.0, 1.0)
            k = d / (dmax * dmax * tc * tc)
            aref_out = -b * (sign * v) - k * viol
            f_out = jnp.minimum(m_eff * d * (aref_out - sign * a0), 0.0)
            qfrc = qfrc.at[vadr].add(jnp.where(active, sign * f_out, 0.0))
    return qfrc


def actuator_force_b(model, ctrl):
    dtype = ctrl.dtype
    B = ctrl.shape[-1]
    qfrc = jnp.zeros((model.nv, B), dtype)
    for u in range(model.nu):
        lo, hi = model.act_ctrlrange[u]
        c = jnp.clip(ctrl[u], lo, hi)
        qfrc = qfrc.at[int(model.act_dofadr[u])].add(
            float(model.act_gear[u]) * c)
    return qfrc


# ---------------------------------------------------------------------------
# contacts (port of contact.contact_qfrc with trailing batch)
# ---------------------------------------------------------------------------


@_eng.highest_matmul
def contact_qfrc_b(model, cs, kd: KinDynB, qvel, qacc0, Minv, chain_mask,
                   solver_iters: Optional[int] = None):
    from . import contact as _cm

    dtype = qvel.dtype
    nv = model.nv
    B = qvel.shape[-1]
    S = len(cs.sph_body)
    if S == 0:
        return jnp.zeros((nv, B), dtype)

    body_R = kd.fkr.body_rot
    body_p = kd.fkr.body_pos
    centers = []
    for s in range(S):
        k = int(cs.sph_body[s])
        centers.append(
            body_p[k] + m3_vec(body_R[k], _const(cs.sph_local[s], dtype)))
    radius = cs.sph_radius

    # candidate contacts: lists of ((3,B) pos, (3,B) n, (B,) dist) + static
    dists, poss, normals = [], [], []
    bod1, bod2 = [], []
    solref, solimp, frics, margins = [], [], [], []

    def add(dist, pos, n, b1, b2, srf, sim, fric, marg):
        dists.append(dist)
        poss.append(pos)
        normals.append(n)
        bod1.append(b1)
        bod2.append(b2)
        solref.append(srf)
        solimp.append(sim)
        frics.append(fric)
        margins.append(marg)

    up = jnp.stack([jnp.zeros((B,), dtype), jnp.zeros((B,), dtype),
                    jnp.ones((B,), dtype)])

    # -- spheres vs floor plane ------------------------------------------
    if cs.has_floor:
        for s in np.nonzero(cs.sph_vs_static)[0]:
            c = centers[s]
            r = float(radius[s])
            add(c[2] - cs.floor_z - r,
                jnp.stack([c[0], c[1], c[2] - r]), up,
                int(cs.sph_body[s]), -1,
                tuple(cs.sph_solref[s]), tuple(cs.sph_solimp[s]),
                float(cs.sph_friction[s]),
                float(cs.sph_margin[s]) + cs.floor_margin)

    # -- spheres vs static AABBs (nearest-2 per sphere, branch-free) ------
    Bx = len(cs.box_center)
    if Bx > 0:
        INF = jnp.full((B,), np.inf, dtype)
        zero3 = jnp.zeros((3, B), dtype)
        for s in np.nonzero(cs.sph_vs_static)[0]:
            c = centers[s]
            r = float(radius[s])
            b1_d = INF
            b2_d = INF
            sel = {
                "1d": jnp.zeros((B,), dtype), "1n": zero3, "1p": zero3,
                "1m": jnp.zeros((B,), dtype),
                "2d": jnp.zeros((B,), dtype), "2n": zero3, "2p": zero3,
                "2m": jnp.zeros((B,), dtype),
            }
            for b in range(Bx):
                bc = cs.box_center[b]
                bh = cs.box_half[b]
                local = c - _const(bc, dtype)
                bhc = _const(bh, dtype)
                clamped = jnp.clip(local, -bhc, bhc)
                delta = local - clamped
                d_out = jnp.sqrt(jnp.sum(delta * delta, 0) + 1e-12)
                outside = d_out > 1e-6
                n_out = delta / d_out[None]
                exit_d = bhc - jnp.abs(local)
                m_ex = jnp.minimum(jnp.minimum(exit_d[0], exit_d[1]),
                                   exit_d[2])
                is_x = exit_d[0] <= jnp.minimum(exit_d[1], exit_d[2])
                is_y = (~is_x) & (exit_d[1] <= exit_d[2])
                is_z = (~is_x) & (~is_y)
                sgn = jnp.where(local >= 0, 1.0, -1.0).astype(dtype)
                n_in = jnp.stack([
                    jnp.where(is_x, sgn[0], 0.0),
                    jnp.where(is_y, sgn[1], 0.0),
                    jnp.where(is_z, sgn[2], 0.0),
                ])
                pen_in = -m_ex
                dist = jnp.where(outside, d_out - r, pen_in - r)
                n = jnp.where(outside[None], n_out, n_in)
                surf_local = jnp.where(
                    outside[None], clamped, local - n_in * pen_in[None])
                pos = _const(bc, dtype) + surf_local
                eff = dist - float(cs.box_margin[b])
                cur = dict(d=dist, n=n, p=pos,
                           m=jnp.full((B,), float(cs.box_margin[b]), dtype))
                better1 = eff < b1_d
                better2 = (~better1) & (eff < b2_d)
                b2_d = jnp.where(better1, b1_d, jnp.where(better2, eff, b2_d))
                for key, val in (("d", cur["d"]), ("m", cur["m"])):
                    sel["2" + key] = jnp.where(
                        better1, sel["1" + key],
                        jnp.where(better2, val, sel["2" + key]))
                for key, val in (("n", cur["n"]), ("p", cur["p"])):
                    sel["2" + key] = jnp.where(
                        better1[None], sel["1" + key],
                        jnp.where(better2[None], val, sel["2" + key]))
                b1_d = jnp.where(better1, eff, b1_d)
                for key, val in (("d", cur["d"]), ("m", cur["m"])):
                    sel["1" + key] = jnp.where(better1, val, sel["1" + key])
                for key, val in (("n", cur["n"]), ("p", cur["p"])):
                    sel["1" + key] = jnp.where(
                        better1[None], val, sel["1" + key])
            picks = [("1d", "1n", "1p", "1m")]
            if Bx > 1:
                picks.append(("2d", "2n", "2p", "2m"))
            for kd_, kn, kp, km in picks:
                add(sel[kd_], sel[kp], sel[kn],
                    int(cs.sph_body[s]), -1,
                    tuple(cs.sph_solref[s]), tuple(cs.sph_solimp[s]),
                    float(cs.sph_friction[s]),
                    float(cs.sph_margin[s]) + sel[km])

    # -- dynamic sphere-sphere pairs --------------------------------------
    for p_ in range(len(cs.pair_i)):
        i, j = int(cs.pair_i[p_]), int(cs.pair_j[p_])
        ci, cj = centers[i], centers[j]
        ri, rj = float(radius[i]), float(radius[j])
        d = ci - cj
        dn = jnp.sqrt(jnp.sum(d * d, 0) + 1e-12)
        n = d / dn[None]
        dist = dn - (ri + rj)
        pos = cj + n * (rj + dist * 0.5)[None]
        add(dist, pos, n, int(cs.sph_body[i]), int(cs.sph_body[j]),
            tuple((cs.sph_solref[i] + cs.sph_solref[j]) / 2),
            tuple((cs.sph_solimp[i] + cs.sph_solimp[j]) / 2),
            float(max(cs.sph_friction[i], cs.sph_friction[j])),
            float(cs.sph_margin[i] + cs.sph_margin[j]))

    # -- spheres vs dynamic (moving) boxes --------------------------------
    for p_ in range(len(cs.qpair_s)):
        si, bi = int(cs.qpair_s[p_]), int(cs.qpair_b[p_])
        c = centers[si]
        r = float(radius[si])
        bbody = int(cs.dbox_body[bi])
        Rb = body_R[bbody]
        bc = body_p[bbody] + m3_vec(Rb, _const(cs.dbox_local[bi], dtype))
        bhc = _const(cs.dbox_half[bi], dtype)
        local = m3T_vec(Rb, c - bc)
        clamped = jnp.clip(local, -bhc, bhc)
        delta = local - clamped
        d_out = jnp.sqrt(jnp.sum(delta * delta, 0) + 1e-12)
        outside = d_out > 1e-6
        n_out = delta / d_out[None]
        exit_d = bhc - jnp.abs(local)
        m_ex = jnp.minimum(jnp.minimum(exit_d[0], exit_d[1]), exit_d[2])
        is_x = exit_d[0] <= jnp.minimum(exit_d[1], exit_d[2])
        is_y = (~is_x) & (exit_d[1] <= exit_d[2])
        is_z = (~is_x) & (~is_y)
        sgn = jnp.where(local >= 0, 1.0, -1.0).astype(dtype)
        n_in = jnp.stack([
            jnp.where(is_x, sgn[0], 0.0),
            jnp.where(is_y, sgn[1], 0.0),
            jnp.where(is_z, sgn[2], 0.0),
        ])
        pen_in = -m_ex
        dist = jnp.where(outside, d_out - r, pen_in - r)
        n_local = jnp.where(outside[None], n_out, n_in)
        surf_local = jnp.where(
            outside[None], clamped, local - n_in * pen_in[None])
        n = m3_vec(Rb, n_local)
        pos = bc + m3_vec(Rb, surf_local)
        add(dist, pos, n, int(cs.sph_body[si]), bbody,
            tuple((cs.sph_solref[si] + cs.dbox_solref[bi]) / 2),
            tuple((cs.sph_solimp[si] + cs.dbox_solimp[bi]) / 2),
            float(max(cs.sph_friction[si], cs.dbox_friction[bi])),
            float(cs.sph_margin[si] + cs.dbox_margin[bi]))

    if not dists:
        return jnp.zeros((nv, B), dtype)

    C = len(dists)
    dist = jnp.stack(dists)                              # (C, B)
    pos = jnp.stack(poss)                                # (C, 3, B)
    normal = jnp.stack(normals)                          # (C, 3, B)
    margin = jnp.stack([
        m if isinstance(m, jax.Array) else jnp.full((B,), m, dtype)
        for m in margins
    ])                                                   # (C, B)
    mu = _const(np.asarray(frics), dtype)                # (C, 1)
    sim = np.asarray(solimp)                             # (C, 3)
    srf = np.asarray(solref)
    cm = np.asarray(chain_mask, np.float64)              # (nv, nb)
    sign_mask = np.stack([
        cm[:, b1] - (cm[:, b2] if b2 >= 0 else 0.0)
        for b1, b2 in zip(bod1, bod2)
    ])                                                   # (C, nv)
    sign_mask_c = _const(sign_mask, dtype)               # (C, nv, 1)
    d0 = _const(sim[:, 0], dtype)
    dmax = _const(sim[:, 1], dtype)
    width = _const(sim[:, 2], dtype)
    tc = _const(np.maximum(srf[:, 0], 2.0 * model.timestep), dtype)
    dampr = _const(srf[:, 1], dtype)

    # tangent frames (contact.py parity)
    use_x = jnp.abs(normal[:, 0, :]) < 0.5
    refv = jnp.stack([
        jnp.where(use_x, 1.0, 0.0).astype(dtype),
        jnp.where(use_x, 0.0, 1.0).astype(dtype),
        jnp.zeros_like(use_x, dtype),
    ], axis=1)                                           # (C, 3, B)

    def cross_c(a, b):
        return jnp.stack([
            a[:, 1] * b[:, 2] - a[:, 2] * b[:, 1],
            a[:, 2] * b[:, 0] - a[:, 0] * b[:, 2],
            a[:, 0] * b[:, 1] - a[:, 1] * b[:, 0],
        ], axis=1)

    t1 = cross_c(normal, refv)
    t1 = t1 / jnp.sqrt(jnp.sum(t1 * t1, 1, keepdims=True) + 1e-12)
    t2 = cross_c(normal, t1)

    def jrows(direction):
        # F = [pos × d; d]  (C, 6, B); J[c,v,b] = Σ_z F[c,z,b]·cdof[v,z,b]
        F = jnp.concatenate([cross_c(pos, direction), direction], axis=1)
        J = sum(F[:, None, z, :] * kd.cdof[None, :, z, :] for z in range(6))
        return J * sign_mask_c                           # (C, nv, B)

    Jn = jrows(normal)
    Jt1 = jrows(t1)
    Jt2 = jrows(t2)

    b_imp = 2.0 / (dmax * tc)
    active = dist < margin
    r = dist - margin
    imp = d0 + (dmax - d0) * jnp.clip(-r / width, 0.0, 1.0)
    k_imp = imp / (dmax * dmax * tc * tc * dampr * dampr)

    J = jnp.concatenate([Jn, Jt1, Jt2], axis=0)          # (3C, nv, B)

    def jdotv(Jm, vec):
        # (·C, nv, B) @ (nv, B) -> (·C, B)
        return sum(Jm[:, v, :] * vec[None, v, :] for v in range(nv))

    aref = jnp.concatenate([
        -b_imp * jdotv(Jn, qvel) - k_imp * r,
        -b_imp * jdotv(Jt1, qvel),
        -b_imp * jdotv(Jt2, qvel),
    ])
    a0 = jdotv(J, qacc0)
    # A_diag[c,b] = Σ_u J[c,u,b] (Σ_v Minv[u,v,b] J[c,v,b])
    JMinv = jnp.stack([
        sum(Minv[u, v][None] * J[:, v, :] for v in range(nv))
        for u in range(nv)
    ], axis=1)                                           # (3C, nv, B)
    A_diag = sum(JMinv[:, u, :] * J[:, u, :] for u in range(nv))
    imp3 = jnp.concatenate([imp, imp, imp])
    Rreg = (1.0 - imp3) / jnp.maximum(imp3, 1e-6) * A_diag
    denom = A_diag + Rreg + 1e-9
    mu_b = mu

    def project(f):
        f_n = jnp.maximum(f[:C], 0.0)
        f_n = jnp.where(active, f_n, 0.0)
        ft1, ft2 = f[C:2 * C], f[2 * C:]
        ft_norm = jnp.sqrt(ft1**2 + ft2**2 + 1e-12)
        scale = jnp.minimum(1.0, mu_b * f_n / ft_norm)
        return jnp.concatenate([
            f_n, jnp.where(active, ft1 * scale, 0.0),
            jnp.where(active, ft2 * scale, 0.0)])

    omega = 0.6
    iters = _cm.CONTACT_SOLVER_ITERS if solver_iters is None else solver_iters

    def sweep(_, f):
        # x = Minv (Jᵀ f)
        JTf = jnp.stack([
            jnp.sum(J[:, v, :] * f, axis=0) for v in range(nv)
        ])
        x = jnp.stack([
            sum(Minv[u, v] * JTf[v] for v in range(nv)) for u in range(nv)
        ])
        a_f = jdotv(J, x)
        resid = aref - a0 - a_f - Rreg * f
        return project(f + omega * resid / denom)

    f = project((aref - a0) / denom)
    f = jax.lax.fori_loop(0, iters, sweep, f)
    qfrc = jnp.stack([jnp.sum(J[:, v, :] * f, axis=0) for v in range(nv)])
    return qfrc


# ---------------------------------------------------------------------------
# forward / integrate / RK4 (ports of engine.forward / rk4_step)
# ---------------------------------------------------------------------------


@_eng.highest_matmul
def forward_b(model, qpos, qvel, ctrl, extra_qfrc=None):
    """qacc (nv, B) = M⁻¹ (τ - bias + passive + constraints)."""
    kd = kin_dyn_b(model, qpos, qvel)
    M = crb_mass_matrix_b(model, kd)
    bias = rne_bias_b(model, kd, qvel)
    tau = actuator_force_b(model, ctrl)
    tau = tau + fluid_force_b(model, kd, qvel)
    tau = tau - _const(model.dof_damping, qpos.dtype) * qvel
    Minv = spd_inverse_b(M)
    nv = model.nv
    rhs = tau - bias
    qacc0 = jnp.stack([
        sum(Minv[i, j] * rhs[j] for j in range(nv)) for i in range(nv)
    ])
    minv_diag = jnp.stack([Minv[i, i] for i in range(nv)])
    f_con = limit_force_b(model, qpos, qvel, qacc0, minv_diag)
    if extra_qfrc is not None:
        f_con = f_con + extra_qfrc(kd, qacc0, Minv, qvel)
    rhs2 = tau + f_con - bias
    return jnp.stack([
        sum(Minv[i, j] * rhs2[j] for j in range(nv)) for i in range(nv)
    ])


def integrate_pos_b(model, qpos, qvel, dt):
    out = qpos
    for j in range(model.njnt):
        jt = int(model.jnt_type[j])
        qadr = int(model.jnt_qposadr[j])
        vadr = int(model.jnt_dofadr[j])
        if jt == FREE:
            out = out.at[qadr:qadr + 3].add(qvel[vadr:vadr + 3] * dt)
            out = _quat_update_b(out, qpos, qvel, dt, qadr + 3, vadr + 3)
        elif jt == BALL:
            out = _quat_update_b(out, qpos, qvel, dt, qadr, vadr)
        else:
            out = out.at[qadr].add(qvel[vadr] * dt)
    return out


def _quat_update_b(out, qpos, qvel, dt, qa, va):
    quat = qpos[qa:qa + 4]
    w = qvel[va:va + 3]
    angle = jnp.sqrt(jnp.sum(w * w, 0) + 1e-18)
    axis = w / angle[None]
    half = angle * dt * 0.5
    dw = jnp.cos(half)
    dv = axis * jnp.sin(half)[None]
    qw, qx, qy, qz = quat[0], quat[1], quat[2], quat[3]
    nw = qw * dw - qx * dv[0] - qy * dv[1] - qz * dv[2]
    nx = qw * dv[0] + qx * dw + qy * dv[2] - qz * dv[1]
    ny = qw * dv[1] - qx * dv[2] + qy * dw + qz * dv[0]
    nz = qw * dv[2] + qx * dv[1] - qy * dv[0] + qz * dw
    norm = jnp.sqrt(nw * nw + nx * nx + ny * ny + nz * nz)
    return out.at[qa:qa + 4].set(
        jnp.stack([nw, nx, ny, nz]) / norm[None])


def rk4_step_b(model, qpos, qvel, ctrl, extra_qfrc=None):
    """One RK4 step (engine.rk4_step parity) on (nq/nv, B) state."""
    h = model.timestep
    dtype = qpos.dtype

    h_s = jnp.asarray([0.0, h / 2, h / 2, h], dtype)
    w_s = jnp.asarray([1.0, 2.0, 2.0, 1.0], dtype)

    def stage(carry, xs):
        prev_v, prev_a, acc_v, acc_a = carry
        hs, w = xs
        q_s = integrate_pos_b(model, qpos, prev_v, hs)
        v_s = qvel + prev_a * hs
        a_s = forward_b(model, q_s, v_s, ctrl, extra_qfrc)
        return (v_s, a_s, acc_v + w * v_s, acc_a + w * a_s), None

    zero_v = jnp.zeros_like(qvel)
    (_, _, acc_v, acc_a), _ = jax.lax.scan(
        stage, (qvel, zero_v, zero_v, zero_v), (h_s, w_s))
    qpos_out = integrate_pos_b(model, qpos, acc_v / 6.0, h)
    qvel_out = qvel + (acc_a / 6.0) * h
    return qpos_out, qvel_out


# ---------------------------------------------------------------------------
# env-facing builder: the batched dynamics step of an engine-world spec
# ---------------------------------------------------------------------------


def build_dynamics_step(spec):
    """Batched engine dynamics step of a MazeEnvSpec (engine-world robot).

    Returns ``step(qpos (B, nq), qvel (B, nv), ctrl (B, nu)) ->
    (qpos', qvel')`` running frame_skip × RK4 with contacts in the
    batch-last layout.  Drop-in equal (to float tolerance) to
    ``vmap(robot.dynamics_step)`` — tests/test_engine_batched.py."""
    model = spec.dynamic_model
    cset = spec.contact_set
    _, chain_mask, _, _ = _eng.get_masks(model)
    robot = spec.robot
    falling_sup = getattr(spec, "_falling_support", ())
    tc_s = max(0.02, 2.0 * float(model.timestep))

    def support_qfrc_b(kd, qacc0, Minv, qvel_now):
        """envs/env.py support_qfrc (coupled platform-support + z-limit,
        physics/contact.falling_support_force), batch-last."""
        from .contact import falling_support_force

        qfrc = jnp.zeros_like(qvel_now)
        for bodyidx, zdof, half_z, plats in falling_sup:
            center = kd.fkr.body_pos[bodyidx]
            bpz = float(model.body_pos[bodyidx][2])
            z = center[2] - bpz
            bottom = bpz + z - half_z
            s = jnp.zeros_like(z)
            for (px, py, ox, oy, top) in plats:
                over = ((jnp.abs(center[0] - px) < ox)
                        & (jnp.abs(center[1] - py) < oy))
                s = jnp.maximum(s, jnp.where(over, top, 0.0))
            f = falling_support_force(
                z, bottom, s, qvel_now[zdof], qacc0[zdof],
                Minv[zdof, zdof] + 1e-12, tc_s)
            qfrc = qfrc.at[zdof].add(f)
        return qfrc

    def extra_cb(kd, qacc0, Minv, qvel_now):
        qfrc = contact_qfrc_b(
            model, cset, kd, qvel_now, qacc0, Minv, chain_mask)
        return qfrc + support_qfrc_b(kd, qacc0, Minv, qvel_now)

    def step(qpos, qvel, ctrl):
        q = qpos.T
        v = qvel.T
        c = ctrl.T

        def body(carry, _):
            q_, v_ = carry
            q_, v_ = rk4_step_b(model, q_, v_, c, extra_qfrc=extra_cb)
            return (q_, v_), None

        (q, v), _ = jax.lax.scan(body, (q, v), None,
                                 length=robot.frame_skip)
        return q.T, v.T

    return step
