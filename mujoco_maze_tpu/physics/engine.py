"""Forward dynamics engine: FK → CRBA → RNEA → passive/fluid → RK4.

The TPU replacement for MuJoCo's C pipeline (the reference's L0 layer,
SURVEY §1): a Featherstone world-frame formulation where every tree loop
unrolls at trace time over the static :class:`RigidModel`, producing one
fused XLA kernel per robot that ``vmap``s over thousands of envs.

Conventions: spatial motion vectors ``[ω; v]`` at the world origin; qvel of
free joints is (linear world, angular body-frame) matching MuJoCo's
convention; quaternions (w, x, y, z).

Differentially validated against MuJoCo 3 (tests/test_engine.py): qacc of
the swimmer/reacher/ant models matches mj_forward to ~1e-5.
"""

from __future__ import annotations

import functools
from typing import Dict, List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .math3d import (
    force_cross,
    make_spatial_inertia,
    motion_cross,
    quat_mul,
    quat_to_mat,
    skew,
)
from .model import BALL, FREE, HINGE, SLIDE, RigidModel


def highest_matmul(fn):
    """Force float32 matmul precision inside ``fn``.

    TPU MXU matmuls default to bf16 multiplies; the CRB/RNE einsums cancel
    O(anchor^2) ~ 20-magnitude terms down to tiny mass-matrix entries, and
    the bf16 error (~0.05 absolute here) can flip a falling block's 0.001
    diagonal NEGATIVE, exploding the Cholesky into NaN (observed on AntFall
    at torso z ≈ 4.76; tests/test_ant_world.py::test_fall_engine_finite).
    """

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)

    return wrapped


class FkResult(NamedTuple):
    body_rot: List[jnp.ndarray]    # per body (3,3) world rotation
    body_pos: List[jnp.ndarray]    # per body (3,) world frame origin
    body_com: List[jnp.ndarray]    # per body (3,) world CoM
    jnt_axis_w: List[jnp.ndarray]  # per joint: world axis (or (3,3) basis for
                                   # BALL / rotational part of FREE)
    jnt_anchor_w: List[jnp.ndarray]  # per joint (3,) world anchor


def fk(model: RigidModel, qpos: jnp.ndarray) -> FkResult:
    """Forward kinematics; joints applied in declaration order per body.

    A joint's world axis/anchor is captured at its place in the sequence —
    NOT the body's final pose — matching MuJoCo: e.g. the swimmer's slide
    axes are unaffected by its later hinge rotation.
    """
    dtype = qpos.dtype
    rots: List[jnp.ndarray] = []
    poss: List[jnp.ndarray] = []
    coms: List[jnp.ndarray] = []
    jaxis: List[jnp.ndarray] = [None] * model.njnt
    janchor: List[jnp.ndarray] = [None] * model.njnt
    jnt_by_body: Dict[int, List[int]] = {}
    for j in range(model.njnt):
        jnt_by_body.setdefault(int(model.jnt_body[j]), []).append(j)

    for i in range(model.nbody):
        p = int(model.body_parent[i])
        if p < 0:
            R_par = jnp.eye(3, dtype=dtype)
            p_par = jnp.zeros(3, dtype=dtype)
        else:
            R_par, p_par = rots[p], poss[p]
        # fixed offset
        R_off = jnp.asarray(
            np.asarray(
                _quat_to_mat_static(model.body_quat[i]), dtype=np.float64
            ),
            dtype,
        )
        R = R_par @ R_off
        pos = p_par + R_par @ jnp.asarray(model.body_pos[i], dtype)
        for j in jnt_by_body.get(i, []):
            jt = int(model.jnt_type[j])
            qadr = int(model.jnt_qposadr[j])
            axis = jnp.asarray(model.jnt_axis[j], dtype)
            jpos = jnp.asarray(model.jnt_pos[j], dtype)
            if jt == FREE:
                pos = qpos[qadr : qadr + 3]
                quat = qpos[qadr + 3 : qadr + 7]
                R = quat_to_mat(quat)
                jaxis[j] = R            # rotational basis = body axes
                janchor[j] = pos
            elif jt == BALL:
                quat = qpos[qadr : qadr + 4]
                Rj = quat_to_mat(quat)
                anchor = pos + R @ jpos
                R = R @ Rj
                pos = anchor - R @ jpos
                jaxis[j] = R            # post-rotation body axes
                janchor[j] = anchor
            elif jt == SLIDE:
                axis_w = R @ axis
                pos = pos + axis_w * qpos[qadr]
                jaxis[j] = axis_w
                janchor[j] = pos
            elif jt == HINGE:
                angle = qpos[qadr]
                axis_w = R @ axis
                c, s = jnp.cos(angle), jnp.sin(angle)
                K = skew(axis_w)
                Rj = (
                    jnp.eye(3, dtype=dtype) + s * K + (1 - c) * (K @ K)
                )
                anchor = pos + R @ jpos
                R = Rj @ R
                pos = anchor - R @ jpos
                jaxis[j] = axis_w
                janchor[j] = anchor
        rots.append(R)
        poss.append(pos)
        coms.append(pos + R @ jnp.asarray(model.body_com[i], dtype))
    return FkResult(rots, poss, coms, jaxis, janchor)


def _quat_to_mat_static(q):
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


class KinDyn(NamedTuple):
    fkr: FkResult
    cdof: jnp.ndarray            # (nv, 6) dof motion subspace, world origin
    cdof_dot: jnp.ndarray        # (nv, 6) time derivative of cdof
    cvel: List[jnp.ndarray]      # per body (6,) spatial velocity
    cinr: List[jnp.ndarray]      # per body (6,6) spatial inertia


def kin_dyn(model: RigidModel, qpos: jnp.ndarray, qvel: jnp.ndarray) -> KinDyn:
    dtype = qpos.dtype
    fkr = fk(model, qpos)
    cdof_rows = [None] * model.nv
    cdofdot_rows = [None] * model.nv
    cvel: List[jnp.ndarray] = []
    zeros6 = jnp.zeros(6, dtype=dtype)

    jnt_by_body: Dict[int, List[int]] = {}
    for j in range(model.njnt):
        jnt_by_body.setdefault(int(model.jnt_body[j]), []).append(j)

    for i in range(model.nbody):
        p = int(model.body_parent[i])
        v = cvel[p] if p >= 0 else zeros6
        for j in jnt_by_body.get(i, []):
            jt = int(model.jnt_type[j])
            vadr = int(model.jnt_dofadr[j])
            basis = fkr.jnt_axis_w[j]
            anchor = fkr.jnt_anchor_w[j]
            if jt == FREE:
                # linear dofs: world axes; angular dofs: body-frame axes
                # rotating with the body (MuJoCo free-joint qvel convention)
                for k in range(3):
                    e = jnp.zeros(3, dtype=dtype).at[k].set(1.0)
                    cdof_rows[vadr + k] = jnp.concatenate([jnp.zeros(3, dtype), e])
                    cdofdot_rows[vadr + k] = jnp.zeros(6, dtype=dtype)
                    v = v + cdof_rows[vadr + k] * qvel[vadr + k]
                for k in range(3):
                    a_w = basis[:, k]
                    cdof_rows[vadr + 3 + k] = jnp.concatenate(
                        [a_w, jnp.cross(anchor, a_w)]
                    )
                    v = v + cdof_rows[vadr + 3 + k] * qvel[vadr + 3 + k]
                # angular axes are body-fixed: ṡ uses the body's FULL
                # velocity (they rotate with every dof of this joint)
                for k in range(3):
                    cdofdot_rows[vadr + 3 + k] = motion_cross(
                        v, cdof_rows[vadr + 3 + k]
                    )
            elif jt == BALL:
                for k in range(3):
                    a_w = basis[:, k]
                    cdof_rows[vadr + k] = jnp.concatenate(
                        [a_w, jnp.cross(anchor, a_w)]
                    )
                    v = v + cdof_rows[vadr + k] * qvel[vadr + k]
                for k in range(3):
                    cdofdot_rows[vadr + k] = motion_cross(v, cdof_rows[vadr + k])
            elif jt == SLIDE:
                cdof_rows[vadr] = jnp.concatenate([jnp.zeros(3, dtype), basis])
                cdofdot_rows[vadr] = motion_cross(v, cdof_rows[vadr])
                v = v + cdof_rows[vadr] * qvel[vadr]
            elif jt == HINGE:
                cdof_rows[vadr] = jnp.concatenate(
                    [basis, jnp.cross(anchor, basis)]
                )
                cdofdot_rows[vadr] = motion_cross(v, cdof_rows[vadr])
                v = v + cdof_rows[vadr] * qvel[vadr]
        cvel.append(v)

    cdof = jnp.stack(cdof_rows)
    cdof_dot = jnp.stack(cdofdot_rows)
    cinr = []
    for i in range(model.nbody):
        Ic = (
            fkr.body_rot[i]
            @ jnp.asarray(model.body_inertia[i], dtype)
            @ fkr.body_rot[i].T
        )
        cinr.append(
            make_spatial_inertia(
                jnp.asarray(model.body_mass[i], dtype), fkr.body_com[i], Ic
            )
        )
    return KinDyn(fkr, cdof, cdof_dot, cvel, cinr)


def _subtree_lists(model: RigidModel):
    """For each body, the list of its descendants (incl. itself)."""
    children: Dict[int, List[int]] = {i: [] for i in range(model.nbody)}
    for i in range(model.nbody):
        p = int(model.body_parent[i])
        if p >= 0:
            children[p].append(i)
    sub: Dict[int, List[int]] = {}

    def visit(i):
        acc = [i]
        for c in children[i]:
            acc.extend(visit(c))
        sub[i] = acc
        return acc

    for i in range(model.nbody):
        if int(model.body_parent[i]) < 0:
            visit(i)
    return sub


def _dofs_of_body_chain(model: RigidModel):
    """For each body, dofs on the path from the root to that body."""
    jnt_by_body: Dict[int, List[int]] = {}
    for j in range(model.njnt):
        jnt_by_body.setdefault(int(model.jnt_body[j]), []).append(j)
    nvj = {FREE: 6, BALL: 3, SLIDE: 1, HINGE: 1}
    chain: Dict[int, List[int]] = {}
    for i in range(model.nbody):
        p = int(model.body_parent[i])
        dofs = list(chain[p]) if p >= 0 else []
        for j in jnt_by_body.get(i, []):
            va = int(model.jnt_dofadr[j])
            dofs.extend(range(va, va + nvj[int(model.jnt_type[j])]))
        chain[i] = dofs
    return chain


def _ancestor_masks(model: RigidModel):
    """Static masks: dof→body, chain mask (nv, nb) [dof on root-path of a
    body], dof-ancestor mask (nv, nv), and the subtree matrix (nb, nb)."""
    chain = _dofs_of_body_chain(model)
    nvj = {FREE: 6, BALL: 3, SLIDE: 1, HINGE: 1}
    dof_body = np.zeros(model.nv, dtype=np.int32)
    for j in range(model.njnt):
        va = int(model.jnt_dofadr[j])
        for k in range(nvj[int(model.jnt_type[j])]):
            dof_body[va + k] = int(model.jnt_body[j])
    chain_mask = np.zeros((model.nv, model.nbody), dtype=bool)
    for b in range(model.nbody):
        for d in chain[b]:
            chain_mask[d, b] = True
    dof_anc = np.zeros((model.nv, model.nv), dtype=bool)
    for a in range(model.nv):
        for b in chain[int(dof_body[a])]:
            dof_anc[a, b] = True
    subtree = np.zeros((model.nbody, model.nbody), dtype=np.float64)
    sub = _subtree_lists(model)
    for i in range(model.nbody):
        for j_ in sub[i]:
            subtree[i, j_] = 1.0
    return dof_body, chain_mask, dof_anc, subtree


def get_masks(model: RigidModel):
    if not hasattr(model, "_masks"):
        model._masks = _ancestor_masks(model)
    return model._masks


@highest_matmul
def crb_mass_matrix(model: RigidModel, kd: KinDyn) -> jnp.ndarray:
    """Composite-rigid-body mass matrix in joint space (+armature).

    Vectorized: F_a = I^C_{body(a)} s_a for all dofs at once, then
    M = (F sᵀ) restricted to the static ancestor mask — small dense matmuls
    instead of nv² dynamic-update-slices (compile- and runtime-friendly)."""
    dtype = kd.cdof.dtype
    dof_body, chain_mask, dof_anc, subtree = get_masks(model)
    cinr_stack = jnp.stack(kd.cinr)                     # (nb, 6, 6)
    crb_stack = jnp.einsum(
        "ib,byz->iyz", jnp.asarray(subtree, dtype), cinr_stack
    )                                                   # (nb, 6, 6)
    crb_per_dof = crb_stack[np.asarray(dof_body)]       # (nv, 6, 6)
    F = jnp.einsum("dyz,dz->dy", crb_per_dof, kd.cdof)  # (nv, 6)
    Mfull = F @ kd.cdof.T                               # (nv, nv)
    mask = jnp.asarray(dof_anc)
    M = jnp.where(mask, Mfull, jnp.where(mask.T, Mfull.T, 0.0))
    M = M + jnp.diag(jnp.asarray(model.dof_armature, dtype))
    return M


@highest_matmul
def rne_bias(model: RigidModel, kd: KinDyn, qvel: jnp.ndarray) -> jnp.ndarray:
    """qfrc_bias: C(q, v)·v + gravity, via world-frame RNE with qacc = 0.

    Velocity-product accelerations use ``ṡ = v_body ×ₘ s`` (world-frame
    Featherstone); gravity enters through the fictitious base acceleration.
    """
    dtype = kd.cdof.dtype
    grav = jnp.asarray(model.gravity, dtype)
    a0 = jnp.concatenate([jnp.zeros(3, dtype), -grav])

    jnt_by_body: Dict[int, List[int]] = {}
    for j in range(model.njnt):
        jnt_by_body.setdefault(int(model.jnt_body[j]), []).append(j)
    nvj = {FREE: 6, BALL: 3, SLIDE: 1, HINGE: 1}

    cacc: List[jnp.ndarray] = []
    for i in range(model.nbody):
        p = int(model.body_parent[i])
        a = cacc[p] if p >= 0 else a0
        for j in jnt_by_body.get(i, []):
            va = int(model.jnt_dofadr[j])
            for k in range(nvj[int(model.jnt_type[j])]):
                a = a + kd.cdof_dot[va + k] * qvel[va + k]
        cacc.append(a)
    cfrc = jnp.stack([
        kd.cinr[i] @ cacc[i] + force_cross(kd.cvel[i], kd.cinr[i] @ kd.cvel[i])
        for i in range(model.nbody)
    ])                                                   # (nb, 6)

    # subtree-accumulated force per body, projected on each dof
    dof_body, chain_mask, dof_anc, subtree = get_masks(model)
    fsub = jnp.asarray(subtree, dtype) @ cfrc            # (nb, 6)
    fsub_per_dof = fsub[np.asarray(dof_body)]            # (nv, 6)
    return jnp.einsum("dz,dz->d", kd.cdof, fsub_per_dof)


@highest_matmul
def fluid_force(model: RigidModel, kd: KinDyn, qvel: jnp.ndarray) -> jnp.ndarray:
    """MuJoCo inertia-box fluid model: viscous + quadratic density drag.

    Per body: velocities in the body frame at the CoM; equivalent box from
    the diagonal inertia; forces rotated back to world and mapped to dofs
    through the ancestor-dof Jacobian (parity: mj_passive's
    inertia-box fluid model).
    """
    dtype = qvel.dtype
    qfrc = jnp.zeros(model.nv, dtype=dtype)
    if model.viscosity == 0.0 and model.fluid_density == 0.0:
        return qfrc
    fs_full = [jnp.zeros(6, dtype=dtype)] * model.nbody
    pi = np.pi
    for i in range(model.nbody):
        if model.body_mass[i] <= 0:
            continue
        R = kd.fkr.body_rot[i]
        com = kd.fkr.body_com[i]
        v6 = kd.cvel[i]
        w_w = v6[:3]
        v_w = v6[3:] + jnp.cross(w_w, com)      # linear velocity at CoM
        # body-frame velocities
        w_b = R.T @ w_w
        v_b = R.T @ v_w
        box = 2.0 * jnp.asarray(model.body_fluid_box[i], dtype)  # full sides
        force = jnp.zeros(3, dtype=dtype)
        torque = jnp.zeros(3, dtype=dtype)
        if model.viscosity > 0:
            diam = jnp.mean(box)
            force = force - 3.0 * pi * diam * model.viscosity * v_b
            torque = torque - pi * diam**3 * model.viscosity * w_b
        if model.fluid_density > 0:
            for k in range(3):
                j, l = (k + 1) % 3, (k + 2) % 3
                force = force.at[k].add(
                    -0.5 * model.fluid_density * box[j] * box[l]
                    * jnp.abs(v_b[k]) * v_b[k]
                )
                torque = torque.at[k].add(
                    -model.fluid_density * box[k]
                    * (box[j] ** 4 + box[l] ** 4) / 64.0
                    * jnp.abs(w_b[k]) * w_b[k]
                )
        f_w = R @ force
        t_w = R @ torque
        # spatial force at world origin: [m; f] with m = t + com × f
        fs_full[i] = jnp.concatenate([t_w + jnp.cross(com, f_w), f_w])
    _, chain_mask, _, _ = get_masks(model)
    fs_stack = jnp.stack(fs_full)                        # (nb, 6)
    proj = kd.cdof @ fs_stack.T                          # (nv, nb)
    return jnp.sum(proj * jnp.asarray(chain_mask), axis=1)


def dof_effective_mass(model: RigidModel, qpos0: np.ndarray) -> np.ndarray:
    """1 / (M⁻¹)_jj at the reference pose — the per-dof effective inertia
    used to scale constraint penalties (diagonal Delassus approximation)."""
    kd = kin_dyn(model, jnp.asarray(qpos0), jnp.zeros(model.nv))
    M = np.asarray(crb_mass_matrix(model, kd))
    Minv = np.linalg.inv(M)
    return 1.0 / np.maximum(np.diag(Minv), 1e-12)


def prepare(model: RigidModel) -> RigidModel:
    """Eager host-side precomputation (effective masses).  Must be called
    once after ``build_model``, OUTSIDE any jit trace."""
    model._dof_meff = dof_effective_mass(model, model.qpos0)
    return model


def limit_force(
    model: RigidModel,
    qpos: jnp.ndarray,
    qvel: jnp.ndarray,
    qacc0: jnp.ndarray,
    minv_diag: jnp.ndarray,
) -> jnp.ndarray:
    """Joint-limit constraint forces (diagonal Delassus approximation).

    Implements MuJoCo's impedance dynamics per violated limit: with
    unconstrained acceleration a0, the solver drives the constraint to
    a1 = (1-d)·a0 + d·aref, aref = -b·ṙ - k·r, so the constraint force is
    f = m_eff·d·(aref - a0), clamped unilateral.  Constants are the default
    solref (0.02, 1) / solimp (0.9, 0.95, 0.001).  Matches MuJoCo's resting
    violation on the swimmer under gear-150 torque to ~1e-4 rad.
    """
    dtype = qpos.dtype
    qfrc = jnp.zeros(model.nv, dtype=dtype)
    # MuJoCo clamps solref timeconst to >= 2*timestep for stability
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
        # upper limit: outward direction +1; lower: outward -1
        for sign, viol in (
            (1.0, jnp.maximum(q - hi, 0.0)),
            (-1.0, jnp.maximum(lo - q, 0.0)),
        ):
            active = viol > 0
            d = d0 + (dmax - d0) * jnp.clip(viol / width, 0.0, 1.0)
            k = d / (dmax * dmax * tc * tc)
            aref_out = -b * (sign * v) - k * viol
            a0_out = sign * a0
            f_out = m_eff * d * (aref_out - a0_out)
            f_out = jnp.minimum(f_out, 0.0)       # push inward only
            qfrc = qfrc.at[vadr].add(jnp.where(active, sign * f_out, 0.0))
    return qfrc


def actuator_force(model: RigidModel, ctrl: jnp.ndarray) -> jnp.ndarray:
    dtype = ctrl.dtype
    qfrc = jnp.zeros(model.nv, dtype=dtype)
    for u in range(model.nu):
        lo, hi = model.act_ctrlrange[u]
        c = jnp.clip(ctrl[u], lo, hi)
        qfrc = qfrc.at[int(model.act_dofadr[u])].add(
            jnp.asarray(model.act_gear[u], dtype) * c
        )
    return qfrc


@highest_matmul
def forward(
    model: RigidModel,
    qpos: jnp.ndarray,
    qvel: jnp.ndarray,
    ctrl: jnp.ndarray,
    extra_qfrc=None,
) -> jnp.ndarray:
    """qacc = M⁻¹ (τ - bias + passive + constraints).

    Two-pass structure mirroring MuJoCo: the smooth (unconstrained)
    acceleration qacc0 feeds the constraint impedances (joint limits here;
    contacts enter through ``extra_qfrc``, which receives (kd, qacc0))."""
    kd = kin_dyn(model, qpos, qvel)
    M = crb_mass_matrix(model, kd)
    bias = rne_bias(model, kd, qvel)
    tau = actuator_force(model, ctrl)
    tau = tau + fluid_force(model, kd, qvel)
    tau = tau - jnp.asarray(model.dof_damping, qpos.dtype) * qvel
    from .linalg import spd_inverse

    Minv = spd_inverse(M)
    qacc0 = Minv @ (tau - bias)
    minv_diag = jnp.diagonal(Minv)
    f_con = limit_force(model, qpos, qvel, qacc0, minv_diag)
    if extra_qfrc is not None:
        f_con = f_con + extra_qfrc(kd, qacc0, Minv, qvel)
    return Minv @ (tau + f_con - bias)


def integrate_pos(model: RigidModel, qpos: jnp.ndarray, qvel: jnp.ndarray, dt) -> jnp.ndarray:
    """qpos ← qpos ⊞ qvel·dt with proper quaternion handling."""
    out = qpos
    nqj = {FREE: 7, BALL: 4, SLIDE: 1, HINGE: 1}
    for j in range(model.njnt):
        jt = int(model.jnt_type[j])
        qadr = int(model.jnt_qposadr[j])
        vadr = int(model.jnt_dofadr[j])
        if jt == FREE:
            out = out.at[qadr : qadr + 3].add(qvel[vadr : vadr + 3] * dt)
            quat = qpos[qadr + 3 : qadr + 7]
            # angular velocity in body frame → integrate on the right
            w = qvel[vadr + 3 : vadr + 6]
            angle = jnp.sqrt(jnp.sum(w * w) + 1e-18)
            axis = w / angle
            half = angle * dt * 0.5
            dq = jnp.concatenate([jnp.cos(half)[None], axis * jnp.sin(half)[None]])
            newq = quat_mul(quat, dq)
            out = out.at[qadr + 3 : qadr + 7].set(
                newq / jnp.sqrt(jnp.sum(newq * newq))
            )
        elif jt == BALL:
            quat = qpos[qadr : qadr + 4]
            w = qvel[vadr : vadr + 3]
            angle = jnp.sqrt(jnp.sum(w * w) + 1e-18)
            axis = w / angle
            half = angle * dt * 0.5
            dq = jnp.concatenate([jnp.cos(half)[None], axis * jnp.sin(half)[None]])
            newq = quat_mul(quat, dq)
            out = out.at[qadr : qadr + 4].set(newq / jnp.sqrt(jnp.sum(newq * newq)))
        else:
            out = out.at[qadr].add(qvel[vadr] * dt)
    return out


def rk4_step(
    model: RigidModel,
    qpos: jnp.ndarray,
    qvel: jnp.ndarray,
    ctrl: jnp.ndarray,
    extra_qfrc=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One RK4 step of size model.timestep (parity: mj RK4 integrator).

    The four stages run under one ``lax.scan`` so the (large) forward-
    dynamics graph is compiled once per step, not four times — a major
    compile-time win for contact-rich models."""
    h = model.timestep
    dtype = qpos.dtype

    def acc(q, v):
        return forward(model, q, v, ctrl, extra_qfrc)

    h_s = jnp.asarray([0.0, h / 2, h / 2, h], dtype)
    w_s = jnp.asarray([1.0, 2.0, 2.0, 1.0], dtype)

    def stage(carry, xs):
        prev_v, prev_a, acc_v, acc_a = carry
        hs, w = xs
        q_s = integrate_pos(model, qpos, prev_v, hs)
        v_s = qvel + prev_a * hs
        a_s = acc(q_s, v_s)
        return (v_s, a_s, acc_v + w * v_s, acc_a + w * a_s), None

    zero_v = jnp.zeros_like(qvel)
    (_, _, acc_v, acc_a), _ = jax.lax.scan(
        stage, (qvel, zero_v, zero_v, zero_v), (h_s, w_s)
    )
    qpos_out = integrate_pos(model, qpos, acc_v / 6.0, h)
    qvel_out = qvel + (acc_a / 6.0) * h
    return qpos_out, qvel_out


def project_limits(
    model: RigidModel, qpos: jnp.ndarray, qvel: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Post-step hard projection onto joint ranges.

    MuJoCo's limit constraints are much stiffer than their solref suggests
    (the solver cancels arbitrarily large actuator torques; measured resting
    violation ~1e-3 rad on the swimmer under gear-150 torque).  The soft
    penalty in :func:`limit_force` shapes the approach; this projection caps
    the violation, zeroing the outward velocity component.
    """
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
        qc = jnp.clip(q, lo, hi)
        hit_hi = q > hi
        hit_lo = q < lo
        v = jnp.where(hit_hi & (v > 0), 0.0, v)
        v = jnp.where(hit_lo & (v < 0), 0.0, v)
        qpos = qpos.at[qadr].set(qc)
        qvel = qvel.at[vadr].set(v)
    return qpos, qvel


def euler_step(model, qpos, qvel, ctrl, extra_qfrc=None):
    """Semi-implicit Euler (MuJoCo default integrator)."""
    a = forward(model, qpos, qvel, ctrl, extra_qfrc)
    qvel = qvel + a * model.timestep
    qpos = integrate_pos(model, qpos, qvel, model.timestep)
    return qpos, qvel
