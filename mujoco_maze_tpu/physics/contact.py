"""Collision detection + contact forces, fully vectorized for TPU.

The TPU replacement for MuJoCo's collision pipeline + contact solver
(reference L0).  Design:

* Every *dynamic* geom lowers at build time to a fixed set of **test
  spheres** (sphere → itself; capsule → K=3 samples along its axis; box →
  its corners with radius 0).  Every *static* world geom is an axis-aligned
  box or the floor plane (true for all maze worlds).
* Detection is then three dense primitives — spheres-vs-plane (S,),
  spheres-vs-AABBs (S·B,), sphere-pairs (P,) — with no data-dependent
  control flow, so the whole contact stage is a handful of fused VPU ops
  per env and vectorizes under ``vmap``.
* Forces use MuJoCo's impedance dynamics per contact on the exact diagonal
  Delassus A = J M⁻¹ Jᵀ: f_n = d·(aref − a0)/A_nn clamped ≥ 0, friction
  driving slip to zero clamped to the μ·f_n cone.  This is a per-contact
  diagonal approximation of MuJoCo's coupled solver; adequacy is bounded by
  the differential tests in tests/test_ant.py.
"""

from __future__ import annotations

from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import engine as _engine
from .model import (
    GEOM_BOX,
    GEOM_CAPSULE,
    GEOM_PLANE,
    GEOM_SPHERE,
    Geom,
    RigidModel,
    _quat_to_mat_np,
)

CAPSULE_SAMPLES = 3
# solver works on at most this many deepest candidates (plenty: a robot
# touches ~10-20 surfaces at once)
MAX_ACTIVE_CONTACTS = 256


class ContactSet(NamedTuple):
    """Static (trace-time) description of all candidate contacts."""

    # test spheres over dynamic geoms
    sph_body: np.ndarray       # (S,) body index
    sph_local: np.ndarray      # (S, 3) offset in body frame
    sph_radius: np.ndarray     # (S,)
    sph_solref: np.ndarray     # (S, 2)
    sph_solimp: np.ndarray     # (S, 3)
    sph_friction: np.ndarray   # (S,)
    sph_margin: np.ndarray     # (S,) geom margin (combined per contact)
    sph_vs_static: np.ndarray  # (S,) bool — collides with world geoms
    # static world: axis-aligned boxes
    box_center: np.ndarray     # (B, 3)
    box_half: np.ndarray       # (B, 3)
    box_margin: np.ndarray     # (B,)
    has_floor: bool
    floor_z: float
    floor_margin: float
    # dynamic sphere-sphere candidate pairs
    pair_i: np.ndarray         # (P,)
    pair_j: np.ndarray         # (P,)
    # dynamic (moving) boxes + sphere-vs-dynbox candidate pairs
    dbox_body: np.ndarray      # (D,)
    dbox_local: np.ndarray     # (D, 3) geom offset in body frame
    dbox_half: np.ndarray      # (D, 3)
    dbox_solref: np.ndarray    # (D, 2)
    dbox_solimp: np.ndarray    # (D, 3)
    dbox_friction: np.ndarray  # (D,)
    dbox_margin: np.ndarray    # (D,)
    qpair_s: np.ndarray        # (Q,) sphere index
    qpair_b: np.ndarray        # (Q,) dyn box index


def _geom_test_spheres(g: Geom):
    """[(local_pos, radius)] test-sphere decomposition of a dynamic geom."""
    R = _quat_to_mat_np(np.asarray(g.quat))
    p = np.asarray(g.pos, dtype=np.float64)
    if g.gtype == GEOM_SPHERE:
        return [(p, g.size[0])]
    if g.gtype == GEOM_CAPSULE:
        r, hl = g.size[0], g.size[1]
        axis = R[:, 2]
        return [
            (p + axis * (hl * t), r)
            for t in np.linspace(-1.0, 1.0, CAPSULE_SAMPLES)
        ]
    if g.gtype == GEOM_BOX:
        out = []
        hx, hy, hz = g.size
        for sx in (-1.0, 1.0):
            for sy in (-1.0, 1.0):
                for sz in (-1.0, 1.0):
                    out.append((p + R @ np.array([sx * hx, sy * hy, sz * hz]), 0.0))
        return out
    raise NotImplementedError(f"dynamic geom type {g.gtype}")


def build_contact_set(model: RigidModel, extra_margin: float = 0.0) -> ContactSet:
    """Static enumeration of candidate contacts.

    Pairs follow MuJoCo's contype/conaffinity masks with the default
    parent-child exclusion for dynamic-dynamic pairs.
    """
    sph_body: List[int] = []
    sph_local: List[np.ndarray] = []
    sph_radius: List[float] = []
    sph_solref: List[Tuple[float, float]] = []
    sph_solimp: List[Tuple[float, float, float]] = []
    sph_friction: List[float] = []
    sph_margin: List[float] = []
    sph_vs_static: List[bool] = []
    geom_sphere_ids: List[Tuple[int, Geom, List[int]]] = []

    statics = model.static_geoms or []
    any_static = any(g.gtype in (GEOM_BOX, GEOM_PLANE) for g in statics)

    def collidable(g1: Geom, g2: Geom) -> bool:
        return bool((g1.contype & g2.conaffinity) or (g2.contype & g1.conaffinity))

    dbox_body: List[int] = []
    dbox_local: List[np.ndarray] = []
    dbox_half: List[np.ndarray] = []
    dbox_solref: List[Tuple[float, float]] = []
    dbox_solimp: List[Tuple[float, float, float]] = []
    dbox_friction: List[float] = []
    dbox_margin: List[float] = []
    dyn_boxes: List[Tuple[int, Geom, int]] = []

    for body, g in model.geoms:
        if g.contype == 0 and g.conaffinity == 0:
            continue
        if g.gtype == GEOM_BOX:
            # Moving boxes (maze blocks) collide with robot spheres only:
            # their slide-joint limits already encode block-vs-wall and
            # block-vs-chasm-floor constraints, and support on platforms is
            # a dedicated impedance (envs/env.py) — static contacts on the
            # box would be all degenerate corner-on-face cases.
            dyn_boxes.append((body, g, len(dbox_body)))
            dbox_body.append(body)
            dbox_local.append(np.asarray(g.pos, dtype=np.float64))
            dbox_half.append(np.asarray(g.size, dtype=np.float64))
            dbox_solref.append(tuple(g.solref))
            dbox_solimp.append(tuple(g.solimp))
            dbox_friction.append(g.friction[0])
            dbox_margin.append(g.margin)
            continue
        ids = []
        vs_static = any_static and any(collidable(g, sg) for sg in statics)
        for local, r in _geom_test_spheres(g):
            ids.append(len(sph_body))
            sph_body.append(body)
            sph_local.append(local)
            sph_radius.append(r)
            sph_solref.append(tuple(g.solref))
            sph_solimp.append(tuple(g.solimp))
            sph_friction.append(g.friction[0])
            sph_margin.append(g.margin + extra_margin)
            sph_vs_static.append(vs_static)
        geom_sphere_ids.append((body, g, ids))

    # dynamic-dynamic pairs: different bodies, not ancestor-related
    parent = model.body_parent

    def related(a: int, b: int) -> bool:
        x = a
        while x >= 0:
            if x == b:
                return True
            x = int(parent[x])
        x = b
        while x >= 0:
            if x == a:
                return True
            x = int(parent[x])
        return False

    pair_i: List[int] = []
    pair_j: List[int] = []
    for a in range(len(geom_sphere_ids)):
        b1, g1, ids1 = geom_sphere_ids[a]
        for b in range(a + 1, len(geom_sphere_ids)):
            b2, g2, ids2 = geom_sphere_ids[b]
            if b1 == b2 or related(b1, b2):
                continue
            if not collidable(g1, g2):
                continue
            for i in ids1:
                for j in ids2:
                    pair_i.append(i)
                    pair_j.append(j)
    qpair_s: List[int] = []
    qpair_b: List[int] = []
    for b1, g1, ids1 in geom_sphere_ids:
        for b2, g2, d_idx in dyn_boxes:
            if b1 == b2 or related(b1, b2):
                continue
            if not collidable(g1, g2):
                continue
            for i in ids1:
                qpair_s.append(i)
                qpair_b.append(d_idx)

    boxes_c, boxes_h, boxes_m = [], [], []
    has_floor, floor_z, floor_margin = False, 0.0, 0.0
    for sg in statics:
        if sg.gtype == GEOM_PLANE:
            has_floor = True
            floor_z = sg.pos[2]
            floor_margin = sg.margin
        elif sg.gtype == GEOM_BOX:
            boxes_c.append(np.asarray(sg.pos, dtype=np.float64))
            boxes_h.append(np.asarray(sg.size, dtype=np.float64))
            boxes_m.append(sg.margin)

    return ContactSet(
        sph_body=np.asarray(sph_body, dtype=np.int32),
        sph_local=np.asarray(sph_local, dtype=np.float64).reshape(-1, 3),
        sph_radius=np.asarray(sph_radius, dtype=np.float64),
        sph_solref=np.asarray(sph_solref, dtype=np.float64).reshape(-1, 2),
        sph_solimp=np.asarray(sph_solimp, dtype=np.float64).reshape(-1, 3),
        sph_friction=np.asarray(sph_friction, dtype=np.float64),
        sph_margin=np.asarray(sph_margin, dtype=np.float64),
        sph_vs_static=np.asarray(sph_vs_static, dtype=bool),
        box_center=(
            np.asarray(boxes_c, dtype=np.float64).reshape(-1, 3)
            if boxes_c
            else np.zeros((0, 3))
        ),
        box_half=(
            np.asarray(boxes_h, dtype=np.float64).reshape(-1, 3)
            if boxes_h
            else np.zeros((0, 3))
        ),
        box_margin=np.asarray(boxes_m, dtype=np.float64),
        has_floor=has_floor,
        floor_z=floor_z,
        floor_margin=floor_margin,
        pair_i=np.asarray(pair_i, dtype=np.int32),
        pair_j=np.asarray(pair_j, dtype=np.int32),
        dbox_body=np.asarray(dbox_body, dtype=np.int32),
        dbox_local=np.asarray(dbox_local, dtype=np.float64).reshape(-1, 3),
        dbox_half=np.asarray(dbox_half, dtype=np.float64).reshape(-1, 3),
        dbox_solref=np.asarray(dbox_solref, dtype=np.float64).reshape(-1, 2),
        dbox_solimp=np.asarray(dbox_solimp, dtype=np.float64).reshape(-1, 3),
        dbox_friction=np.asarray(dbox_friction, dtype=np.float64),
        dbox_margin=np.asarray(dbox_margin, dtype=np.float64),
        qpair_s=np.asarray(qpair_s, dtype=np.int32),
        qpair_b=np.asarray(qpair_b, dtype=np.int32),
    )



def _min_exit_normal(local, bh, dtype):
    """Branch-free min-exit-axis normal for a point inside a box.

    Returns (n_in (...,3), pen_in (...)). Pure elementwise arithmetic —
    argmin/take_along_axis gathers are pathologically slow on TPU for small
    inner dims (measured 10x of the whole contact stage).
    """
    exit_d = bh - jnp.abs(local)
    ex, ey, ez = exit_d[..., 0], exit_d[..., 1], exit_d[..., 2]
    m = jnp.minimum(jnp.minimum(ex, ey), ez)
    is_x = ex <= jnp.minimum(ey, ez)
    is_y = (~is_x) & (ey <= ez)
    is_z = (~is_x) & (~is_y)
    sgn = jnp.where(local >= 0, 1.0, -1.0).astype(dtype)
    n_in = jnp.stack(
        [
            jnp.where(is_x, sgn[..., 0], 0.0),
            jnp.where(is_y, sgn[..., 1], 0.0),
            jnp.where(is_z, sgn[..., 2], 0.0),
        ],
        axis=-1,
    )
    return n_in, -m


@_engine.highest_matmul
def contact_qfrc(
    model: RigidModel,
    cs: ContactSet,
    kd,
    qvel: jnp.ndarray,
    qacc0: jnp.ndarray,
    Minv: jnp.ndarray,
    chain_mask: np.ndarray,
) -> jnp.ndarray:
    """Total generalized contact force over all candidate contacts."""
    dtype = qvel.dtype
    nv = model.nv
    S = len(cs.sph_body)
    if S == 0:
        return jnp.zeros(nv, dtype=dtype)

    body_R = jnp.stack(kd.fkr.body_rot)           # (nb, 3, 3)
    body_p = jnp.stack(kd.fkr.body_pos)           # (nb, 3)
    sph_R = body_R[cs.sph_body]                   # (S, 3, 3)
    centers = body_p[cs.sph_body] + jnp.einsum(
        "syz,sz->sy", sph_R, jnp.asarray(cs.sph_local, dtype)
    )                                             # (S, 3)
    radius = jnp.asarray(cs.sph_radius, dtype)

    # collect candidate contacts as flat arrays
    dists, poss, normals = [], [], []
    bod1, bod2 = [], []
    solref, solimp, frics, margins = [], [], [], []

    def add_np(arr, val):
        arr.append(val)

    # -- spheres vs floor plane ----------------------------------------
    if cs.has_floor:
        mask = cs.sph_vs_static
        idx = np.nonzero(mask)[0]
        if len(idx):
            c = centers[idx]
            r = radius[idx]
            dists.append(c[:, 2] - cs.floor_z - r)
            poss.append(
                jnp.concatenate(
                    [c[:, :2], (c[:, 2] - r)[:, None]], axis=1
                )
            )
            normals.append(
                jnp.broadcast_to(
                    jnp.asarray([0.0, 0.0, 1.0], dtype), (len(idx), 3)
                )
            )
            bod1.append(cs.sph_body[idx])
            bod2.append(np.full(len(idx), -1, dtype=np.int32))
            solref.append(cs.sph_solref[idx])
            solimp.append(cs.sph_solimp[idx])
            frics.append(cs.sph_friction[idx])
            margins.append(cs.sph_margin[idx] + cs.floor_margin)

    # -- spheres vs static AABBs ---------------------------------------
    B = len(cs.box_center)
    if B > 0:
        idx = np.nonzero(cs.sph_vs_static)[0]
        if len(idx):
            c = centers[idx]                       # (s, 3)
            r = radius[idx]
            bc = jnp.asarray(cs.box_center, dtype)  # (B, 3)
            bh = jnp.asarray(cs.box_half, dtype)
            local = c[:, None, :] - bc[None, :, :]  # (s, B, 3)
            clamped = jnp.clip(local, -bh[None], bh[None])
            delta = local - clamped
            d_out = jnp.sqrt(jnp.sum(delta * delta, axis=-1) + 1e-12)
            outside = d_out > 1e-6
            n_out = delta / d_out[..., None]
            n_in, pen_in = _min_exit_normal(local, bh[None], dtype)
            dist = jnp.where(outside, d_out - r[:, None], pen_in - r[:, None])
            n = jnp.where(outside[..., None], n_out, n_in)
            surf_local = jnp.where(
                outside[..., None], clamped, local - n_in * pen_in[..., None]
            )
            pos = bc[None] + surf_local
            s_ = len(idx)
            # Per-sphere nearest-2 boxes via branch-free min chains: a
            # sphere touches at most two wall boxes at once (a corner), so
            # the remaining B-2 candidates can never carry force.  Avoids
            # both the O(S·B) solver rows and a top-k sort (TPU sorts are
            # slow).
            bmarg = jnp.asarray(cs.box_margin, dtype)
            eff = dist - bmarg[None, :]            # rank by margin-adjusted dist
            INF = jnp.asarray(np.inf, dtype)
            b1_d = jnp.full((s_,), INF, dtype)
            b2_d = jnp.full((s_,), INF, dtype)
            zeros3 = jnp.zeros((s_, 3), dtype)
            b1_dist = jnp.zeros((s_,), dtype)
            b2_dist = jnp.zeros((s_,), dtype)
            b1_n = zeros3
            b2_n = zeros3
            b1_p = zeros3
            b2_p = zeros3
            b1_m = jnp.zeros((s_,), dtype)
            b2_m = jnp.zeros((s_,), dtype)
            for b in range(B):
                cur_d = eff[:, b]
                better1 = cur_d < b1_d
                better2 = (~better1) & (cur_d < b2_d)
                # demote old best to second where the new one wins
                b2_d = jnp.where(better1, b1_d, jnp.where(better2, cur_d, b2_d))
                b2_dist = jnp.where(
                    better1, b1_dist, jnp.where(better2, dist[:, b], b2_dist)
                )
                b2_n = jnp.where(
                    better1[:, None], b1_n,
                    jnp.where(better2[:, None], n[:, b], b2_n),
                )
                b2_p = jnp.where(
                    better1[:, None], b1_p,
                    jnp.where(better2[:, None], pos[:, b], b2_p),
                )
                b2_m = jnp.where(
                    better1, b1_m, jnp.where(better2, bmarg[b], b2_m)
                )
                b1_d = jnp.where(better1, cur_d, b1_d)
                b1_dist = jnp.where(better1, dist[:, b], b1_dist)
                b1_n = jnp.where(better1[:, None], n[:, b], b1_n)
                b1_p = jnp.where(better1[:, None], pos[:, b], b1_p)
                b1_m = jnp.where(better1, bmarg[b], b1_m)
            sel = [(b1_dist, b1_n, b1_p, b1_m)]
            if B > 1:
                sel.append((b2_dist, b2_n, b2_p, b2_m))
            for d_s, n_s, p_s, m_s in sel:
                dists.append(d_s)
                poss.append(p_s)
                normals.append(n_s)
                bod1.append(cs.sph_body[idx])
                bod2.append(np.full(s_, -1, dtype=np.int32))
                solref.append(cs.sph_solref[idx])
                solimp.append(cs.sph_solimp[idx])
                frics.append(cs.sph_friction[idx])
                margins.append(jnp.asarray(cs.sph_margin[idx], dtype) + m_s)

    # -- dynamic sphere-sphere pairs -----------------------------------
    P = len(cs.pair_i)
    if P > 0:
        i, j = cs.pair_i, cs.pair_j
        ci, cj = centers[i], centers[j]
        ri, rj = radius[i], radius[j]
        d = ci - cj
        dn = jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-12)
        n = d / dn[:, None]
        dist = dn - (ri + rj)
        pos = cj + n * (rj + dist * 0.5)[:, None]
        dists.append(dist)
        poss.append(pos)
        normals.append(n)
        bod1.append(cs.sph_body[i])
        bod2.append(cs.sph_body[j])
        solref.append((cs.sph_solref[i] + cs.sph_solref[j]) / 2)
        solimp.append((cs.sph_solimp[i] + cs.sph_solimp[j]) / 2)
        frics.append(np.maximum(cs.sph_friction[i], cs.sph_friction[j]))
        margins.append(cs.sph_margin[i] + cs.sph_margin[j])

    # -- spheres vs dynamic (moving) boxes -----------------------------
    Q = len(cs.qpair_s)
    if Q > 0:
        si, bi = cs.qpair_s, cs.qpair_b
        c = centers[si]                                 # (Q, 3)
        r = radius[si]
        box_bodies = cs.dbox_body[bi]
        Rb = body_R[box_bodies]                         # (Q, 3, 3)
        bc = body_p[box_bodies] + jnp.einsum(
            "qyz,qz->qy", Rb, jnp.asarray(cs.dbox_local[bi], dtype)
        )                                               # (Q, 3)
        bh = jnp.asarray(cs.dbox_half[bi], dtype)
        local = jnp.einsum("qzy,qz->qy", Rb, c - bc)    # box-frame
        clamped = jnp.clip(local, -bh, bh)
        delta = local - clamped
        d_out = jnp.sqrt(jnp.sum(delta * delta, axis=-1) + 1e-12)
        outside = d_out > 1e-6
        n_out = delta / d_out[..., None]
        n_in, pen_in = _min_exit_normal(local, bh, dtype)
        dist = jnp.where(outside, d_out - r, pen_in - r)
        n_local = jnp.where(outside[..., None], n_out, n_in)
        surf_local = jnp.where(
            outside[..., None], clamped, local - n_in * pen_in[..., None]
        )
        n = jnp.einsum("qyz,qz->qy", Rb, n_local)       # world normal
        pos = bc + jnp.einsum("qyz,qz->qy", Rb, surf_local)
        dists.append(dist)
        poss.append(pos)
        normals.append(n)
        bod1.append(cs.sph_body[si])
        bod2.append(box_bodies)
        solref.append((cs.sph_solref[si] + cs.dbox_solref[bi]) / 2)
        solimp.append((cs.sph_solimp[si] + cs.dbox_solimp[bi]) / 2)
        frics.append(np.maximum(cs.sph_friction[si], cs.dbox_friction[bi]))
        margins.append(cs.sph_margin[si] + cs.dbox_margin[bi])

    if not dists:
        return jnp.zeros(nv, dtype=dtype)

    dist = jnp.concatenate(dists)                  # (Call,)
    pos = jnp.concatenate(poss)                    # (Call, 3)
    normal = jnp.concatenate(normals)              # (Call, 3)
    b1 = np.concatenate(bod1)
    b2 = np.concatenate(bod2)
    srf = np.concatenate(solref, axis=0)
    sim = np.concatenate(solimp, axis=0)
    mu = jnp.asarray(np.concatenate(frics), dtype)
    # margins may be dynamic (nearest-box selection) — concat as jnp
    margin = jnp.concatenate([jnp.asarray(m, dtype) for m in margins])

    # Top-K candidate selection: detection above is dense and cheap, but
    # Jacobians + solver sweeps are memory-bound in the candidate count —
    # with all sphere×box candidates the J re-reads dominate the whole
    # forward pass (measured 27ms of a 29ms ant forward).  Only the K
    # deepest candidates can carry force; a robot touches far fewer than
    # MAX_ACTIVE_CONTACTS surfaces at once.
    C_all = int(dist.shape[0])
    if C_all > MAX_ACTIVE_CONTACTS:
        k = MAX_ACTIVE_CONTACTS
        _, sel = jax.lax.top_k(margin - dist, k)   # most-violating first
        dist = dist[sel]
        pos = pos[sel]
        normal = normal[sel]
        mu = mu[sel]
        margin = margin[sel]
        b1j = jnp.asarray(b1)[sel]
        b2j = jnp.asarray(b2)[sel]
        srf_j = jnp.asarray(srf, dtype)[sel]
        sim_j = jnp.asarray(sim, dtype)[sel]
        cm = jnp.asarray(chain_mask, dtype)        # (nv, nb)
        sign_mask = cm.T[b1j] - jnp.where(
            (b2j >= 0)[:, None], cm.T[jnp.maximum(b2j, 0)], 0.0
        )
        d0 = sim_j[:, 0]
        dmax = sim_j[:, 1]
        width = sim_j[:, 2]
        tc = jnp.maximum(srf_j[:, 0], 2.0 * model.timestep)
        dampr = srf_j[:, 1]
    else:
        cm = jnp.asarray(chain_mask, dtype)
        sign_mask = cm.T[b1] - jnp.where(
            (b2 >= 0)[:, None], cm.T[np.maximum(b2, 0)], 0.0
        )
        d0 = jnp.asarray(sim[:, 0], dtype)
        dmax = jnp.asarray(sim[:, 1], dtype)
        width = jnp.asarray(sim[:, 2], dtype)
        tc = jnp.maximum(jnp.asarray(srf[:, 0], dtype), 2.0 * model.timestep)
        dampr = jnp.asarray(srf[:, 1], dtype)

    # tangent frames
    refv = jnp.where(
        (jnp.abs(normal[:, 0]) < 0.5)[:, None],
        jnp.asarray([1.0, 0.0, 0.0], dtype)[None],
        jnp.asarray([0.0, 1.0, 0.0], dtype)[None],
    )
    t1 = jnp.cross(normal, refv)
    t1 = t1 / jnp.sqrt(jnp.sum(t1 * t1, axis=-1, keepdims=True) + 1e-12)
    t2 = jnp.cross(normal, t1)

    def jrows(direction):
        F = jnp.concatenate([jnp.cross(pos, direction), direction], axis=-1)
        proj = F @ kd.cdof.T                       # (C, nv)
        return proj * sign_mask

    Jn = jrows(normal)
    Jt1 = jrows(t1)
    Jt2 = jrows(t2)

    # impedance constants per contact (tc carries MuJoCo's >= 2*timestep
    # stability clamp, applied above)
    b_imp = 2.0 / (dmax * tc)

    active = dist < margin
    r = dist - margin
    imp = d0 + (dmax - d0) * jnp.clip(-r / width, 0.0, 1.0)
    k_imp = imp / (dmax * dmax * tc * tc * dampr * dampr)

    # stacked constraint rows: [normals; tangent1; tangent2] → (3C, nv)
    J = jnp.concatenate([Jn, Jt1, Jt2], axis=0)
    aref = jnp.concatenate(
        [
            -b_imp * (Jn @ qvel) - k_imp * r,
            -b_imp * (Jt1 @ qvel),
            -b_imp * (Jt2 @ qvel),
        ]
    )
    a0 = J @ qacc0
    JM = J @ Minv                                  # (3C, nv)
    A_diag = jnp.einsum("cv,cv->c", JM, J)
    imp3 = jnp.tile(imp, 3)
    active3 = jnp.tile(active, 3)
    # MuJoCo regularization: R_ii = (1-d)/d * A_ii
    Rreg = (1.0 - imp3) / jnp.maximum(imp3, 1e-6) * A_diag
    denom = A_diag + Rreg + 1e-9
    C = Jn.shape[0]
    mu3 = mu

    def project(f):
        f_n = jnp.maximum(f[:C], 0.0)
        f_n = jnp.where(active, f_n, 0.0)
        ft1, ft2 = f[C : 2 * C], f[2 * C :]
        ft_norm = jnp.sqrt(ft1**2 + ft2**2 + 1e-12)
        scale = jnp.minimum(1.0, mu3 * f_n / ft_norm)
        return jnp.concatenate(
            [f_n, jnp.where(active, ft1 * scale, 0.0),
             jnp.where(active, ft2 * scale, 0.0)]
        )

    # Projected Jacobi on (A + R) f = aref − a0: parallel over all rows,
    # cone projection each sweep (coupled-contact correction the one-shot
    # diagonal model lacks).
    omega = 0.6

    def sweep(_, f):
        a_f = J @ (Minv @ (J.T @ f))
        resid = aref - a0 - a_f - Rreg * f
        return project(f + omega * resid / denom)

    f = project((aref - a0) / denom)
    f = jax.lax.fori_loop(0, CONTACT_SOLVER_ITERS, sweep, f)
    qfrc = J.T @ f
    return qfrc


# Projected-Jacobi sweep count for the contact solve.  Round-4 convergence
# study: EVERY MuJoCo differential (tests/test_ant.py drop transient at
# atol 5e-3, equilibria; tests/test_engine.py qacc/rollout) passes at 4
# sweeps identically to the round 1-3 value of 10 — the solve was
# over-iterated — and the Ant rollout kernel gains +50% throughput
# (1.11M -> 1.66M env-steps/s at 4096 envs, v5e).  Overridable for
# studies; the Pallas kernels inherit this value via ops.*.spec_from_env
# so kernel<->engine parity holds at any setting.
import os as _os

CONTACT_SOLVER_ITERS = int(_os.environ.get("MMT_SOLVER_ITERS", "4"))


def jax_one_hot(idx, depth, dtype):
    return (
        idx[..., None] == jnp.arange(depth)[(None,) * idx.ndim]
    ).astype(dtype)


def falling_support_force(z, bottom, s, vz, a0, w, tc, mu=1.0,
                          lim_margin=0.01):
    """Coupled platform-support + upper-z-limit impedance force for a
    falling (z-slide) maze block — round-5.

    Reference geometry (probed on MuJoCo 3, tools/golden_gen worlds): the
    fall block is synthesized overlapping its own elevated platform box
    (maze_env.py:578-586); box-box contact pops it on TOP, where it
    perches with the (−h, 0) z limit softly violated by ~h — an
    equilibrium between the saturated platform contact (solimp
    .995/.995/.01; 4 face corners × 4 pyramid facets of normal
    admittance) and the saturated soft limit (solimp .9/.95/.001).
    Pushed past the platform edge the support target drops to the global
    floor plane and the block falls flush (the Fall bridge).  AntFall
    settle probe: MuJoCo z = +3.9217, this solve 3.902.

    The two rows share one diagonal dof, so the coupled solve is closed
    form with unilateral case analysis.  ``z``: z-joint value; ``bottom``:
    box bottom height; ``s``: support target (max overlapped platform top,
    else 0); ``w``: dof inverse weight (1/mass); ``a0``: unconstrained
    (smooth) z acceleration.  Returns the net generalized force on the
    z dof.  All inputs may be scalars, lanes or batch-last arrays.
    """
    d_c = 0.995
    k_c = d_c / (0.995 * 0.995 * tc * tc)
    b_c = 2.0 / (0.995 * tc)
    pen_c = s - bottom
    aref_c = -b_c * vz + k_c * pen_c
    R_c = ((1.0 - d_c) / d_c) * (2.0 * (1.0 + mu * mu)) * w / 16.0
    act_c = pen_c > 0.0
    pen_l = z + lim_margin
    x = jnp.clip(pen_l / 0.001, 0.0, 1.0)
    y = jnp.where(x < 0.5, 2.0 * x * x, 1.0 - 2.0 * (1.0 - x) * (1.0 - x))
    d_l = 0.9 + y * 0.05
    k_l = d_l / (0.95 * 0.95 * tc * tc)
    b_l = 2.0 / (0.95 * tc)
    aref_l = b_l * vz + k_l * pen_l
    R_l = ((1.0 - d_l) / d_l) * w
    act_l = pen_l > 0.0
    qa_both = ((a0 + w * aref_c / R_c - w * aref_l / R_l)
               / (1.0 + w / R_c + w / R_l))
    qa_c = (a0 + w * aref_c / R_c) / (1.0 + w / R_c)
    qa_l = (a0 - w * aref_l / R_l) / (1.0 + w / R_l)
    fc_both = (aref_c - qa_both) / R_c
    fl_both = (aref_l + qa_both) / R_l
    fc_only = (aref_c - qa_c) / R_c
    fl_only = (aref_l + qa_l) / R_l
    use_c = act_c & (fc_only > 0.0)
    use_l = act_l & (fl_only > 0.0)
    both = use_c & use_l & (fc_both > 0.0) & (fl_both > 0.0)
    return jnp.where(
        both, fc_both - fl_both,
        jnp.where(use_c, jnp.maximum(fc_only, 0.0),
                  jnp.where(use_l, -jnp.maximum(fl_only, 0.0), 0.0)))
