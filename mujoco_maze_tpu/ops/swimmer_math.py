"""Closed-form planar 3-link swimmer dynamics (lane-friendly scalar ops).

Specialization of the generic engine for the swimmer topology
(slide-slide-hinge torso + two hinged tail links): mass matrix, velocity-
product bias, MuJoCo inertia-box fluid drag and impedance joint limits are
written as elementwise scalar expressions over per-env lane vectors — no
(3,3)/(6,6) tensors, no gathers — so the same function runs efficiently
under ``vmap`` on the XLA path AND inside a Pallas kernel with the batch on
the 128-wide lanes.

Validated against the generic engine (itself MuJoCo-exact) in
tests/test_swimmer_fast.py.  Coordinates: q = (x, y, θ, φ2, φ3); link
angles a1=θ, a2=θ+φ2, a3=θ+φ2+φ3; geometry from assets/swimmer.xml —
torso com +1.0x̂, mid attach +0.5x̂, mid com −0.5x̂, back attach −1.0x̂,
back com −0.5x̂ (all in link frames).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ._fold import cadd, cdiv, cmul, cneg, csqrt_clamped, csub


class SwimmerKernelSpec(NamedTuple):
    mass: float          # per link (identical links)
    inertia_z: float     # Izz about com
    armature: float
    viscosity: float
    density: float
    box: np.ndarray      # (3,) full sides of the equivalent inertia box
    gear: float
    limit_lo: float      # rot2/rot3 range (symmetric)
    limit_hi: float
    timestep: float
    n_act: int           # 2 = swimmer, 1 = reacher
    n_links: int         # 3 = swimmer, 2 = reacher


def spec_from_model(model) -> SwimmerKernelSpec:
    """Lower a swimmer/reacher RigidModel to kernel constants."""
    lo, hi = model.jnt_range[3]
    return SwimmerKernelSpec(
        mass=float(model.body_mass[0]),
        inertia_z=float(model.body_inertia[0][2, 2]),
        armature=float(model.dof_armature[0]),
        viscosity=float(model.viscosity),
        density=float(model.fluid_density),
        box=2.0 * np.asarray(model.body_fluid_box[0], np.float64),
        gear=float(model.act_gear[0]),
        limit_lo=float(lo),
        limit_hi=float(hi),
        timestep=float(model.timestep),
        n_act=model.nu,
        n_links=model.nbody,
    )


def _chol5_solve(A, b):
    """Solve the symmetric n×n (list-of-lists of lane vectors) system;
    returns (x, L) so callers can reuse the factor via _chol_resolve."""
    L = _chol_factor(A)
    return _chol_resolve(L, b), L


def _chol_factor(A):
    """Cholesky factor L of a symmetric list-of-lists lane matrix.

    Entries may be python floats (trace-time constants, ops/_fold.py) —
    constant sub-blocks (e.g. the ant's linear-linear total-mass block)
    factor at trace time, and a constant diagonal turns the column's
    divides into reciprocal multiplies."""
    n = len(A)
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = A[j][j]
        for k in range(j):
            s = csub(s, cmul(L[j][k], L[j][k]))
        L[j][j] = csqrt_clamped(s, 1e-12)
        for i in range(j + 1, n):
            s = A[i][j]
            for k in range(j):
                s = csub(s, cmul(L[i][k], L[j][k]))
            L[i][j] = cdiv(s, L[j][j])
    return L


def _chol_resolve(L, b):
    """Solve with an existing Cholesky factor (skips the O(n³/3)
    refactorization of :func:`_chol5_solve` when A is unchanged)."""
    n = len(b)
    y = [None] * n
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = csub(s, cmul(L[i][k], y[k]))
        y[i] = cdiv(s, L[i][i])
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = csub(s, cmul(L[k][i], x[k]))
        x[i] = cdiv(s, L[i][i])
    return x


def _chol_inv_columns(L):
    """All columns of A⁻¹ from the Cholesky factor, exploiting the unit
    right-hand sides symbolically: the forward substitution for e_d starts
    at row d (rows above are structurally zero), so column d costs
    (n−d)²/2 + n²/2 madds instead of a full refactor+solve.  Returns
    cols[d] = A⁻¹[:, d] as a list of lane scalars."""
    n = len(L)
    cols = []
    for d in range(n):
        y = [None] * n  # None ≡ structurally zero
        y[d] = cdiv(1.0, L[d][d])
        for i in range(d + 1, n):
            s = None
            for k in range(d, i):
                if y[k] is None:
                    continue
                t = cmul(L[i][k], y[k])
                s = t if s is None else cadd(s, t)
            y[i] = cdiv(cneg(s), L[i][i]) if s is not None else None
        x = [None] * n
        for i in reversed(range(n)):
            s = y[i]
            for k in range(i + 1, n):
                if x[k] is None:
                    continue
                t = cmul(L[k][i], x[k])
                s = cneg(t) if s is None else csub(s, t)
            x[i] = None if s is None else cdiv(s, L[i][i])
        cols.append(x)
    return cols


def forward_swimmer(ks: SwimmerKernelSpec, q, v, ctrl):
    """qacc for the 3-link swimmer (n=5 coords) or 2-link reacher (n=4).

    q, v: tuples of n lane vectors (x, y, th, p2[, p3]); ctrl: tuple of
    ks.n_act.  Returns tuple of n lane vectors.  Reacher's two links are
    geometrically identical to the swimmer's first two (reacher.xml:20-31
    vs swimmer.xml), so the 2-link case just drops the p3 column/link.
    """
    n = len(q)
    assert n in (4, 5) and n == 3 + ks.n_links - 1
    if n == 5:
        x, y, th, p2, p3 = q
        vx, vy, vth, vp2, vp3 = v
    else:
        x, y, th, p2 = q
        vx, vy, vth, vp2 = v
        p3 = vp3 = None
    m = (ks.mass)
    Iz = (ks.inertia_z)

    a1 = th
    a2 = th + p2
    c1, s1 = jnp.cos(a1), jnp.sin(a1)
    c2, s2 = jnp.cos(a2), jnp.sin(a2)

    # rotated fixed vectors (link frames: torso com +1x̂, attach +0.5x̂;
    # mid com −0.5x̂, attach −1x̂; back com −0.5x̂)
    r1c = (c1 * 1.0, s1 * 1.0)          # R1·(1,0)
    r1d = (c1 * 0.5, s1 * 0.5)          # R1·(0.5,0)
    r2c = (-c2 * 0.5, -s2 * 0.5)        # R2·(−0.5,0)
    r2d = (-c2 * 1.0, -s2 * 1.0)        # R2·(−1,0)

    def perp(v2):
        return (-v2[1], v2[0])

    def add(u, w):
        return (u[0] + w[0], u[1] + w[1])

    # com Jacobian θ/φ columns (x,y columns are identity)
    J1t = perp(r1c)
    J2t = perp(add(r1d, r2c))
    J2p2 = perp(r2c)
    zero = jnp.zeros_like(x)
    # J rows per com: [∂x, ∂y] for each gen coord → store as (2,)-tuples
    # column layout: [x, y, th, p2[, p3]]
    J1 = [(1.0, 0.0), (0.0, 1.0), J1t, (zero, zero), (zero, zero)][:n]
    J2 = [(1.0, 0.0), (0.0, 1.0), J2t, J2p2, (zero, zero)][:n]
    g1 = (0.0, 0.0, 1.0, 0.0, 0.0)[:n]
    g2 = (0.0, 0.0, 1.0, 1.0, 0.0)[:n]

    def to_vec(col):
        cx = col[0] if not isinstance(col[0], float) else jnp.full_like(x, col[0])
        cy = col[1] if not isinstance(col[1], float) else jnp.full_like(x, col[1])
        return cx, cy

    links = [(J1, g1), (J2, g2)]
    if ks.n_links == 3:
        a3 = th + p2 + p3
        c3, s3 = jnp.cos(a3), jnp.sin(a3)
        r3c = (-c3 * 0.5, -s3 * 0.5)    # R3·(−0.5,0)
        J3t = perp(add(add(r1d, r2d), r3c))
        J3p2 = perp(add(r2d, r3c))
        J3p3 = perp(r3c)
        J3 = [(1.0, 0.0), (0.0, 1.0), J3t, J3p2, J3p3]
        g3 = (0.0, 0.0, 1.0, 1.0, 1.0)
        links.append((J3, g3))

    # mass matrix M[i][j] = Σ_k m (J_k[i]·J_k[j]) + Iz g_k[i] g_k[j]
    M = [[jnp.zeros_like(x) for _ in range(n)] for _ in range(n)]
    for J, g in links:
        cols = [to_vec(J[i]) for i in range(n)]
        for i in range(n):
            for j in range(i, n):
                term = m * (cols[i][0] * cols[j][0] + cols[i][1] * cols[j][1])
                if g[i] and g[j]:
                    term = term + Iz * (g[i] * g[j])
                M[i][j] = M[i][j] + term
    for i in range(n):
        M[i][i] = M[i][i] + (ks.armature)
        for j in range(i):
            M[i][j] = M[j][i]

    # velocity-product com accelerations
    w1 = vth
    w2 = vth + vp2

    def scl(s, v2):
        return (s * v2[0], s * v2[1])

    accs = [
        scl(-w1 * w1, r1c),
        add(scl(-w1 * w1, r1d), scl(-w2 * w2, r2c)),
    ]
    omegas = [w1, w2]
    if ks.n_links == 3:
        w3 = vth + vp2 + vp3
        accs.append(
            add(add(scl(-w1 * w1, r1d), scl(-w2 * w2, r2d)), scl(-w3 * w3, r3c))
        )
        omegas.append(w3)

    # bias_j = Σ_k m J_k[j] · acc_k   (gravity ⊥ plane → no term)
    bias = [jnp.zeros_like(x) for _ in range(n)]
    for (J, g), acc in zip(links, accs):
        for j in range(n):
            cj = to_vec(J[j])
            bias[j] = bias[j] + m * (cj[0] * acc[0] + cj[1] * acc[1])

    # fluid drag per link (MuJoCo inertia-box model; physics/engine.py
    # fluid_force specialization — z-components vanish in the plane)
    tau = [jnp.zeros_like(x) for _ in range(n)]
    Lx, Ly, Lz = ((b) for b in ks.box)
    diam = (np.mean(ks.box))
    visc = (ks.viscosity)
    rho = (ks.density)
    pi = (np.pi)
    angles = [(c1, s1), (c2, s2)]
    if ks.n_links == 3:
        angles.append((c3, s3))
    vel_list = (vx, vy, vth, vp2, vp3)[:n]
    for (J, g), (ck, sk), wk in zip(links, angles, omegas):
        cols = [to_vec(J[i]) for i in range(n)]
        # com world velocity
        vwx = sum(cols[i][0] * vv for i, vv in zip(range(n), vel_list))
        vwy = sum(cols[i][1] * vv for i, vv in zip(range(n), vel_list))
        # body frame (rotate by −a)
        vbx = ck * vwx + sk * vwy
        vby = -sk * vwx + ck * vwy
        fbx = -3.0 * pi * diam * visc * vbx
        fby = -3.0 * pi * diam * visc * vby
        tz = -pi * diam**3 * visc * wk
        if ks.density > 0:
            fbx = fbx - 0.5 * rho * Ly * Lz * jnp.abs(vbx) * vbx
            fby = fby - 0.5 * rho * Lz * Lx * jnp.abs(vby) * vby
            tz = tz - rho * Lz * (Lx**4 + Ly**4) / 64.0 * jnp.abs(wk) * wk
        # back to world
        fwx = ck * fbx - sk * fby
        fwy = sk * fbx + ck * fby
        for j in range(n):
            tau[j] = tau[j] + cols[j][0] * fwx + cols[j][1] * fwy
            if g[j]:
                tau[j] = tau[j] + (g[j]) * tz

    # actuators (gear on p2[, p3])
    tau[3] = tau[3] + (ks.gear) * jnp.clip(ctrl[0], -1.0, 1.0)
    if ks.n_act > 1:
        tau[4] = tau[4] + (ks.gear) * jnp.clip(ctrl[1], -1.0, 1.0)

    rhs0 = [tau[i] - bias[i] for i in range(n)]
    qacc0, L = _chol5_solve(M, rhs0)

    # joint limits (impedance on unconstrained acceleration; engine parity)
    tc = (max(0.02, 2.0 * ks.timestep))
    d0, dmax, width = (0.9), (0.95), (0.001)
    b_imp = (2.0) / (dmax * tc)
    # Minv diag via solving unit vectors — reuse L: diag(M⁻¹)_i = ||L⁻¹ e_i||²
    # cheap closed-form for the two limited dofs
    f_lim = [jnp.zeros_like(x) for _ in range(n)]
    limited = [3] if ks.n_act == 1 else [3, 4]
    if limited:
        # diag(M⁻¹)_dd = ||L⁻¹ e_d||², reusing L from the qacc0 solve (the
        # forward substitution starts at row d — rows above are zero)
        for dof in limited:
            y = [None] * n
            y[dof] = 1.0 / L[dof][dof]
            for i in range(dof + 1, n):
                s = None
                for k in range(dof, i):
                    t = L[i][k] * y[k]
                    s = t if s is None else s + t
                y[i] = -s / L[i][i]
            minv_dd = sum(yi * yi for yi in y if yi is not None)
            qv_d = (vp2, vp3)[dof - 3]
            qq_d = (p2, p3)[dof - 3]
            a0 = qacc0[dof]
            m_eff = 1.0 / jnp.maximum(minv_dd, 1e-12)
            for sign, viol in (
                (1.0, jnp.maximum(qq_d - (ks.limit_hi), 0.0)),
                (-1.0, jnp.maximum((ks.limit_lo) - qq_d, 0.0)),
            ):
                active = viol > 0
                d = d0 + (dmax - d0) * jnp.clip(viol / width, 0.0, 1.0)
                k_imp = d / (dmax * dmax * tc * tc)
                aref = -b_imp * (sign * qv_d) - k_imp * viol
                f_out = m_eff * d * (aref - sign * a0)
                f_out = jnp.minimum(f_out, 0.0)
                f_lim[dof] = f_lim[dof] + jnp.where(active, sign * f_out, 0.0)

    rhs = [tau[i] + f_lim[i] - bias[i] for i in range(n)]
    qacc, _ = _chol5_solve(M, rhs)
    return tuple(qacc)


def rk4_step_swimmer(ks: SwimmerKernelSpec, q, v, ctrl):
    """One RK4 step of size ks.timestep (mj tableau, engine parity)."""
    h = (ks.timestep)

    def acc(q_, v_):
        return forward_swimmer(ks, q_, v_, ctrl)

    def axpy(a, xs, ys):
        return tuple(x + a * y_ for x, y_ in zip(xs, ys))

    a1 = acc(q, v)
    q2 = axpy(h / 2, q, v)
    v2 = axpy(h / 2, v, a1)
    a2 = acc(q2, v2)
    q3 = axpy(h / 2, q, v2)
    v3 = axpy(h / 2, v, a2)
    a3 = acc(q3, v3)
    q4 = axpy(h, q, v3)
    v4 = axpy(h, v, a3)
    a4 = acc(q4, v4)
    v_avg = tuple((vv + 2 * v2_ + 2 * v3_ + v4_) / 6.0
                  for vv, v2_, v3_, v4_ in zip(v, v2, v3, v4))
    a_avg = tuple((aa + 2 * a2_ + 2 * a3_ + a4_) / 6.0
                  for aa, a2_, a3_, a4_ in zip(a1, a2, a3, a4))
    q_out = axpy(h, q, v_avg)
    v_out = axpy(h, v, a_avg)
    return q_out, v_out
