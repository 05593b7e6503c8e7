"""Quaternion / rotation / spatial-vector helpers (pure JAX, batched-safe).

Conventions: quaternions are (w, x, y, z) like MuJoCo; spatial motion
vectors are ``[ω; v]`` expressed at the world origin (Featherstone world
frame); spatial force vectors are ``[m; f]``.
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    w1, x1, y1, z1 = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    w2, x2, y2, z2 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_inv(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], q.dtype)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector v by quaternion q."""
    qv = q[..., 1:]
    w = q[..., 0:1]
    t = 2.0 * jnp.cross(qv, v)
    return v + w * t + jnp.cross(qv, t)


def quat_to_mat(q: jnp.ndarray) -> jnp.ndarray:
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )


def axis_angle_quat(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    half = angle * 0.5
    return jnp.concatenate(
        [jnp.cos(half)[..., None], axis * jnp.sin(half)[..., None]], axis=-1
    )


def quat_integrate(q: jnp.ndarray, omega: jnp.ndarray, dt) -> jnp.ndarray:
    """Exact exponential-map integration of a world-frame angular velocity
    (parity with mju_quatIntegrate semantics used by mj_integratePos)."""
    angle = jnp.sqrt(jnp.sum(omega * omega) + 1e-18)
    axis = omega / angle
    dq = axis_angle_quat(axis, angle * dt)
    out = quat_mul(dq, q)
    return out / jnp.sqrt(jnp.sum(out * out))


def skew(v: jnp.ndarray) -> jnp.ndarray:
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], -1),
            jnp.stack([z, zero, -x], -1),
            jnp.stack([-y, x, zero], -1),
        ],
        axis=-2,
    )


# -- spatial algebra ([ω; v] motion, [m; f] force, at world origin) --------

def motion_cross(v: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """v ×ₘ m for motion vectors (Featherstone crm)."""
    w, vl = v[..., :3], v[..., 3:]
    mw, ml = m[..., :3], m[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, mw), jnp.cross(w, ml) + jnp.cross(vl, mw)], axis=-1
    )


def force_cross(v: jnp.ndarray, f: jnp.ndarray) -> jnp.ndarray:
    """v ×* f for force vectors (Featherstone crf)."""
    w, vl = v[..., :3], v[..., 3:]
    fm, fl = f[..., :3], f[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, fm) + jnp.cross(vl, fl), jnp.cross(w, fl)], axis=-1
    )


def spatial_inertia_mul(I10: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """I @ m for a spatial inertia packed as (Io 3x3, h 3, mass) tuple-free
    10-array layout: [Io flat 9, ...]. We store full 6x6 instead for clarity.
    """
    raise NotImplementedError


def make_spatial_inertia(mass, com, inertia_c) -> jnp.ndarray:
    """Dense 6x6 spatial inertia at world origin.

    ``com``: world CoM position; ``inertia_c``: 3x3 rotational inertia about
    the CoM in world axes.  KE = ½ sᵀ I s for s = [ω; v] at origin.
    """
    cx = skew(com)
    Io = inertia_c + mass * (cx @ cx.swapaxes(-1, -2))
    top = jnp.concatenate([Io, mass * cx], axis=-1)
    bot = jnp.concatenate([mass * cx.swapaxes(-1, -2), mass * jnp.eye(3, dtype=Io.dtype)], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)
