"""Batched 2-D segment-collision ops (pure JAX, vmap/jit friendly).

This is the TPU-native form of the reference's manual collision stack
(`/root/reference/mujoco_maze/maze_env_utils.py:84-206` +
`maze_env.py:448-473`): wall faces are a fixed-size ``(W, 2, 2)`` array with a
validity mask, and collision detection/resolution is a handful of fused
elementwise ops + one argmin over the wall axis — no data-dependent control
flow, so the whole thing vectorizes over thousands of envs and compiles into
the lockstep step kernel.

All functions operate on a single env; wrap in ``jax.vmap`` for batches.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp

# Movement shorter than this is treated as "did not move" (parity:
# maze_env_utils.py:189 `move.norm <= 1e-8`).
MIN_MOVE = 1e-8


class Walls(NamedTuple):
    """Static (per-spec) padded wall-segment soup.

    p1, p2: (W, 2) endpoints; mask: (W,) validity of each slot.
    Padded slots are degenerate zero segments with ``mask=False``.
    """

    p1: jnp.ndarray
    p2: jnp.ndarray
    mask: jnp.ndarray


def _cross2(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]


class CollisionResult(NamedTuple):
    hit: jnp.ndarray        # () bool — any wall crossed
    point: jnp.ndarray      # (2,) nearest intersection (valid iff hit)
    reflection: jnp.ndarray  # (2,) new endpoint mirrored across that wall


def detect(walls: Walls, old: jnp.ndarray, new: jnp.ndarray) -> CollisionResult:
    """Nearest wall crossing of the movement segment old→new.

    Vectorized port of ``CollisionDetector.detect`` (maze_env_utils.py:186-206):
    double orientation test per wall, cross-point via the cross-ratio, nearest
    hit by argmin of distance from ``old``.
    """
    d = new - old                                   # (2,)
    moved = jnp.sum(d * d) > MIN_MOVE * MIN_MOVE

    v1 = walls.p2 - walls.p1                        # (W, 2) wall direction
    # wall._intersect(move): movement endpoints straddle wall carrier line
    s1 = _cross2(v1, old - walls.p1) * _cross2(v1, new - walls.p1) <= 0.0
    # move._intersect(wall): wall endpoints straddle movement carrier line
    s2 = _cross2(d, walls.p1 - old) * _cross2(d, walls.p2 - old) <= 0.0
    hit = s1 & s2 & walls.mask & moved              # (W,)

    # Cross point (wall is `self`, move is `other` — maze_env_utils.py:119-123):
    # point = old + (cross(v1, wall.p2 - old) / cross(v1, d)) * d
    a = _cross2(v1, d)                              # (W,)
    b = _cross2(v1, walls.p2 - old)                 # (W,)
    safe_a = jnp.where(a == 0.0, 1.0, a)            # guard parallel overlap
    t = b / safe_a
    point = old[None, :] + t[:, None] * d[None, :]  # (W, 2)
    hit = hit & (a != 0.0)

    # Reflection of `new` across the wall carrier line (maze_env_utils.py:101-108).
    nrm2 = jnp.sum(v1 * v1, axis=-1)
    safe_n = jnp.where(nrm2 == 0.0, 1.0, nrm2)
    scale = jnp.sum((new[None, :] - walls.p1) * v1, axis=-1) / safe_n
    proj = walls.p1 + scale[:, None] * v1           # (W, 2)
    refl = 2.0 * proj - new[None, :]                # (W, 2)

    dist2 = jnp.sum((point - old[None, :]) ** 2, axis=-1)
    dist2 = jnp.where(hit, dist2, jnp.inf)
    idx = jnp.argmin(dist2)                         # first minimum == reference tie-break
    any_hit = jnp.any(hit)
    return CollisionResult(hit=any_hit, point=point[idx], reflection=refl[idx])


def resolve(
    walls: Walls,
    old: jnp.ndarray,
    new: jnp.ndarray,
    restitution: float,
) -> jnp.ndarray:
    """Manual collision resolution with restitution + give-up fallback.

    Parity: `maze_env.py:457-464` — if old→new crosses a wall, slide to
    ``point + restitution * (reflection - point)``; if that position *also*
    crosses a wall from ``old``, give up and stay at ``old``.
    Branch-free: both detections always run (lockstep batch semantics).
    """
    c1 = detect(walls, old, new)
    bounced = c1.point + restitution * (c1.reflection - c1.point)
    c2 = detect(walls, old, bounced)
    corrected = jnp.where(c2.hit, old, bounced)
    return jnp.where(c1.hit, corrected, new)


def impedance_eject(
    walls: Walls,
    p: jnp.ndarray,
    v: jnp.ndarray,
    margin: float,
    lam: float,
    dt: float,
    mu: float,
    old: jnp.ndarray = None,
) -> jnp.ndarray:
    """One-step contact-impedance velocity response at a wall overlap.

    Derived (not calibrated) model of what ``mj_step`` does when the robot
    sphere overlaps a wall box by ``pen``: MuJoCo's Baumgarte reference
    ``aref = -b*vn - k*r`` with solref time-constant clamped to
    ``max(tc, 2*dt)`` is a critically damped oscillator with rate
    ``lam = 1/tc_eff``; its exact one-step map from ``(r0=-pen, vn)`` is

        vn' = exp(-lam*dt) * (vn - lam*(vn - lam*pen)*dt)

    clamped to ``vn' >= vn`` (the contact can only push).  Probed against
    MuJoCo 3 on the composed PointUMaze world: ejection from rest measures
    7.59*pen vs the formula's 7.58*pen, and the velocity-dependent cases
    match to ~3% (tools note in models/point.py).  Tangential slip decays
    Coulomb-style: ``|dvt| <= mu * dvn`` (elliptic-cone residual ~15% is
    accepted).  Returns the summed ``(2,)`` velocity delta over walls.

    ``old`` (the pre-move position, always outside walls) orients the
    signed distance so that a kinematic step that *crosses* a wall face
    still reads deep positive penetration with an outward normal — the
    regime where mj_step responds with multi-m/s ejections (its solver
    forces reach 1e5; the normal-direction response still follows the
    impedance map to ~15%, deep-contact friction torque is not modeled).
    """
    v1 = walls.p2 - walls.p1                                   # (W, 2)
    nrm2 = jnp.sum(v1 * v1, axis=-1)
    safe_n = jnp.where(nrm2 == 0.0, 1.0, nrm2)
    t = jnp.sum((p[None, :] - walls.p1) * v1, axis=-1) / safe_n
    t = jnp.clip(t, 0.0, 1.0)
    closest = walls.p1 + t[:, None] * v1                       # (W, 2)
    d = p[None, :] - closest
    dist = jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-12)
    if old is not None:
        side = jnp.sign(jnp.sum((old[None, :] - closest) * d, axis=-1))
        side = jnp.where(side == 0.0, 1.0, side)
        dist = dist * side                                     # signed
    pen = jnp.maximum(margin - dist, 0.0) * walls.mask         # (W,)
    active = pen > 0.0
    n = d / jnp.abs(dist[:, None])                             # outward n̂
    if old is not None:
        n = n * side[:, None]
    vn = jnp.sum(v[None, :] * n, axis=-1)                      # (W,)
    decay = math.exp(-lam * dt)
    vn2 = decay * (vn - lam * (vn - lam * pen) * dt)
    dvn = jnp.where(active, jnp.maximum(vn2 - vn, 0.0), 0.0)
    tng = jnp.stack([-n[:, 1], n[:, 0]], axis=-1)              # (W, 2)
    vt = jnp.sum(v[None, :] * tng, axis=-1)
    dvt = -jnp.sign(vt) * jnp.minimum(jnp.abs(vt), mu * dvn)
    dvt = jnp.where(active, dvt, 0.0)
    return jnp.sum(dvn[:, None] * n + dvt[:, None] * tng, axis=0)


def tip_impedance_eject(
    walls: Walls,
    center: jnp.ndarray,
    tip: jnp.ndarray,
    v3: jnp.ndarray,
    theta: jnp.ndarray,
    inflate: float,
    lam: float,
    dt: float,
    m: float,
    a: float,
    i_prime: float,
    old: jnp.ndarray = None,
) -> jnp.ndarray:
    """Exact 3-dof impedance response for a single off-center contact point.

    Models the arrow-box tip of the point robot hitting a wall (the contact
    MuJoCo resolves with large slide *and hinge* velocity jumps — the box
    reaches 1.1 past the body origin vs the 0.4 manual-collision radius).

    Wall segments are the RADIUS-inflated faces, so the physical wall face
    lies ``inflate`` beyond the segment (toward the wall); the tip point
    penetrates the physical wall by ``pen = -(s_d + inflate)`` where ``s_d``
    is the tip's signed segment distance, sign taken from the robot-center
    side (the center always stays outside via manual collision).

    The dof response uses the exact body mass matrix of the point model
    (derived from point.xml geom densities, probed equal to MuJoCo qM):

        M = [[m, 0, -a sinθ], [0, m, a cosθ], [-a sinθ, a cosθ, I]]

    with ``a = m_box*0.6`` and ``I' = I - a²/m`` the COM spin inertia; the
    closed-form M⁻¹ gives per-contact  A = 1/m + g²/I',
    ``g = rxn - (a/m)(u·n̂)``, ``u = (-sinθ, cosθ)``, and
    Δqvel = f · (n̂/m - u·(a/(m I'))·g,  g/I') with ``f = Δvn / A`` from the
    same critically damped one-step map as :func:`impedance_eject`.
    Returns the summed ``(3,)`` qvel delta over walls (normal-only; the
    multi-point face contact and its friction are approximated by the two
    leading tip corners — documented residual).
    """
    if old is None:
        old = center
    v1 = walls.p2 - walls.p1
    nrm2 = jnp.sum(v1 * v1, axis=-1)
    safe_n = jnp.where(nrm2 == 0.0, 1.0, nrm2)
    tt = jnp.sum((tip[None, :] - walls.p1) * v1, axis=-1) / safe_n
    tt = jnp.clip(tt, 0.0, 1.0)
    closest = walls.p1 + tt[:, None] * v1                      # (W, 2)
    # outward normal: from the wall toward the pre-move position's side
    # (the center itself can be past the face on a crossing step)
    dc = old[None, :] - closest
    dcn = jnp.sqrt(jnp.sum(dc * dc, axis=-1) + 1e-12)
    n = dc / dcn[:, None]                                      # (W, 2)
    s_d = jnp.sum((tip[None, :] - closest) * n, axis=-1)       # signed
    pen = jnp.maximum(-(s_d + inflate), 0.0)
    pen = jnp.where(walls.mask, pen, 0.0)
    active = pen > 0.0
    r_rel = tip - center                                       # (2,)
    rxn = r_rel[0] * n[:, 1] - r_rel[1] * n[:, 0]              # (W,)
    u = jnp.stack([-jnp.sin(theta), jnp.cos(theta)])           # (2,)
    un = n[:, 0] * u[0] + n[:, 1] * u[1]                       # (W,)
    g = rxn - (a / m) * un
    A = 1.0 / m + (g * g) / i_prime
    vn = n[:, 0] * v3[0] + n[:, 1] * v3[1] + rxn * v3[2]
    decay = math.exp(-lam * dt)
    vn2 = decay * (vn - lam * (vn - lam * pen) * dt)
    dvn = jnp.where(active, jnp.maximum(vn2 - vn, 0.0), 0.0)
    f = dvn / A
    coef = a / (m * i_prime)
    dvx = f * (n[:, 0] / m - u[0] * coef * g)
    dvy = f * (n[:, 1] / m - u[1] * coef * g)
    dvr = f * g / i_prime
    return jnp.stack([jnp.sum(dvx), jnp.sum(dvy), jnp.sum(dvr)])


def pad_walls(segments, max_walls: int) -> Walls:
    """Pad an ``(n, 2, 2)`` numpy segment soup to a fixed-size ``Walls``."""
    import numpy as np

    n = len(segments)
    if n > max_walls:
        raise ValueError(f"{n} wall segments exceed capacity {max_walls}")
    p1 = np.zeros((max_walls, 2), dtype=np.float64)
    p2 = np.zeros((max_walls, 2), dtype=np.float64)
    mask = np.zeros((max_walls,), dtype=bool)
    if n:
        p1[:n] = segments[:, 0]
        p2[:n] = segments[:, 1]
        mask[:n] = True
    return Walls(p1=jnp.asarray(p1), p2=jnp.asarray(p2), mask=jnp.asarray(mask))
