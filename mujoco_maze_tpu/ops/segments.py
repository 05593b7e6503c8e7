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


def penetration_push(
    walls: Walls, p: jnp.ndarray, margin: float
) -> jnp.ndarray:
    """Summed outward push direction for a point within ``margin`` of walls.

    Returns ``(2,)``: Σ over walls of ``max(0, margin - dist) * n̂`` where
    ``dist`` is point-to-*segment* distance and ``n̂`` points from the wall
    toward the point.  Models the contact ejection MuJoCo applies when the
    robot's geom (radius > collision-detector inflation) overlaps a wall box
    — observed in reference rollouts as large transient qvel.
    """
    v1 = walls.p2 - walls.p1                                   # (W, 2)
    nrm2 = jnp.sum(v1 * v1, axis=-1)
    safe_n = jnp.where(nrm2 == 0.0, 1.0, nrm2)
    t = jnp.sum((p[None, :] - walls.p1) * v1, axis=-1) / safe_n
    t = jnp.clip(t, 0.0, 1.0)
    closest = walls.p1 + t[:, None] * v1                       # (W, 2)
    d = p[None, :] - closest
    dist = jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-12)
    pen = jnp.maximum(margin - dist, 0.0) * walls.mask
    n = d / dist[:, None]
    return jnp.sum(pen[:, None] * n, axis=0)


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
