"""Trace-time constant folding for lane-scalar arithmetic.

The fused kernels express physics as scalar lane vectors; much of that
arithmetic involves values known at TRACE time (constant contact normals,
basis-vector Jacobian entries, model inertias/masses).  Expressed as lane
arrays they cost real VPU instructions — a python 0.0 multiplied into a
lane is a traced mul, and Mosaic does not reliably fold it.  These helpers
fold python-float operands at trace time so constants propagate
structurally through Vec3/Mat3 algebra, the mass-matrix Cholesky, contact
row assembly and the Jacobi solver (round-5 Ant census: 187K → substantially
fewer traced ops).  Folding only removes multiply-by-0/1 and evaluates
float-float arithmetic in python — it reassociates nothing.
"""

from __future__ import annotations

import math

import numpy as np


def is_const(x) -> bool:
    return isinstance(x, (int, float, np.floating))


def cmul(a, b):
    """a * b with python-float 0/1 folding at trace time."""
    if is_const(a):
        if a == 0.0:
            return 0.0
        if a == 1.0:
            return b
        if is_const(b):
            return float(a) * float(b)
    if is_const(b):
        if b == 0.0:
            return 0.0
        if b == 1.0:
            return a
    return a * b


def cadd(a, b):
    if is_const(a):
        if a == 0.0:
            return b
        if is_const(b):
            return float(a) + float(b)
    if is_const(b) and b == 0.0:
        return a
    return a + b


def csub(a, b):
    if is_const(b) and b == 0.0:
        return a
    if is_const(a) and is_const(b):
        return float(a) - float(b)
    if is_const(a) and a == 0.0:
        return -b
    return a - b


def cneg(a):
    if is_const(a):
        return -float(a)
    return -a


def cdiv(a, b):
    """a / b; a constant divisor becomes a reciprocal multiply."""
    if is_const(a) and a == 0.0:
        return 0.0
    if is_const(b):
        if is_const(a):
            return float(a) / float(b)
        return a * (1.0 / float(b))
    return a / b


def csqrt_clamped(s, floor: float):
    """sqrt(max(s, floor)) folding python-float operands."""
    if is_const(s):
        return math.sqrt(max(float(s), floor))
    import jax.numpy as jnp

    return jnp.sqrt(jnp.maximum(s, floor))
