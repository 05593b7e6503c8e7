"""Small-SPD linear algebra, unrolled for TPU.

``jnp.linalg.inv``/LU lower to pivoted loops that are catastrophically slow
for small batched systems on TPU (measured ~30ms per forward pass for the
ant's 14x14).  The mass matrix is SPD with a static size, so an unrolled
Cholesky — a fixed O(n³) graph of elementwise ops that fuses and vectorizes
under ``vmap`` — is the right lowering.
"""

from __future__ import annotations

import jax.numpy as jnp


def cholesky_unrolled(M: jnp.ndarray) -> jnp.ndarray:
    """Lower Cholesky factor of a static-size SPD matrix (unrolled)."""
    n = M.shape[-1]
    # column-by-column, building rows of L as stacked vectors
    cols = []
    for j in range(n):
        # L[j, j] and column j below the diagonal
        s = M[..., j:, j]
        for k in range(j):
            s = s - cols[k][..., j:] * cols[k][..., j][..., None]
        d = jnp.sqrt(jnp.maximum(s[..., 0], 1e-12))
        col = jnp.concatenate(
            [jnp.zeros(M.shape[:-2] + (j,), M.dtype), s / d[..., None]],
            axis=-1,
        )
        cols.append(col)
    return jnp.stack(cols, axis=-1)  # (..., n, n) lower triangular


def cho_solve_unrolled(L: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve A x = b given A = L Lᵀ; b may be (..., n) or (..., n, m)."""
    n = L.shape[-1]
    vec = b.ndim == L.ndim - 1
    if vec:
        b = b[..., None]
    # forward substitution L y = b
    ys = []
    for i in range(n):
        acc = b[..., i, :]
        for k in range(i):
            acc = acc - L[..., i, k][..., None] * ys[k]
        ys.append(acc / L[..., i, i][..., None])
    # back substitution Lᵀ x = y
    xs = [None] * n
    for i in reversed(range(n)):
        acc = ys[i]
        for k in range(i + 1, n):
            acc = acc - L[..., k, i][..., None] * xs[k]
        xs[i] = acc / L[..., i, i][..., None]
    x = jnp.stack(xs, axis=-2)
    return x[..., 0] if vec else x


def spd_inverse(M: jnp.ndarray) -> jnp.ndarray:
    """Inverse of a static-size SPD matrix via unrolled Cholesky."""
    L = cholesky_unrolled(M)
    eye = jnp.broadcast_to(jnp.eye(M.shape[-1], dtype=M.dtype), M.shape)
    return cho_solve_unrolled(L, eye)
