"""Closed-form batched small-matrix inverses and solves.

jnp.linalg.solve lowers to batched LU with pivoting — a serialized,
custom-call-heavy path that is both slow and (through the axon bridge)
numerically fragile on TPU for tiny matrices. The KKT blocks here are 2×2
(Quu), 3×3 (collocation ∂c/∂x_{k+1}), and small SPD matrices (Quu up to
nu=2; value blocks na=6): adjugate/cofactor formulas are exact, branch-free,
fully vectorized over arbitrary leading batch dims, and fuse into the
surrounding elementwise code.
"""

from __future__ import annotations

import jax.numpy as jnp


def det2(A):
    return A[..., 0, 0] * A[..., 1, 1] - A[..., 0, 1] * A[..., 1, 0]


def inv2(A, eps: float = 0.0):
    """Inverse of (..., 2, 2); eps regularizes the determinant."""
    d = det2(A)
    d = jnp.where(jnp.abs(d) > eps, d, jnp.where(d >= 0, d + eps, d - eps)) if eps else d
    inv_d = 1.0 / d
    out = jnp.stack(
        [
            jnp.stack([A[..., 1, 1], -A[..., 0, 1]], axis=-1),
            jnp.stack([-A[..., 1, 0], A[..., 0, 0]], axis=-1),
        ],
        axis=-2,
    )
    return out * inv_d[..., None, None]


def solve2(A, b):
    """Solve (..., 2, 2) @ x = b for b (..., 2) or (..., 2, k)."""
    if b.shape[-1] == 2 and b.ndim == A.ndim - 1:
        return jnp.einsum("...ij,...j->...i", inv2(A), b)
    return inv2(A) @ b


def _cof3(A, i0, i1, j0, j1):
    return A[..., i0, j0] * A[..., i1, j1] - A[..., i0, j1] * A[..., i1, j0]


def det3(A):
    return (
        A[..., 0, 0] * _cof3(A, 1, 2, 1, 2)
        - A[..., 0, 1] * _cof3(A, 1, 2, 0, 2)
        + A[..., 0, 2] * _cof3(A, 1, 2, 0, 1)
    )


def inv3(A):
    """Inverse of (..., 3, 3) via the adjugate."""
    inv_d = 1.0 / det3(A)
    c00 = _cof3(A, 1, 2, 1, 2)
    c01 = -_cof3(A, 1, 2, 0, 2)
    c02 = _cof3(A, 1, 2, 0, 1)
    c10 = -_cof3(A, 0, 2, 1, 2)
    c11 = _cof3(A, 0, 2, 0, 2)
    c12 = -_cof3(A, 0, 2, 0, 1)
    c20 = _cof3(A, 0, 1, 1, 2)
    c21 = -_cof3(A, 0, 1, 0, 2)
    c22 = _cof3(A, 0, 1, 0, 1)
    adjT = jnp.stack(
        [
            jnp.stack([c00, c10, c20], axis=-1),
            jnp.stack([c01, c11, c21], axis=-1),
            jnp.stack([c02, c12, c22], axis=-1),
        ],
        axis=-2,
    )
    return adjT * inv_d[..., None, None]


def solve3(A, b):
    """Solve (..., 3, 3) @ x = b for b (..., 3) or (..., 3, k)."""
    if b.shape[-1] == 3 and b.ndim == A.ndim - 1:
        return jnp.einsum("...ij,...j->...i", inv3(A), b)
    return inv3(A) @ b


def solve_unrolled(A, B):
    """Batched solve A X = B for small n via unrolled pivotless Gaussian
    elimination (pure elementwise ops — no LAPACK-style custom calls, which
    are catastrophically slow on TPU for tiny matrices).

    A: (..., n, n); B: (..., n, m). Intended for well-conditioned systems
    with dominant diagonals (e.g. M = I + PSD·PSD products in the
    horizon-parallel Riccati compositions); no pivoting is performed.
    """
    n = A.shape[-1]
    a = [[A[..., i, j] for j in range(n)] for i in range(n)]
    m = B.shape[-1]
    b = [[B[..., i, j] for j in range(m)] for i in range(n)]
    for k in range(n):
        inv_piv = 1.0 / a[k][k]
        for i in range(k + 1, n):
            f = a[i][k] * inv_piv
            for j in range(k + 1, n):
                a[i][j] = a[i][j] - f * a[k][j]
            for j in range(m):
                b[i][j] = b[i][j] - f * b[k][j]
    x = [[None] * m for _ in range(n)]
    for i in range(n - 1, -1, -1):
        inv_piv = 1.0 / a[i][i]
        for j in range(m):
            acc = b[i][j]
            for l in range(i + 1, n):
                acc = acc - a[i][l] * x[l][j]
            x[i][j] = acc * inv_piv
    return jnp.stack(
        [jnp.stack([x[i][j] for j in range(m)], axis=-1) for i in range(n)], axis=-2
    )


def solve_psd(A, b):
    """Solve for small SPD A: closed form for n ≤ 3, Cholesky otherwise."""
    n = A.shape[-1]
    if n == 1:
        return b / A[..., 0, 0 if b.ndim == A.ndim - 1 else slice(0, 1)]
    if n == 2:
        return solve2(A, b)
    if n == 3:
        return solve3(A, b)
    L = jnp.linalg.cholesky(A)
    import jax.scipy.linalg as jsl

    y = jsl.solve_triangular(L, b, lower=True)
    return jsl.solve_triangular(jnp.swapaxes(L, -1, -2), y, lower=False)
