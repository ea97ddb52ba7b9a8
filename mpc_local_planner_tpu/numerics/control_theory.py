"""Control-theory solvers: Riccati, Lyapunov, Sylvester, ctrb/obsv.

Parity: cbr:numerics/{algebraic_riccati_discrete, algebraic_riccati_continuous,
lyapunov_discrete, lyapunov_continuous, sylvester, controllability,
observability}.h — used by the reference's LqrController and terminal-cost
design (SURVEY.md §3.2; not on the planner hot path).

TPU-first: the reference solves these with Schur decompositions (Eigen),
which do not lower to TPU. Here every solver is a fixed-iteration,
jit/vmap/batch-safe algorithm:
  - DARE: structure-preserving doubling (SDA) — quadratic convergence,
    ~30 iterations to machine precision.
  - CARE: Cayley transform to a DARE, then SDA.
  - discrete Lyapunov: Smith doubling (A ← A², Q ← Q + AQAᵀ).
  - continuous Lyapunov / Sylvester: Kronecker linear solve (state dims here
    are tiny, n ≤ ~10, so the n²×n² solve is trivial).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _doubling_dare(A, B, Q, R, iters: int):
    """Structure-preserving doubling for AᵀXA − X − AᵀXB(R+BᵀXB)⁻¹BᵀXA + Q = 0."""
    n = A.shape[-1]
    I = jnp.eye(n, dtype=A.dtype)
    G0 = B @ jnp.linalg.solve(R, jnp.swapaxes(B, -1, -2))

    def body(carry, _):
        Ak, Gk, Hk = carry
        # SDA recursion with W = I + G H:
        #   A₁ = A W⁻¹ A ;  G₁ = G + A G W⁻ᵀ Aᵀ ;  H₁ = H + Aᵀ H W⁻¹ A
        W = I + Gk @ Hk
        Winv_A = jnp.linalg.solve(W, Ak)
        A1 = Ak @ Winv_A
        G1 = Gk + Ak @ Gk @ jnp.linalg.solve(
            jnp.swapaxes(W, -1, -2), jnp.swapaxes(Ak, -1, -2)
        )
        H1 = Hk + jnp.swapaxes(Ak, -1, -2) @ Hk @ Winv_A
        return (A1, G1, H1), None

    (Ak, Gk, Hk), _ = jax.lax.scan(body, (A, G0, Q), None, length=iters)
    return Hk


def are_discrete(A, B, Q, R, iters: int = 30):
    """Solve the DARE (parity: AlgebraicRiccatiDiscrete::solve). Returns X."""
    A, B, Q, R = map(jnp.asarray, (A, B, Q, R))
    X = _doubling_dare(A, B, Q, R, iters)
    return 0.5 * (X + jnp.swapaxes(X, -1, -2))


def lqr_gain_discrete(A, B, Q, R, iters: int = 30):
    """K minimizing Σ xᵀQx + uᵀRu for x⁺ = Ax + Bu; u = −Kx.

    Parity: the gain computation in cbr LqrController (discrete case).
    """
    X = are_discrete(A, B, Q, R, iters)
    Bt = jnp.swapaxes(B, -1, -2)
    return jnp.linalg.solve(R + Bt @ X @ B, Bt @ X @ A)


def are_continuous(A, B, Q, R, iters: int = 30):
    """Solve the CARE AᵀX + XA − XBR⁻¹BᵀX + Q = 0.

    Parity: AlgebraicRiccatiContinuous::solve (reference: Schur method).
    Method: matrix sign function of the Hamiltonian — the stable invariant
    subspace of H = [[A, −G], [−Q, −Aᵀ]] is span([I; X]); the sign iteration
    S ← ½(cS + (cS)⁻¹) (determinant-scaled) converges globally in ~20–30
    steps and is jit/vmap-safe, unlike a Schur decomposition.
    """
    A, B, Q, R = map(jnp.asarray, (A, B, Q, R))
    n = A.shape[-1]
    G = B @ jnp.linalg.solve(R, jnp.swapaxes(B, -1, -2))
    At = jnp.swapaxes(A, -1, -2)
    H = jnp.concatenate(
        [
            jnp.concatenate([A, -G], axis=-1),
            jnp.concatenate([-Q, -At], axis=-1),
        ],
        axis=-2,
    )

    def body(S, _):
        # determinant scaling accelerates convergence and stabilizes f32
        d = jnp.abs(jnp.linalg.det(S)) ** (1.0 / (2 * n))
        Sc = S / d[..., None, None]
        Sn = 0.5 * (Sc + jnp.linalg.inv(Sc))
        return Sn, None

    S, _ = jax.lax.scan(body, H, None, length=iters)
    # stable projector P₋ = (I − S)/2; its columns lie in span([I; X])
    P = 0.5 * (jnp.eye(2 * n, dtype=A.dtype) - S)
    P11 = P[..., :n, :n]
    P21 = P[..., n:, :n]
    X = P21 @ jnp.linalg.inv(P11)
    return 0.5 * (X + jnp.swapaxes(X, -1, -2))


def lqr_gain_continuous(A, B, Q, R, iters: int = 40):
    """K for ẋ = Ax + Bu with u = −Kx (parity: LqrController continuous)."""
    X = are_continuous(A, B, Q, R, iters)
    return jnp.linalg.solve(R, jnp.swapaxes(B, -1, -2) @ X)


def lyapunov_discrete(A, Q, iters: int = 25):
    """Solve A X Aᵀ − X + Q = 0 by Smith doubling (parity: LyapunovDiscrete)."""
    A, Q = jnp.asarray(A), jnp.asarray(Q)

    def body(carry, _):
        Ak, Xk = carry
        Xn = Xk + Ak @ Xk @ jnp.swapaxes(Ak, -1, -2)
        return (Ak @ Ak, Xn), None

    (_, X), _ = jax.lax.scan(body, (A, Q), None, length=iters)
    return 0.5 * (X + jnp.swapaxes(X, -1, -2))


def _kron_solve(Alhs, rhs_vec, n):
    return jnp.linalg.solve(Alhs, rhs_vec).reshape(rhs_vec.shape[:-1] + (n, n))


def lyapunov_continuous(A, Q):
    """Solve A X + X Aᵀ + Q = 0 via the Kronecker linear system.

    Parity: LyapunovContinuous (reference: Bartels–Stewart). Exact and
    batched; O(n⁶) but n ≤ ~10 in every use here.
    """
    A, Q = jnp.asarray(A), jnp.asarray(Q)
    n = A.shape[-1]
    I = jnp.eye(n, dtype=A.dtype)
    L = jnp.kron(I, A) + jnp.kron(A, I)  # acts on vec(X) with row-major vec
    # note: with row-major reshape, vec(AX + XAᵀ) = (I⊗A + A⊗I) vec(X)
    rhs = -Q.reshape(Q.shape[:-2] + (n * n,))
    return _kron_solve(L, rhs, n)


def sylvester_continuous(A, B, C):
    """Solve A X + X B + C = 0 (parity: cbr sylvester.h)."""
    A, B, C = map(jnp.asarray, (A, B, C))
    n, m = A.shape[-1], B.shape[-1]
    Im = jnp.eye(m, dtype=A.dtype)
    In = jnp.eye(n, dtype=A.dtype)
    # row-major vec: vec(AX) = (A ⊗ I_m) vec(X); vec(XB) = (I_n ⊗ Bᵀ) vec(X)
    L = jnp.kron(A, Im) + jnp.kron(In, jnp.swapaxes(B, -1, -2))
    rhs = -C.reshape(C.shape[:-2] + (n * m,))
    X = jnp.linalg.solve(L, rhs)
    return X.reshape(C.shape[:-2] + (n, m))


def controllability_matrix(A, B):
    """[B, AB, ..., A^{n−1}B] (parity: cbr controllability.h)."""
    A, B = jnp.asarray(A), jnp.asarray(B)
    n = A.shape[-1]
    blocks = [B]
    for _ in range(n - 1):
        blocks.append(A @ blocks[-1])
    return jnp.concatenate(blocks, axis=-1)


def is_controllable(A, B, tol: float = 1e-9):
    C = controllability_matrix(A, B)
    s = jnp.linalg.svd(C, compute_uv=False)
    return jnp.sum(s > tol * s[..., :1], axis=-1) == A.shape[-1]


def observability_matrix(A, C):
    """[C; CA; ...; CA^{n−1}] (parity: cbr observability.h)."""
    A, C = jnp.asarray(A), jnp.asarray(C)
    n = A.shape[-1]
    blocks = [C]
    for _ in range(n - 1):
        blocks.append(blocks[-1] @ A)
    return jnp.concatenate(blocks, axis=-2)


def is_observable(A, C, tol: float = 1e-9):
    O = observability_matrix(A, C)
    s = jnp.linalg.svd(O, compute_uv=False)
    return jnp.sum(s > tol * s[..., :1], axis=-1) == A.shape[-1]
