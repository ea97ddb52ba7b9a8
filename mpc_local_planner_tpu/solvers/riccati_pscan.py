"""Horizon-parallel Riccati via associative scan (parallel prefix).

The sequential Riccati sweep (solvers/riccati.py) has O(N) dependent steps —
measured to dominate the solve on TPU (every other stage of the SQP is
batch-parallel). This module reformulates both sweeps as associative scans
with O(log N) dependent composition rounds (SURVEY.md §8 step 5:
"associative-scan horizon-parallel variant"; cf. Särkkä & García-Fernández,
temporal parallelization of LQT).

Representation: a horizon segment's conditional value function

    S(x, z) = sup_λ [ λᵀ(z − A x − b) − ½ λᵀ C λ ] + ½ xᵀ J x − ηᵀ x

(x = entry state, z = exit state; singular C encodes reachability
constraints). Segments compose associatively with D = (I + C₁J₂)⁻¹:

    A₁₂ = A₂ D A₁                 C₁₂ = A₂ D C₁ A₂ᵀ + C₂
    b₁₂ = A₂ D (b₁ + C₁ η₂) + b₂  J₁₂ = A₁ᵀ J₂ D A₁ + J₁
    η₁₂ = A₁ᵀ (I + J₂C₁)⁻ᵀ?       — implemented as A₁ᵀ Dᵀ-free form below

One-stage initialization eliminates u by convex duality (Hi = Huu⁻¹):
    A = F − G·Hi·Hzuᵀ,  b = r − G·Hi·hu,  C = G·Hi·Gᵀ,
    J = Hzz − Hzu·Hi·Hzuᵀ,  η = −(hz − Hzu·Hi·hu)
and the terminal cost is the degenerate segment (I, 0, 0, −pN, PN).

The suffix scan yields P_{k+1} = J, p_{k+1} = −η per stage; gains follow
batch-parallel; the closed-loop forward rollout is a second (affine-map)
associative scan. Exactly the same solution as riccati.lqr_solve.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mpc_local_planner_tpu.ops.smallmat import solve_psd
from mpc_local_planner_tpu.solvers.riccati import LqrStep


def _compose(e1, e2):
    """Compose segment e1 (earlier) with e2 (later): e = e1 ⊗ e2.

    Under associative_scan(reverse=True) the operands arrive as
    (later, earlier) pairs per the scan's right-fold orientation — this
    function is wrapped accordingly below.
    """
    from mpc_local_planner_tpu.ops.smallmat import solve_unrolled

    A1, b1, C1, eta1, J1 = e1
    A2, b2, C2, eta2, J2 = e2
    n = A1.shape[-1]
    I = jnp.eye(n, dtype=A1.dtype)
    # D = (I + C1 J2)^{-1}; all products against it via ONE batched
    # multi-RHS unrolled solve (M ≈ I + PSD·PSD is diagonally dominant)
    M = I + C1 @ J2
    rhs = jnp.concatenate(
        [A1, (b1 + (C1 @ eta2[..., None])[..., 0])[..., None], C1], axis=-1
    )
    sol = solve_unrolled(M, rhs)
    DA1 = sol[..., :n]
    Db1 = sol[..., n]
    DC1 = sol[..., n + 1 :]
    A12 = A2 @ DA1
    b12 = (A2 @ Db1[..., None])[..., 0] + b2
    C12 = A2 @ DC1 @ jnp.swapaxes(A2, -1, -2) + C2
    # (I + J2 C1)^{-1} v = D-transpose form: solve Mᵀ y = v
    Mt = jnp.swapaxes(M, -1, -2)
    v = eta2 - (J2 @ b1[..., None])[..., 0]
    y = solve_unrolled(Mt, v[..., None])[..., 0]
    eta12 = (jnp.swapaxes(A1, -1, -2) @ y[..., None])[..., 0] + eta1
    J12 = jnp.swapaxes(A1, -1, -2) @ J2 @ DA1 + J1
    J12 = 0.5 * (J12 + jnp.swapaxes(J12, -1, -2))
    return (A12, b12, C12, eta12, J12)


def lqr_solve_pscan(
    Fz, Gz, rz, Hzz, Hzu, Huu, hz, hu, PN, pN, reg, *, nx: int, free_tau: bool
) -> LqrStep:
    """Drop-in replacement for riccati.lqr_solve (unbatched args; vmap for B).

    Shapes as lqr_solve: Fz (N, na, na), Gz (N, na, nu), ..., PN (na, na).
    """
    N, na = Fz.shape[0], Fz.shape[-1]
    nu = Gz.shape[-1]
    dtype = Fz.dtype
    I_u = jnp.eye(nu, dtype=dtype)

    # ---- stage elements (parallel in N) --------------------------------- #
    Huu_r = Huu + reg * I_u
    Hi_Gt = solve_psd(Huu_r, jnp.swapaxes(Gz, -1, -2))    # Huu⁻¹ Gᵀ (N, nu, na)
    Hi_Hzut = solve_psd(Huu_r, jnp.swapaxes(Hzu, -1, -2))  # Huu⁻¹ Hzuᵀ
    Hi_hu = solve_psd(Huu_r, hu)                           # (N, nu)
    A_e = Fz - Gz @ Hi_Hzut
    b_e = rz - (Gz @ Hi_hu[..., None])[..., 0]
    C_e = Gz @ Hi_Gt
    J_e = Hzz - Hzu @ Hi_Hzut
    eta_e = -(hz - (Hzu @ Hi_hu[..., None])[..., 0])

    # append the terminal element (I, 0, 0, −pN, PN)
    elems = (
        jnp.concatenate([A_e, jnp.eye(na, dtype=dtype)[None]], axis=0),
        jnp.concatenate([b_e, jnp.zeros((1, na), dtype)], axis=0),
        jnp.concatenate([C_e, jnp.zeros((1, na, na), dtype)], axis=0),
        jnp.concatenate([eta_e, -pN[None]], axis=0),
        jnp.concatenate([Hzz * 0.0 + J_e, PN[None]], axis=0),
    )

    # ---- suffix compositions (reverse associative scan) ------------------ #
    # suffix[k] = e_k ⊗ e_{k+1} ⊗ ... ⊗ e_T. NOTE: with reverse=True,
    # associative_scan calls fn(a, b) with a = the LATER block in original
    # sequence order (verified empirically vs the sequential recursion), so
    # the earlier-later composition must swap its operands.
    suffix = jax.lax.associative_scan(
        lambda a, b: _compose(b, a), elems, reverse=True, axis=0
    )
    J_suf, eta_suf = suffix[4], suffix[3]
    # value function AFTER stage k: V_{k+1} = suffix at k+1 (terminal at N)
    P_next = J_suf[1:]          # (N+1→) entries 1..N ; P_next[k] = P_{k+1}
    p_next = -eta_suf[1:]

    # ---- per-stage gains (parallel in N) --------------------------------- #
    PG = P_next @ Gz
    Quu = Huu + jnp.swapaxes(Gz, -1, -2) @ PG + reg * I_u
    Qzu = Hzu + jnp.swapaxes(Fz, -1, -2) @ PG
    Prp = (P_next @ rz[..., None])[..., 0] + p_next
    qu = hu + (jnp.swapaxes(Gz, -1, -2) @ Prp[..., None])[..., 0]
    K = -solve_psd(Quu, jnp.swapaxes(Qzu, -1, -2))        # (N, nu, na)
    kff = -solve_psd(Quu, qu)                              # (N, nu)
    dvs = -0.5 * jnp.sum(qu * kff, axis=-1)

    # ---- initial τ minimization ------------------------------------------ #
    # V_0 = suffix[0]
    P0 = J_suf[0]
    p0 = -eta_suf[0]
    ptau = p0[na - 1]
    Ptau = P0[na - 1, na - 1] + reg
    dtau = jnp.where(
        jnp.asarray(free_tau), -ptau / jnp.maximum(Ptau, jnp.finfo(dtype).tiny), 0.0
    ).astype(dtype)
    dv_tau = jnp.where(jnp.asarray(free_tau), 0.5 * Ptau * dtau * dtau, 0.0)

    # ---- closed-loop forward rollout as an affine prefix scan ------------ #
    Fcl = Fz + Gz @ K
    rcl = rz + (Gz @ kff[..., None])[..., 0]

    def aff_compose(m1, m2):
        # m1 earlier, m2 later: combined z → M2(M1 z + v1) + v2
        M1, v1 = m1
        M2, v2 = m2
        return (M2 @ M1, (M2 @ v1[..., None])[..., 0] + v2)

    Ms, vs = jax.lax.associative_scan(aff_compose, (Fcl, rcl), axis=0)
    z0 = jnp.zeros((na,), dtype).at[na - 1].set(dtau)
    zs_tail = (Ms @ z0[None, :, None])[..., 0] + vs       # z_1..z_N
    zs = jnp.concatenate([z0[None], zs_tail], axis=0)      # (N+1, na)
    us = (K @ zs[:-1][..., None])[..., 0] + kff
    return LqrStep(
        dxs=zs[:, :nx],
        dus=us,
        dtau=dtau,
        dV=jnp.sum(dvs) + dv_tau,
    )
