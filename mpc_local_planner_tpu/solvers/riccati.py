"""Batched Riccati (LQR) sweep: the structured KKT solve of the SQP.

This replaces the reference's sparse-KKT factorization (IPOPT + MUMPS LDLᵀ of
the banded collocation NLP; SURVEY.md §4.2 hot spot #3) with the
block-tridiagonal-aware equivalent: a discrete-time Riccati backward sweep +
affine forward rollout, exact for the equality-constrained QP subproblem.

TPU-first design decisions:
  - The shared decision variable dt (min-time problems) is folded into an
    *augmented stage state* z_k = [δx_k, δu_{k-1}, δτ] (δτ_k+1 = δτ_k), which
    keeps the KKT block-tridiagonal instead of bordered — no Schur complement,
    one code path for fixed and variable dt.
  - δu_{k-1} rides along so control-rate (acceleration) penalties stay
    stage-separable (classic rate-penalty state augmentation).
  - Everything is a fixed-shape `lax.scan`; a whole batch of scenarios is
    solved by `vmap` (scenario batch → lanes). Block sizes are tiny
    (na = nx+nu+1 = 6, nu = 2), so per-chip throughput comes from batching,
    not per-problem parallelism. A Pallas lane-batched variant lives in
    ops/ (same interface) for the hot path.

All functions are dtype-polymorphic (f64 under tests, f32 on TPU).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mpc_local_planner_tpu.ops.smallmat import solve_psd


class LqrStep(NamedTuple):
    """Solution of one equality-constrained QP subproblem."""

    dxs: jax.Array    # (N+1, nx) state step
    dus: jax.Array    # (N, nu) control step
    dtau: jax.Array   # () dt step
    dV: jax.Array     # () predicted merit decrease (model reduction, >= 0)


def lqr_solve(
    Fz, Gz, rz, Hzz, Hzu, Huu, hz, hu, PN, pN, reg, *, nx: int, free_tau: bool
) -> LqrStep:
    """Solve min Σ_k [½ zᵀHzz z + zᵀHzu u + ½ uᵀHuu u + hzᵀz + huᵀu] + terminal
    s.t. z_{k+1} = Fz_k z_k + Gz_k u_k + rz_k,  z_0 = [0, 0, δτ] (δτ free iff
    free_tau).

    Shapes: Fz (N, na, na), Gz (N, na, nu), rz (N, na), Hzz (N, na, na),
    Hzu (N, na, nu), Huu (N, nu, nu), hz (N, na), hu (N, nu), PN (na, na),
    pN (na,). reg is a scalar Levenberg regularizer added to Quu (and to the
    δτ minimization).
    """
    na = Fz.shape[-1]
    nu = Gz.shape[-1]
    dtype = Fz.dtype
    N = Fz.shape[0]

    # Fused stage data: W = [F | G] (na, na+nu), H_full = [[Hzz, Hzu],
    # [Hzuᵀ, Huu]], h_full = [hz; hu]. The backward step then needs only
    # TWO matmuls against P (P@W, Wᵀ@(PW)) instead of six — the scan body is
    # op-count-bound on TPU, not FLOP-bound (blocks are tiny).
    W = jnp.concatenate([Fz, Gz], axis=-1)                       # (N, na, na+nu)
    # fold the Levenberg regularizer into Huu BEFORE the concatenation — an
    # .at[].add on the assembled (N, nw, nw) would be a padded scatter on TPU
    Huu_r = Huu + reg * jnp.eye(nu, dtype=dtype)
    Hfull = jnp.concatenate(
        [
            jnp.concatenate([Hzz, Hzu], axis=-1),
            jnp.concatenate([jnp.swapaxes(Hzu, -1, -2), Huu_r], axis=-1),
        ],
        axis=-2,
    )                                                            # (N, nw, nw)
    hfull = jnp.concatenate([hz, hu], axis=-1)                   # (N, nw)

    def backward(carry, inp):
        P, p = carry
        Wk, r, hf, gf = inp
        PW = P @ Wk                                    # (na, nw)
        Q = hf + Wk.T @ PW                             # (nw, nw) full Q matrix
        q = gf + Wk.T @ (P @ r + p)                    # (nw,)
        Quu = Q[na:, na:]
        Qzu_T = Q[na:, :na]                            # (nu, na)
        # one solve for both gain and feedforward: [K | kff]
        Kk = -solve_psd(Quu, jnp.concatenate([Qzu_T, q[na:, None]], axis=-1))
        K, kff = Kk[:, :na], Kk[:, na]
        Pn = Q[:na, :na] + Q[:na, na:] @ K
        Pn = 0.5 * (Pn + Pn.T)
        pn = q[:na] + Q[:na, na:] @ kff
        dv = -0.5 * jnp.dot(q[na:], kff)
        return (Pn, pn), (K, kff, dv)

    (P0, p0), (Ks, kffs, dvs) = jax.lax.scan(
        backward, (PN, pN), (W, rz, Hfull, hfull), reverse=True,
        unroll=8,  # the blocks are tiny — launch overhead dominates a 1-step body
    )

    # initial stage: δx_0 = 0, δu_{-1} = 0; minimize over δτ when free.
    ptau = p0[na - 1]
    Ptau = P0[na - 1, na - 1] + reg
    dtau = jnp.where(
        jnp.asarray(free_tau), -ptau / jnp.maximum(Ptau, jnp.finfo(Fz.dtype).tiny), 0.0
    ).astype(Fz.dtype)
    dv_tau = jnp.where(jnp.asarray(free_tau), 0.5 * Ptau * dtau * dtau, 0.0)

    z0 = jnp.zeros((na,), dtype=Fz.dtype).at[na - 1].set(dtau)

    def forward(z, inp):
        K, kff, F, G, r = inp
        u = K @ z + kff
        zn = F @ z + G @ u + r
        return zn, (z, u)

    zN, (zs, us) = jax.lax.scan(forward, z0, (Ks, kffs, Fz, Gz, rz), unroll=8)
    zs_all = jnp.concatenate([zs, zN[None]], axis=0)  # (N+1, na)
    return LqrStep(
        dxs=zs_all[:, :nx],
        dus=us,
        dtau=dtau,
        dV=jnp.sum(dvs) + dv_tau,
    )


def build_augmented_transition(F, G, m, r, *, nu: int):
    """Assemble augmented-state transition matrices.

    Inputs are the eliminated-defect linearization
        δx_{k+1} = F δx_k + G δu_k + m δτ + r
    with F (N, nx, nx), G (N, nx, nu), m (N, nx), r (N, nx). Returns
    (Fz, Gz, rz) over z = [δx, δu_prev, δτ] (na = nx + nu + 1):
        δx rows:      [F, 0, m]·z + G·δu + r
        δu_prev rows: δu_k  (pure control pass-through)
        δτ row:       δτ_k
    """
    N, nx = F.shape[0], F.shape[1]
    na = nx + nu + 1
    dtype = F.dtype
    # Concat-based assembly — NO .at[].set: under vmap those lower to padded
    # scatters over (B, N, na, na) buffers whose tiny minor dims tile to full
    # 8x128 TPU tiles; measured ~45 ms/iteration at batch 4096 (~70% of the
    # whole SQP iteration) vs ~0 for the concatenation form.
    top = jnp.concatenate(
        [F, jnp.zeros((N, nx, nu), dtype), m[:, :, None]], axis=-1
    )  # (N, nx, na)
    mid = jnp.zeros((N, nu, na), dtype)
    bot = jnp.broadcast_to(jnp.eye(na, dtype=dtype)[na - 1 : na], (N, 1, na))
    Fz = jnp.concatenate([top, mid, bot], axis=-2)
    Gz = jnp.concatenate(
        [
            G,
            jnp.broadcast_to(jnp.eye(nu, dtype=dtype), (N, nu, nu)),
            jnp.zeros((N, 1, nu), dtype),
        ],
        axis=-2,
    )
    rz = jnp.concatenate([r, jnp.zeros((N, nu + 1), dtype)], axis=-1)
    return Fz, Gz, rz


def build_augmented_transition_nonuniform(F, G, m, r, *, nu: int):
    """Augmented transition for the NON-UNIFORM per-stage-dt grid.

    Each interval owns its dt decision variable (parity:
    cbr:optimal_control/.../non_uniform_finite_differences_variable_grid.h ::
    NonUniformFiniteDifferencesVariableGrid). TPU-first structure: δdt_k is
    an *extra control column* of stage k (the stage transition depends only on
    its own interval's dt), and δdt_{k-1} rides in the augmented state so the
    trapezoidal stage cost ½(dt_{k-1}+dt_k)·lx_k stays stage-separable —
    the KKT remains block-tridiagonal with the SAME na = nx+nu+1 as the
    uniform shared-τ layout, only the control width grows to nu+1:

        z_k = [δx_k, δu_{k-1}, δdt_{k-1}],  v_k = [δu_k, δdt_k]
        δx rows:      [F, 0, 0]·z + [G | m]·v + r
        δu_prev rows: δu_k
        δdt_prev row: δdt_k
    """
    N, nx = F.shape[0], F.shape[1]
    na = nx + nu + 1
    dtype = F.dtype
    top = jnp.concatenate([F, jnp.zeros((N, nx, nu + 1), dtype)], axis=-1)
    Fz = jnp.concatenate([top, jnp.zeros((N, nu + 1, na), dtype)], axis=-2)
    Gz = jnp.concatenate(
        [
            jnp.concatenate([G, m[:, :, None]], axis=-1),
            jnp.broadcast_to(jnp.eye(nu + 1, dtype=dtype), (N, nu + 1, nu + 1)),
        ],
        axis=-2,
    )
    rz = jnp.concatenate([r, jnp.zeros((N, nu + 1), dtype)], axis=-1)
    return Fz, Gz, rz
