"""Pallas TPU kernel: batched Riccati sweep (the SQP's KKT solve).

Replaces solvers/riccati.lqr_solve on the hot path. The XLA version is a
`lax.scan` of tiny (6×6) matrix ops — measured launch/latency-bound at
~30 ms per SQP iteration for B=4096 on v5e. This kernel runs the WHOLE
backward + forward sweep in one pallas_call:

  - layout: scenario batch in the minor (sublane × lane) dims — every
    matrix element is an (S, 128) tile, matrix algebra is fully unrolled
    elementwise VPU code over the batch (the MXU is useless for 6×6 blocks;
    the VPU at 8×128/cycle is exactly the right unit — SURVEY.md §8 hard
    part #2).
  - the value recursion (P, p), the gain tape (K, kff), and the forward
    rollout all stay in VMEM; HBM traffic is one read of the stage data and
    one write of the step — the kernel is bandwidth-limited as it should be.

Math identical to solvers/riccati.lqr_solve (same LqrStep semantics,
including the augmented-state dt handling and the dV bookkeeping).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpc_local_planner_tpu.solvers.riccati import LqrStep

SUBLANES = 2  # scenarios per program; input double-buffering must fit 16MB VMEM (host-side relayout dominates this kernel — see module docstring)
LANES = 128
BT = SUBLANES * LANES  # scenarios per kernel instance


def _riccati_kernel(
    Fz, Gz, rz, Hzz, Hzu, Huu, hz, hu, PN, pN, reg,  # inputs
    dxs, dus, dtau_o, dv_o,                           # outputs
    P, p, Ks, kffs, dv_acc,                           # scratch
    *, N: int, na: int, nu: int, nx: int, free_tau: bool,
):
    # ---- init terminal value function ---------------------------------- #
    for i in range(na):
        p[i] = pN[i, 0]
        for j in range(na):
            P[i, j] = PN[i, j, 0]
    dv_acc[0] = jnp.zeros_like(dv_acc[0])
    regv = reg[0, 0]

    # ---- backward sweep -------------------------------------------------- #
    def backward(t, _):
        k = N - 1 - t
        F = [[Fz[k, i, j, 0] for j in range(na)] for i in range(na)]
        G = [[Gz[k, i, j, 0] for j in range(nu)] for i in range(na)]
        r = [rz[k, i, 0] for i in range(na)]
        Pm = [[P[i, j] for j in range(na)] for i in range(na)]
        pv = [p[i] for i in range(na)]

        # PF = P @ F ; PG = P @ G ; Pr_p = P @ r + p
        PF = [
            [sum(Pm[i][l] * F[l][j] for l in range(na)) for j in range(na)]
            for i in range(na)
        ]
        PG = [
            [sum(Pm[i][l] * G[l][j] for l in range(na)) for j in range(nu)]
            for i in range(na)
        ]
        Prp = [sum(Pm[i][l] * r[l] for l in range(na)) + pv[i] for i in range(na)]

        # Qzz = Hzz + Fᵀ PF ; Qzu = Hzu + Fᵀ PG ; Quu = Huu + Gᵀ PG + reg I
        Qzz = [
            [
                Hzz[k, i, j, 0] + sum(F[l][i] * PF[l][j] for l in range(na))
                for j in range(na)
            ]
            for i in range(na)
        ]
        Qzu = [
            [
                Hzu[k, i, j, 0] + sum(F[l][i] * PG[l][j] for l in range(na))
                for j in range(nu)
            ]
            for i in range(na)
        ]
        Quu = [
            [
                Huu[k, i, j, 0]
                + sum(G[l][i] * PG[l][j] for l in range(na))
                + (regv if i == j else 0.0)
                for j in range(nu)
            ]
            for i in range(nu)
        ]
        qz = [hz[k, i, 0] + sum(F[l][i] * Prp[l] for l in range(na)) for i in range(na)]
        qu = [hu[k, i, 0] + sum(G[l][i] * Prp[l] for l in range(na)) for i in range(nu)]

        # 2x2 SPD inverse (closed form); nu == 2 on this workload
        assert nu == 2
        det = Quu[0][0] * Quu[1][1] - Quu[0][1] * Quu[1][0]
        inv_det = 1.0 / det
        Qi = [
            [Quu[1][1] * inv_det, -Quu[0][1] * inv_det],
            [-Quu[1][0] * inv_det, Quu[0][0] * inv_det],
        ]
        # K = −Quu⁻¹ Qzuᵀ ; kff = −Quu⁻¹ qu
        Km = [
            [-(Qi[i][0] * Qzu[j][0] + Qi[i][1] * Qzu[j][1]) for j in range(na)]
            for i in range(nu)
        ]
        kf = [-(Qi[i][0] * qu[0] + Qi[i][1] * qu[1]) for i in range(nu)]

        # P ← Qzz + Qzu K (symmetrized) ; p ← qz + Qzu kff
        for i in range(na):
            for j in range(na):
                v = Qzz[i][j] + sum(Qzu[i][l] * Km[l][j] for l in range(nu))
                vT = Qzz[j][i] + sum(Qzu[j][l] * Km[l][i] for l in range(nu))
                P[i, j] = 0.5 * (v + vT)
            p[i] = qz[i] + sum(Qzu[i][l] * kf[l] for l in range(nu))
        for i in range(nu):
            kffs[k, i] = kf[i]
            for j in range(na):
                Ks[k, i, j] = Km[i][j]
        dv_acc[0] = dv_acc[0] - 0.5 * sum(qu[i] * kf[i] for i in range(nu))
        return ()

    jax.lax.fori_loop(0, N, backward, ())

    # ---- initial stage: free δτ minimization ----------------------------- #
    tiny = jnp.finfo(jnp.float32).tiny
    Ptau = P[na - 1, na - 1] + regv
    if free_tau:
        dtau = -p[na - 1] / jnp.maximum(Ptau, tiny)
        dv_tau = 0.5 * Ptau * dtau * dtau
    else:
        dtau = jnp.zeros_like(Ptau)
        dv_tau = jnp.zeros_like(Ptau)
    dtau_o[0, 0] = dtau
    dv_o[0, 0] = dv_acc[0] + dv_tau

    # ---- forward rollout ------------------------------------------------- #
    # reuse p[] as the running z vector
    for i in range(na):
        p[i] = jnp.zeros_like(dtau)
    p[na - 1] = dtau
    for i in range(nx):
        dxs[0, i, 0] = jnp.zeros_like(dtau)

    def forward(k, _):
        z = [p[i] for i in range(na)]
        u = [
            sum(Ks[k, i, j] * z[j] for j in range(na)) + kffs[k, i]
            for i in range(nu)
        ]
        zn = [
            sum(Fz[k, i, j, 0] * z[j] for j in range(na))
            + sum(Gz[k, i, l, 0] * u[l] for l in range(nu))
            + rz[k, i, 0]
            for i in range(na)
        ]
        for i in range(nu):
            dus[k, i, 0] = u[i]
        for i in range(nx):
            dxs[k + 1, i, 0] = zn[i]
        for i in range(na):
            p[i] = zn[i]
        return ()

    jax.lax.fori_loop(0, N, forward, ())


def _to_tiles(a, batch):
    """(B, ...) → (..., S, 128): batch minor-most, padded to BT."""
    pad = (-batch) % BT
    if pad:
        a = jnp.concatenate(
            [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0
        )
    a = jnp.moveaxis(a, 0, -1)  # (..., Bp)
    return a.reshape(a.shape[:-1] + (-1, SUBLANES, LANES))  # (..., G, S, L)


def _from_tiles(a, batch):
    """(..., G, S, 128) → (B, ...)."""
    a = a.reshape(a.shape[:-3] + (-1,))
    a = jnp.moveaxis(a, -1, 0)
    return a[:batch]


def make_lqr_solve_auto(nx: int, free_tau: bool):
    """LQR solve that dispatches to the Pallas kernel under scenario vmap.

    Returns a function with the unbatched ``lqr_solve`` signature wrapped in
    ``jax.custom_batching.custom_vmap``: called unbatched it runs the XLA
    scan; under vmap it runs the whole batch through ``lqr_solve_pallas``
    (measured ~1.5 ms vs ~15 ms for the vmapped scan at batch 4096, N=30 on
    v5e). Falls back to the vmapped scan when the batch is not float32 or
    the backend has no Pallas TPU support (CPU test runs).
    """
    from jax.custom_batching import custom_vmap

    from mpc_local_planner_tpu.solvers.riccati import lqr_solve

    @custom_vmap
    def solve(Fz, Gz, rz, Hzz, Hzu, Huu, hz, hu, PN, pN, reg):
        return lqr_solve(
            Fz, Gz, rz, Hzz, Hzu, Huu, hz, hu, PN, pN, reg,
            nx=nx, free_tau=free_tau,
        )

    @solve.def_vmap
    def _batched(axis_size, in_batched, *args):
        # broadcast any unbatched operand to the mapped axis
        args = tuple(
            a if b else jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(x, (axis_size,) + x.shape), a
            )
            for a, b in zip(args, in_batched)
        )
        use_pallas = (
            args[0].dtype == jnp.float32
            and jax.default_backend() == "tpu"  # Mosaic/VMEM is TPU-only;
            # GPU and CPU both take the vmapped XLA scan
        )
        if use_pallas:
            out = lqr_solve_pallas(*args, nx=nx, free_tau=free_tau)
        else:
            out = jax.vmap(
                lambda *a: lqr_solve(*a, nx=nx, free_tau=free_tau)
            )(*args)
        return out, LqrStep(dxs=True, dus=True, dtau=True, dV=True)

    return solve


@functools.partial(jax.jit, static_argnames=("nx", "free_tau"))
def lqr_solve_pallas(
    Fz, Gz, rz, Hzz, Hzu, Huu, hz, hu, PN, pN, reg, *, nx: int, free_tau: bool
) -> LqrStep:
    """Batched Pallas Riccati solve. Leading batch axis on every argument.

    Same contract as vmap(solvers.riccati.lqr_solve) with reg (B,).
    """
    B, N, na, nu = Fz.shape[0], Fz.shape[1], Fz.shape[2], Gz.shape[3]
    dtype = Fz.dtype
    ins = [
        _to_tiles(a.astype(jnp.float32), B)
        for a in (Fz, Gz, rz, Hzz, Hzu, Huu, hz, hu, PN, pN, reg[:, None])
    ]
    G = ins[0].shape[-3]  # number of batch tile groups

    kernel = functools.partial(
        _riccati_kernel, N=N, na=na, nu=nu, nx=nx, free_tau=free_tau
    )

    def spec(a):
        # block over the batch-group axis (third from last), full otherwise
        blk = a.shape[:-3] + (1, SUBLANES, LANES)
        nlead = len(a.shape) - 3
        return pl.BlockSpec(
            blk,
            (lambda g, _n=nlead: (0,) * _n + (g, 0, 0)),
            memory_space=pltpu.VMEM,
        )

    out_shapes = [
        jax.ShapeDtypeStruct((N + 1, nx, G, SUBLANES, LANES), jnp.float32),
        jax.ShapeDtypeStruct((N, nu, G, SUBLANES, LANES), jnp.float32),
        jax.ShapeDtypeStruct((1, G, SUBLANES, LANES), jnp.float32),
        jax.ShapeDtypeStruct((1, G, SUBLANES, LANES), jnp.float32),
    ]
    outs = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[spec(a) for a in ins],
        out_specs=[spec(s) for s in out_shapes],
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((na, na, SUBLANES, LANES), jnp.float32),   # P
            pltpu.VMEM((na, SUBLANES, LANES), jnp.float32),        # p / z
            pltpu.VMEM((N, nu, na, SUBLANES, LANES), jnp.float32),  # K tape
            pltpu.VMEM((N, nu, SUBLANES, LANES), jnp.float32),      # kff tape
            pltpu.VMEM((1, SUBLANES, LANES), jnp.float32),          # dV acc
        ],
    )(*ins)
    dxs, dus, dtau, dv = outs
    return LqrStep(
        dxs=_from_tiles(dxs, B).astype(dtype),
        dus=_from_tiles(dus, B).astype(dtype),
        dtau=_from_tiles(dtau, B)[..., 0].astype(dtype),
        dV=_from_tiles(dv, B)[..., 0].astype(dtype),
    )
