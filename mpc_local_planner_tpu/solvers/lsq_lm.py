"""Levenberg–Marquardt soft-penalty least-squares solver (`solver.type: lsq_lm`).

Parity (file :: symbol): cbr:optimization/solver/levenberg_marquardt_dense.h
:: LevenbergMarquardtDense — the reference's robust fallback NLP solver:
constraints become weighted quadratic soft penalties, the objective is cast
to least-squares form, and damped Gauss–Newton iterates with an outer
penalty-weight adaptation loop (cbr: SolverLeastSquares weight adaptation).
Unlike the AL-SQP path it never takes an infeasible KKT step — every iterate
monotonically decreases the merit ½‖r‖², which is what makes it the fallback
of choice when AL diverges.

TPU-first design: the decision vector of one scenario is small
(n = N·(nx+nu)+1 ≈ 100–200), so the normal equations are solved DENSE —
JᵀJ is a single (n×n) matmul that maps straight onto the MXU and vmaps over
scenario batches with zero divergence (accept/reject is a `where`-select,
damping adaptation is data-parallel per lane). No sparse graph, no
factorization scheduling — the reference's Eigen::LDLT becomes a batched
`cho_solve`. Everything runs under one `lax.fori_loop` nest (outer weight
adaptation × inner LM), fully jittable.

Least-squares forms (½‖r‖² reproduces `total_cost` exactly):
  quadratic_form      → r = √(2wq)·(x ⊖ xref), √(2wr)·u  (dt-scaled when
                        integral_form; trapezoidal endpoint weights honored)
  minimum_time        → r = √(2·N·dt)   (scalar residual; d r/d dt ∝ dt^-½)
  min_time_via_points → + √(2w_via)·(p_k − p_via) per active via slot
  equalities          → √w_eq·c(z)      (collocation defects + terminal)
  inequalities        → √w_ineq·max(0, g(z))
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mpc_local_planner_tpu.core.so2 import angle_diff, se2_boxminus
from mpc_local_planner_tpu.ocp.costs import via_stage_assignment
from mpc_local_planner_tpu.ocp.grid import Primal
from mpc_local_planner_tpu.ocp.problem import make_ocp_functions
from mpc_local_planner_tpu.ocp.spec import OcpSpec
from mpc_local_planner_tpu.solvers.al_sqp import SolveResult, SolverSettings


def _objective_residuals(spec: OcpSpec, primal: Primal, scenario):
    """Stack the objective's least-squares residuals (½‖r‖² == total_cost)."""
    xs, us, dt = primal.xs, primal.us, primal.dt
    dtype = xs.dtype
    parts = []
    dt_pos = jnp.maximum(dt, 1e-6)

    # Σ dt_k as an array: per-stage sum on a non-uniform grid, N·dt uniform.
    per_stage = spec.nonuniform_dt
    total_time = jnp.sum(dt_pos, axis=-1) if per_stage else spec.N * dt_pos

    if spec.objective == "quadratic_form":
        q = jnp.sqrt(2.0 * jnp.asarray(spec.q_diag, dtype))
        r = jnp.sqrt(2.0 * jnp.asarray(spec.r_diag, dtype))
        dx = se2_boxminus(xs[..., :-1, :], scenario.xf[..., None, :])
        rx = dx * q                           # (N, 3)
        ru = us * r                           # (N, nu)
        if spec.integral_form:
            s = (
                jnp.sqrt(dt_pos)[..., None]
                if per_stage
                else jnp.sqrt(dt_pos)[..., None, None]
            )
            ru = ru * s
            if spec.cost_integration == "trapezoidal":
                if per_stage:
                    # Σ_k dt_k·½(lx_k+lx_{k+1}) regrouped per state j:
                    # w_j = ½(dt_{j−1}+dt_j), dt_{−1} = dt_N = 0 — covers the
                    # terminal state, so no separate tail residual.
                    zero = jnp.zeros_like(dt_pos[..., :1])
                    w = 0.5 * (
                        jnp.concatenate([zero, dt_pos], axis=-1)
                        + jnp.concatenate([dt_pos, zero], axis=-1)
                    )  # (..., N+1)
                    dx_all = se2_boxminus(xs, scenario.xf[..., None, :])
                    rx = dx_all * q * jnp.sqrt(w)[..., None]
                else:
                    w = jnp.ones(rx.shape[-2], dtype)
                    w = jnp.where(jnp.arange(rx.shape[-2]) == 0, jnp.sqrt(0.5), w)
                    rx = rx * w[:, None] * s
                    dxN = se2_boxminus(xs[..., -1, :], scenario.xf)
                    parts.append(
                        dxN * q * jnp.sqrt(0.5) * jnp.sqrt(dt_pos)[..., None]
                    )
            else:
                rx = rx * s
        parts = [rx.reshape(rx.shape[:-2] + (-1,)), ru.reshape(ru.shape[:-2] + (-1,))] + [
            p for p in parts
        ]
        if spec.hybrid_time_weight > 0.0:
            parts.append(
                jnp.sqrt(2.0 * spec.hybrid_time_weight * total_time)[..., None]
            )
    else:  # minimum_time / minimum_time_via_points
        if per_stage:
            # per-interval residuals: ½ Σ (√(2·dt_k))² = Σ dt_k
            parts.append(jnp.sqrt(2.0 * dt_pos))
        else:
            parts.append(jnp.sqrt(2.0 * spec.N * dt_pos)[..., None])
        if spec.objective == "minimum_time_via_points" and spec.via_cap > 0:
            vp, vm = scenario.via_points, scenario.via_mask
            k = via_stage_assignment(spec, xs, vp, vm)
            pk = jnp.take_along_axis(
                xs[..., :2], k[..., None].repeat(2, -1), axis=-2
            )
            w = jnp.sqrt(2.0 * spec.via_position_weight)
            rv = (pk - vp[..., :2]) * w * vm[..., None]
            parts.append(rv.reshape(rv.shape[:-2] + (-1,)))
            if spec.via_orientation_weight > 0.0:
                thk = jnp.take_along_axis(xs[..., 2], k, axis=-1)
                dth = angle_diff(thk, vp[..., 2])
                parts.append(
                    dth * jnp.sqrt(2.0 * spec.via_orientation_weight) * vm
                )

    if spec.qf_diag is not None:
        qf = jnp.sqrt(2.0 * jnp.asarray(spec.qf_diag, dtype))
        parts.append(se2_boxminus(xs[..., -1, :], scenario.xf) * qf)
    return jnp.concatenate(parts, axis=-1)


def solve_single_lm(
    spec: OcpSpec,
    settings: SolverSettings,
    scenario,
    init: Primal,
    duals,
) -> SolveResult:
    """One scenario, signature-compatible with al_sqp.solve_single.

    SolverSettings mapping (documented on SolverSettings): n_al → outer
    weight-adaptation steps, n_sqp → LM iterations per step, rho0 → initial
    penalty weight, rho_growth → weight growth factor, rho_max → weight cap.
    `duals` is passed through untouched (this solver has no multipliers) so
    the Controller's warm-start state machinery stays shape-stable.
    """
    fns = make_ocp_functions(spec)
    dtype = init.xs.dtype
    z0 = fns.flatten(init)
    n = z0.shape[-1]
    nX = spec.N * spec.nx
    theta_ix = jnp.arange(n) % spec.nx == spec.nx - 1
    theta_ix = jnp.logical_and(theta_ix, jnp.arange(n) < nX)

    n_dt = fns.n_dt

    def sanitize(z):
        th = jnp.arctan2(jnp.sin(z), jnp.cos(z))
        z = jnp.where(theta_ix, th, z)
        if n_dt:
            dt = jnp.clip(z[-n_dt:], max(spec.dt_min, 1e-4), spec.dt_max)
            z = jnp.concatenate([z[:-n_dt], dt])
        return z

    def residual(z, w_eq, w_ineq):
        primal = fns.unflatten(z, scenario.x0)
        r_obj = _objective_residuals(spec, primal, scenario)
        r_eq = jnp.sqrt(w_eq) * fns.eq(primal, scenario)
        r_in = jnp.sqrt(w_ineq) * jnp.maximum(0.0, fns.ineq(primal, scenario))
        return jnp.concatenate([r_obj, r_eq, r_in], axis=-1)

    def merit(z, w_eq, w_ineq):
        r = residual(z, w_eq, w_ineq)
        return 0.5 * jnp.sum(r * r)

    eye = jnp.eye(n, dtype=dtype)

    def lm_iter(_, carry):
        # (r, J) always correspond to z: recomputed only on acceptance — a
        # rejected step leaves the iterate (and therefore its residual and
        # Jacobian, the expensive parts) unchanged, so retrying with larger
        # damping reuses them. Batched (vmapped) lanes execute both cond
        # branches anyway (no loss vs recompute); the single-robot
        # non-uniform-grid path skips the redundant jacfwd on rejections.
        z, S, lam, r, J, w_eq, w_ineq = carry
        A = J.T @ J
        g = J.T @ r
        # Marquardt scaling: damp proportionally to the curvature diagonal
        # (scale-free across the heterogeneous x/u/dt variables)
        D = jnp.diag(jnp.diag(A)) + 1e-8 * eye
        p = jax.scipy.linalg.cho_solve(
            jax.scipy.linalg.cho_factor(A + lam * D + 1e-10 * eye, lower=True),
            -g,
        )
        z_new = sanitize(z + p)
        r_new = residual(z_new, w_eq, w_ineq)
        S_new = 0.5 * jnp.sum(r_new * r_new)
        ok = jnp.logical_and(S_new < S, jnp.isfinite(S_new))
        z, S, lam, r, J = jax.lax.cond(
            ok,
            lambda: (z_new, S_new, lam / 3.0,
                     r_new, jax.jacfwd(residual)(z_new, w_eq, w_ineq)),
            lambda: (z, S, lam * 4.0, r, J),
        )
        lam = jnp.clip(lam, 1e-10, 1e10)
        return z, S, lam, r, J, w_eq, w_ineq

    def outer_iter(_, carry):
        z, w_eq, w_ineq = carry
        # the penalty weights changed: (r, J) must be rebuilt at this phase's
        # weights before the inner loop can reuse them
        r0 = residual(z, w_eq, w_ineq)
        J0 = jax.jacfwd(residual)(z, w_eq, w_ineq)
        S0 = 0.5 * jnp.sum(r0 * r0)
        lam0 = jnp.asarray(1e-3, dtype)
        z, _, _, _, _, _, _ = jax.lax.fori_loop(
            0, settings.n_sqp, lm_iter, (z, S0, lam0, r0, J0, w_eq, w_ineq)
        )
        # penalty weight adaptation (cbr: SolverLeastSquares::adaptWeights)
        w_eq = jnp.minimum(w_eq * settings.rho_growth, settings.rho_max)
        w_ineq = jnp.minimum(w_ineq * settings.rho_growth, settings.rho_max)
        return z, w_eq, w_ineq

    w0 = jnp.asarray(max(settings.rho0, 1.0), dtype)
    z, _, _ = jax.lax.fori_loop(
        0, settings.n_al, outer_iter, (sanitize(z0), w0, w0)
    )

    primal = fns.unflatten(z, scenario.x0)
    cost = fns.cost(primal, scenario)
    eq_norm = jnp.max(jnp.abs(fns.eq(primal, scenario)))
    ineq_viol = jnp.maximum(0.0, jnp.max(fns.ineq(primal, scenario)))
    converged = jnp.logical_and(
        eq_norm < settings.tol_eq, ineq_viol < settings.tol_ineq
    )
    return SolveResult(
        primal=primal,
        duals=duals,
        cost=cost,
        eq_norm=eq_norm,
        ineq_viol=ineq_viol,
        converged=converged,
    )
