"""Objective terms.

Parity (file :: symbol):
  optimal_control/quadratic_cost_se2.h        :: QuadraticFormCostSE2,
                                                 QuadraticStateCostSE2
  optimal_control/final_state_conditions_se2.h:: QuadraticFinalStateCostSE2
  optimal_control/min_time_via_points_cost.h  :: MinTimeViaPointsCost
  cbr:optimal_control/functions/minimum_time.h:: MinimumTime (cost = Σ dt = N·dt)

All terms are SE(2)-aware: state differences use ``se2_boxminus`` (θ wrapped).
Each function returns a scalar per trajectory and broadcasts over leading
batch dims. Via-point attraction follows the reference: every active via
point attracts its *nearest* trajectory state (soft assignment is not needed —
min-index selection is piecewise constant so the gradient flows through the
selected stage only, matching the reference's discrete association).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mpc_local_planner_tpu.core.so2 import angle_diff, se2_boxminus


def quadratic_form_cost(spec, xs, us, dt, xref):
    """(x ⊖ xref)ᵀQ(x ⊖ xref) + uᵀRu summed over stages k = 0..N-1.

    integral_form=False sums the stage terms directly (the reference's
    non-integral form); integral_form=True multiplies each term by dt.
    The integral rule follows ``spec.cost_integration`` (parity:
    grid.cost_integration_method): left_sum = left-rectangle; trapezoidal =
    dt·[½lx_0 + Σ_{1..N-1} lx_k + ½lx_N] + dt·Σ lu_k (exact regrouping; the
    control integral is rule-independent because u is piecewise constant).
    The terminal quadratic cost (qf_diag) remains separate
    (parity: QuadraticFormCostSE2 evaluates k < N only).
    """
    q = jnp.asarray(spec.q_diag, dtype=xs.dtype)
    r = jnp.asarray(spec.r_diag, dtype=xs.dtype)
    dx = se2_boxminus(xs[..., :-1, :], xref[..., None, :])
    x_term = jnp.sum(dx * dx * q, axis=-1)
    u_term = jnp.sum(us * us * r, axis=-1)
    if spec.integral_form and spec.cost_integration == "trapezoidal":
        if spec.nonuniform_dt:
            # non-uniform grid: Σ_k dt_k·½(lx_k + lx_{k+1}) + Σ_k dt_k·lu_k
            # (reduces to the scalar regrouping below when dt_k ≡ dt)
            dx_all = se2_boxminus(xs, xref[..., None, :])
            lx = jnp.sum(dx_all * dx_all * q, axis=-1)
            x_int = 0.5 * jnp.sum(dt * (lx[..., :-1] + lx[..., 1:]), axis=-1)
            return x_int + jnp.sum(dt * u_term, axis=-1)
        w = jnp.ones(x_term.shape[-1], dtype=xs.dtype)
        w = jnp.where(jnp.arange(x_term.shape[-1]) == 0, 0.5, w)
        dxN = se2_boxminus(xs[..., -1, :], xref)
        tail = 0.5 * jnp.sum(dxN * dxN * q, axis=-1)
        return (jnp.sum(w * x_term + u_term, axis=-1) + tail) * dt
    term = x_term + u_term
    if spec.integral_form:
        term = term * (dt if spec.nonuniform_dt else dt[..., None])
    return jnp.sum(term, axis=-1)


def quadratic_final_state_cost(spec, xs, xref):
    """(x_N ⊖ xref)ᵀ Qf (x_N ⊖ xref); disabled when qf_diag is None."""
    if spec.qf_diag is None:
        return jnp.zeros(xs.shape[:-2], dtype=xs.dtype)
    qf = jnp.asarray(spec.qf_diag, dtype=xs.dtype)
    dx = se2_boxminus(xs[..., -1, :], xref)
    return jnp.sum(dx * dx * qf, axis=-1)


def minimum_time_cost(spec, dt):
    """Σ_k dt_k (parity: corbo MinimumTime) — N·dt on a uniform grid,
    an actual per-stage sum on a non-uniform one."""
    if spec.nonuniform_dt:
        return jnp.sum(dt, axis=-1)
    return spec.N * dt


def via_stage_assignment(spec, xs, via_points, via_mask):
    """Stage index claimed by each via point: (..., Mv) int32.

    Unordered (default): independent nearest-stage argmin per via point.
    Ordered (``spec.via_points_ordered``): cumulative argmin — via point j
    may only claim a stage at or after the stage claimed by via point j−1,
    so the trajectory traverses the via sequence in list order (parity:
    minimum_time_via_points.via_points_ordered).
    Inactive (masked) via slots never advance the order cursor.
    """
    pos = xs[..., None, :, :2]                  # (..., 1, N+1, 2)
    vp = via_points[..., :, None, :2]           # (..., Mv, 1, 2)
    d2 = jnp.sum((pos - vp) ** 2, axis=-1)      # (..., Mv, N+1)
    if not spec.via_points_ordered:
        return jnp.argmin(d2, axis=-1)
    n_states = d2.shape[-1]
    stages = jnp.arange(n_states)
    d2_m = jnp.moveaxis(d2, -2, 0)              # (Mv, ..., N+1)
    mask_m = jnp.moveaxis(via_mask, -1, 0)      # (Mv, ...)

    def body(k_prev, inp):
        d2_j, active = inp
        allowed = stages >= k_prev[..., None]
        k_j = jnp.argmin(jnp.where(allowed, d2_j, jnp.inf), axis=-1).astype(
            jnp.int32
        )
        k_next = jnp.where(active, k_j, k_prev)
        return k_next, k_j

    k0 = jnp.zeros(d2.shape[:-2], dtype=jnp.int32)
    _, ks = jax.lax.scan(body, k0, (d2_m, mask_m))
    return jnp.moveaxis(ks, 0, -1)              # (..., Mv)


def via_points_cost(spec, xs, via_points, via_mask):
    """Attraction of the trajectory to via points.

    Parity: MinTimeViaPointsCost — per active via point, a quadratic
    position penalty to the assigned trajectory state (plus an optional
    orientation term). Padded via slots contribute exactly zero.
    """
    if spec.via_cap == 0:
        return jnp.zeros(xs.shape[:-2], dtype=xs.dtype)
    pos = xs[..., None, :, :2]                  # (..., 1, N+1, 2)
    vp = via_points[..., :, None, :2]           # (..., Mv, 1, 2)
    d2 = jnp.sum((pos - vp) ** 2, axis=-1)      # (..., Mv, N+1)
    k_near = via_stage_assignment(spec, xs, via_points, via_mask)
    d2_near = jnp.take_along_axis(d2, k_near[..., None], axis=-1)[..., 0]
    cost = spec.via_position_weight * d2_near
    if spec.via_orientation_weight > 0.0:
        th = jnp.take_along_axis(
            xs[..., None, :, 2], k_near[..., None], axis=-1
        )[..., 0]
        dth = angle_diff(th, via_points[..., 2])
        cost = cost + spec.via_orientation_weight * dth * dth
    return jnp.sum(jnp.where(via_mask, cost, 0.0), axis=-1)


def total_cost(spec, xs, us, dt, scenario):
    """Full objective for a trajectory (scalar per batch element).

    Parity: Controller::configureOcp objective dispatch —
      quadratic_form            → stage quadratic + optional terminal quadratic
                                  (+ optional hybrid min-time term)
      minimum_time              → N·dt (+ optional terminal quadratic)
      minimum_time_via_points   → N·dt + via attraction
    """
    dt = jnp.asarray(dt)
    if spec.objective == "quadratic_form":
        c = quadratic_form_cost(spec, xs, us, dt, scenario.xf)
        if spec.hybrid_time_weight > 0.0:
            c = c + spec.hybrid_time_weight * minimum_time_cost(spec, dt)
    elif spec.objective == "minimum_time":
        c = minimum_time_cost(spec, dt)
    else:  # minimum_time_via_points
        c = minimum_time_cost(spec, dt) + via_points_cost(
            spec, xs, scenario.via_points, scenario.via_mask
        )
    return c + quadratic_final_state_cost(spec, xs, scenario.xf)
