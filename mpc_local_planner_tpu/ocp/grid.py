"""Decision-variable container (the "grid") and warm-start logic.

Parity: ``optimal_control/full_discretization_grid_base_se2.h``
(FullDiscretizationGridBaseSE2 — SE(2)-aware vertices, initialization by
linear interpolation with angle interpolation, warm start by time shift) and
``Controller::generateInitialStateTrajectory`` (seed from the global plan).

TPU-first: instead of a vertex set feeding a hypergraph, the decision
variables are one fixed-shape pytree ``Primal`` — xs (N+1, 3), us (N, nu),
dt () — with arbitrary leading batch dims. The reference's *grid resizing*
(variable-grid adaptation toward dt_ref) becomes either a dt decision
variable (min-time) or a host-side re-seed at a different compiled N.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from mpc_local_planner_tpu.core.so2 import se2_interpolate


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Primal:
    """OCP decision variables. xs: (..., N+1, 3); us: (..., N, nu); dt: (...,)."""

    xs: jax.Array
    us: jax.Array
    dt: jax.Array

    @property
    def n_stages(self) -> int:
        return self.us.shape[-2]

    def batch_shape(self):
        return self.dt.shape


def _seed_controls(spec, xs, dt):
    """Consistent initial controls from the interpolated state path.

    Channel 0 of every model is forward velocity: seed it with the signed
    body-frame displacement per stage. Leaving u = 0 is degenerate for
    min-time problems — at u = 0, ∂(defect)/∂dt = f(x, 0) = 0 for kinematic
    models, so the QP sees no feasibility pushback against shrinking dt and
    collapses the horizon (this is also why the reference nudges its grids
    from the plan rather than zeros).
    """
    p = xs[..., :2]
    th = xs[..., :-1, 2]
    heading = jnp.stack([jnp.cos(th), jnp.sin(th)], axis=-1)
    disp = p[..., 1:, :] - p[..., :-1, :]
    # dt: scalar-per-trajectory (...,) or per-stage (..., N); both divide the
    # (..., N) per-stage displacement.
    dtb = dt if dt.ndim == disp.ndim - 1 else dt[..., None]
    v = jnp.sum(disp * heading, axis=-1) / dtb
    lo, hi = spec.control_box()
    v = jnp.clip(v, lo[0], hi[0]).astype(xs.dtype)
    us = jnp.zeros(xs.shape[:-2] + (spec.N, spec.nu), dtype=xs.dtype)
    return us.at[..., 0].set(v)


def initial_primal(spec, scenario) -> Primal:
    """Straight-line SE(2) interpolation x0 → xf, path-seeded controls,
    dt = dt_ref.

    Parity: FullDiscretizationGridBaseSE2 initialization (linear interpolation
    with shortest-arc angle blending).
    """
    alphas = jnp.linspace(0.0, 1.0, spec.N + 1, dtype=scenario.x0.dtype)
    xs = jax.vmap(
        lambda a: se2_interpolate(scenario.x0, scenario.xf, a),
        out_axes=-2,
    )(alphas)
    batch = scenario.x0.shape[:-1]
    dt_shape = batch + (spec.N,) if spec.nonuniform_dt else batch
    dt = jnp.full(dt_shape, spec.dt_ref, dtype=scenario.x0.dtype)
    us = _seed_controls(spec, xs, dt)
    return Primal(xs=xs, us=us, dt=dt)


def primal_from_plan(spec, plan_xy_theta, x0, dt=None) -> Primal:
    """Seed from a (transformed, pruned) global plan.

    Parity: Controller::generateInitialStateTrajectory — resample the plan
    poses uniformly onto the N+1 grid states (arc-index interpolation with
    angle blending); x_0 is overwritten with the measured state.
    plan_xy_theta: (..., P, 3).
    """
    P = plan_xy_theta.shape[-2]
    pos = jnp.linspace(0.0, float(P - 1), spec.N + 1)
    idx0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, P - 2)
    frac = (pos - idx0.astype(pos.dtype)).astype(plan_xy_theta.dtype)
    pa = jnp.take(plan_xy_theta, idx0, axis=-2)
    pb = jnp.take(plan_xy_theta, idx0 + 1, axis=-2)
    # broadcast the stage fractions over any leading batch dims (r4 fix:
    # the old frac[..., None] broke batched plans — se2_interpolate's
    # rank rule appended a second None)
    xs = se2_interpolate(pa, pb, jnp.broadcast_to(frac, pa.shape[:-1]))
    xs = xs.at[..., 0, :].set(x0)
    batch = xs.shape[:-2]
    dt_shape = batch + (spec.N,) if spec.nonuniform_dt else batch
    dtv = jnp.full(dt_shape, spec.dt_ref if dt is None else dt, dtype=xs.dtype)
    us = _seed_controls(spec, xs, dtv)
    return Primal(xs=xs, us=us, dt=dtv)


def _take_stages(a, src):
    """Per-lane gather along the stage axis.

    a: (..., S) or (..., S, d); src: (..., S') integer indices with the same
    leading (batch) dims. The per-lane generalization of ``jnp.take(a, src,
    axis=-2)`` used by the dynamic-``steps`` warm-start paths.
    """
    if a.ndim == src.ndim:
        return jnp.take_along_axis(a, src, axis=-1)
    idx = jnp.broadcast_to(src[..., None], src.shape + (a.shape[-1],))
    return jnp.take_along_axis(a, idx, axis=-2)


def warm_start_shift(primal: Primal, x0, steps=1, spec=None) -> Primal:
    """Shift the previous solution by ``steps`` stages and re-anchor x_0.

    Parity: FullDiscretizationGridBaseSE2 warm start — shift trajectory by the
    elapsed interval, append the tail. With ``spec`` given, the appended tail
    states are extrapolated with the dynamics (x ⊞ dt·f(x, u_last)); a
    repeated final state leaves an O(dt·f) defect spike at the tail that a
    small warm-start iteration budget then has to burn down.
    Fixed-shape: a roll + masked overwrite of the tail.

    ``steps`` is either a static Python int (shared shift — the single-robot
    path) or a traced integer array with the primal's batch shape (per-lane
    shift — the batched elapsed-aware path, where each lane's optimized dt
    differs so the same wall-clock ``elapsed`` maps to a different stage
    count per lane). The dynamic path extrapolates a ⌈N/2⌉-step tail once
    with ``lax.scan`` and gathers from the extended sequence — semantics
    identical to the static loop (verified element-wise in tests).
    """
    N = primal.n_stages
    if not isinstance(steps, int):
        return _warm_start_shift_dynamic(primal, x0, steps, spec)
    k = jnp.arange(N + 1)
    src = jnp.minimum(k + steps, N)
    xs = jnp.take(primal.xs, src, axis=-2)
    ku = jnp.arange(N)
    src_u = jnp.minimum(ku + steps, N - 1)
    us = jnp.take(primal.us, src_u, axis=-2)
    per_stage_dt = primal.dt.ndim == primal.us.ndim - 1
    if spec is not None and steps > 0:
        u_last = primal.us[..., -1, :]
        x_tail = primal.xs[..., -1, :]
        dtb = primal.dt[..., -1, None] if per_stage_dt else primal.dt[..., None]
        for s in range(steps):
            from mpc_local_planner_tpu.core.so2 import se2_boxplus

            x_tail = se2_boxplus(x_tail, dtb * spec.model.f(x_tail, u_last))
            xs = xs.at[..., N - steps + 1 + s, :].set(x_tail)
    xs = xs.at[..., 0, :].set(x0)
    dt = jnp.take(primal.dt, src_u, axis=-1) if per_stage_dt else primal.dt
    return Primal(xs=xs, us=us, dt=dt)


def _warm_start_shift_dynamic(primal: Primal, x0, steps, spec) -> Primal:
    """Per-lane traced-``steps`` variant of :func:`warm_start_shift`.

    Builds the length-(N+1+S_max) extended state sequence once (dynamics
    tail via ``lax.scan``) and gathers position ``k + steps_lane`` from it:
    for k + steps ≤ N this reads the shifted original state, beyond it the
    (k + steps − N)-th dynamics extrapolation — exactly the static path's
    tail loop. Controls/dt clamp-repeat their last stage, as in the static
    path.
    """
    N = primal.n_stages
    s_max = max(1, N // 2)
    steps = jnp.clip(jnp.asarray(steps, jnp.int32), 1, s_max)
    per_stage_dt = primal.dt.ndim == primal.us.ndim - 1
    u_last = primal.us[..., -1, :]
    dtb = primal.dt[..., -1, None] if per_stage_dt else primal.dt[..., None]
    from mpc_local_planner_tpu.core.so2 import se2_boxplus

    def body(x, _):
        xn = se2_boxplus(x, dtb * spec.model.f(x, u_last)) if spec is not None else x
        return xn, xn

    _, tail = jax.lax.scan(body, primal.xs[..., -1, :], None, length=s_max)
    tail = jnp.moveaxis(tail, 0, -2)  # (..., S_max, 3)
    ext_xs = jnp.concatenate([primal.xs, tail], axis=-2)
    k = jnp.arange(N + 1)
    src = jnp.minimum(k + steps[..., None], N + s_max)
    xs = _take_stages(ext_xs, src)
    src_u = jnp.minimum(jnp.arange(N) + steps[..., None], N - 1)
    us = _take_stages(primal.us, src_u)
    xs = xs.at[..., 0, :].set(x0)
    dt = _take_stages(primal.dt, src_u) if per_stage_dt else primal.dt
    return Primal(xs=xs, us=us, dt=dt)


def warm_start_resample(primal: Primal, x0, steps=1, spec=None) -> Primal:
    """Warm start for shrinking-horizon (min-time, xf-fixed) problems.

    Parity: FiniteDifferencesVariableGridSE2 grid adaptation — after the
    robot advances ``steps`` stages, the *remaining* trajectory still ends at
    the fixed terminal state; re-stretch it over the full N-stage grid with
    dt' = dt·(N−steps)/N. Unlike a pure shift (which leaves the trajectory a
    stage short of the terminal equality every cycle), this warm start is
    terminal-feasible by construction. SE(2)-aware interpolation; fixed
    shapes (the reference resizes the grid; we rescale dt instead).

    ``steps``: static Python int, or a traced integer array with the
    primal's batch shape for per-lane shifts (batched elapsed-aware warm
    start — see :func:`warm_start_shift`).
    """
    N = primal.n_stages
    if not isinstance(steps, int):
        return _warm_start_resample_dynamic(primal, x0, steps, spec)
    dtype = primal.xs.dtype
    pos = steps + jnp.arange(N + 1, dtype=dtype) * (N - steps) / N  # [steps, N]
    i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, N - 1)
    frac = (pos - i0.astype(dtype))[:, None]  # (N+1, 1), broadcasts over batch
    xa = jnp.take(primal.xs, i0, axis=-2)
    xb = jnp.take(primal.xs, i0 + 1, axis=-2)
    from mpc_local_planner_tpu.core.so2 import _wrap_theta, se2_boxminus

    # frac (N+1, 1) broadcasts over any leading batch dims; _wrap_theta is
    # the shared scatter-free angle wrap
    xs = _wrap_theta(xa + frac * se2_boxminus(xb, xa))
    xs = xs.at[..., 0, :].set(x0)
    pos_u = steps + jnp.arange(N, dtype=dtype) * (N - steps) / N
    iu = jnp.clip(jnp.round(pos_u).astype(jnp.int32), 0, N - 1)
    us = jnp.take(primal.us, iu, axis=-2)
    dt_min = 1e-3 if spec is None else max(spec.dt_min, 1e-3)
    dt = primal.dt
    if dt.ndim == primal.us.ndim - 1:  # per-stage dt: resample like us
        dt = jnp.take(dt, iu, axis=-1)
    dt = jnp.maximum(dt * (N - steps) / N, dt_min)
    return Primal(xs=xs, us=us, dt=dt)


def _warm_start_resample_dynamic(primal: Primal, x0, steps, spec) -> Primal:
    """Per-lane traced-``steps`` variant of :func:`warm_start_resample`.

    Same stretch-over-the-remaining-trajectory semantics, with the resample
    positions computed per lane and gathered with ``take_along_axis``.
    """
    N = primal.n_stages
    dtype = primal.xs.dtype
    s_max = max(1, N // 2)
    steps = jnp.clip(jnp.asarray(steps, jnp.int32), 1, s_max)
    sf = steps.astype(dtype)[..., None]  # (..., 1) broadcasts over stages
    pos = sf + jnp.arange(N + 1, dtype=dtype) * (N - sf) / N  # (..., N+1)
    i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, N - 1)
    frac = (pos - i0.astype(dtype))[..., None]
    xa = _take_stages(primal.xs, i0)
    xb = _take_stages(primal.xs, i0 + 1)
    from mpc_local_planner_tpu.core.so2 import _wrap_theta, se2_boxminus

    xs = _wrap_theta(xa + frac * se2_boxminus(xb, xa))
    xs = xs.at[..., 0, :].set(x0)
    pos_u = sf + jnp.arange(N, dtype=dtype) * (N - sf) / N
    iu = jnp.clip(jnp.round(pos_u).astype(jnp.int32), 0, N - 1)
    us = _take_stages(primal.us, iu)
    dt_min = 1e-3 if spec is None else max(spec.dt_min, 1e-3)
    dt = primal.dt
    if dt.ndim == primal.us.ndim - 1:  # per-stage dt: resample like us
        dt = jnp.maximum(_take_stages(dt, iu) * (N - sf) / N, dt_min)
    else:
        dt = jnp.maximum(dt * (N - steps.astype(dtype)) / N, dt_min)
    return Primal(xs=xs, us=us, dt=dt)


# --------------------------------------------------------------------------- #
# grid adaptation (variable horizon N)
# --------------------------------------------------------------------------- #
def adapt_grid_size(dt: float, N: int, *, dt_ref: float, dt_hyst_ratio: float,
                    min_grid_size: int, max_grid_size: int,
                    mode: str = "time_based_single_step") -> int:
    """Time-based grid adaptation decision.

    Parity: ``cbr:optimal_control/.../finite_differences_variable_grid.cpp ::
    FiniteDifferencesVariableGrid::adaptGrid`` (the modes
    ``mpc_local_planner``'s FiniteDifferencesVariableGridSE2 exposes via the
    ``grid.variable_grid.grid_adaptation`` namespace): after a solve, if the
    optimized dt drifts out of the hysteresis band around dt_ref the horizon
    is resized so dt moves back toward dt_ref —
    ``time_based_single_step`` grows/shrinks N by one stage per cycle
    (GridAdaptStrategy::TimeBasedSingleStep);
    ``time_based_aggressive_estimate`` jumps straight to the estimated
    N* = round(T / dt_ref) = round(N·dt / dt_ref) in one step
    (GridAdaptStrategy::TimeBasedAggressiveEstimate) — faster settling at
    the price of larger warm-start resamples (and, here, more compiled-N
    cache entries).

    TPU-first: this is a *host-side* decision between compiled solves — each
    distinct N is its own fixed-shape jitted program (cached per N by the
    Controller), and the stored primal/duals are resampled onto the new grid
    by :func:`resize_primal` / :func:`resize_duals`.
    """
    in_band = (
        dt_ref * (1.0 - dt_hyst_ratio) <= dt <= dt_ref * (1.0 + dt_hyst_ratio)
    )
    if in_band:
        return N
    if mode == "time_based_aggressive_estimate":
        est = int(round(N * dt / dt_ref))
        return max(min_grid_size, min(max_grid_size, est))
    if dt > dt_ref and N < max_grid_size:
        return N + 1
    if dt < dt_ref and N > min_grid_size:
        return N - 1
    return N


def adapt_grid_nonuniform(primal: Primal, duals, *, control_box,
                          epsilon: float, dt_max: float,
                          min_grid_size: int, max_grid_size: int):
    """RedundantControls adaptation for the non-uniform per-stage-dt grid.

    Parity: ``cbr:optimal_control/structured_ocp/discretization_grids/
    non_uniform_finite_differences_variable_grid.h`` adaptation — the
    non-uniform grid places resolution where the *controls* change: an
    interval whose neighboring controls are (near-)identical is a redundant
    decision and gets merged into its neighbor; an interval across which the
    controls jump gets split in half. One structural edit per cycle (like
    the uniform single-step mode), host-side, with the warm-start primal and
    stage duals carried through the edit by explicit index maps.

    ``epsilon`` is the redundancy threshold on the per-interval control
    change, normalized by the control box ranges; the split threshold is
    2·epsilon (hysteresis — a just-merged pair does not immediately split).
    Returns (primal, duals, new_N); new_N == N means no edit.
    """
    import numpy as np

    us = np.asarray(primal.us)          # (N, nu)
    dt = np.asarray(primal.dt)          # (N,)
    N = us.shape[0]
    lo, hi = control_box
    rng = np.maximum(np.asarray(hi, dtype=float) - np.asarray(lo, dtype=float), 1e-9)
    e = np.max(np.abs(np.diff(us, axis=0)) / rng[None, :], axis=1)  # (N-1,)

    remove_k = split_k = None
    if N > min_grid_size and e.size and float(e.min()) < epsilon:
        k = int(np.argmin(e))  # merge interval k+1 into k
        if float(dt[k] + dt[k + 1]) <= dt_max:
            remove_k = k
    if remove_k is None and N < max_grid_size and e.size and float(e.max()) > 2.0 * epsilon:
        split_k = int(np.argmax(e))

    if remove_k is None and split_k is None:
        return primal, duals, N

    if remove_k is not None:
        k = remove_k
        keep_x = np.concatenate([np.arange(k + 1), np.arange(k + 2, N + 1)])
        keep_u = np.concatenate([np.arange(k + 1), np.arange(k + 2, N)])
        xs = jnp.take(primal.xs, jnp.asarray(keep_x), axis=-2)
        us_n = jnp.take(primal.us, jnp.asarray(keep_u), axis=-2)
        dt_n = jnp.asarray(
            np.concatenate([dt[:k], [dt[k] + dt[k + 1]], dt[k + 2:]]),
            primal.dt.dtype,
        )
        dual_ix = keep_u
        new_N = N - 1
    else:
        k = split_k
        from mpc_local_planner_tpu.core.so2 import se2_interpolate

        xa, xb = primal.xs[..., k, :], primal.xs[..., k + 1, :]
        xm = se2_interpolate(xa, xb, 0.5)
        xs = jnp.concatenate(
            [primal.xs[..., : k + 1, :], xm[..., None, :], primal.xs[..., k + 1 :, :]],
            axis=-2,
        )
        us_n = jnp.concatenate(
            [primal.us[..., : k + 1, :], primal.us[..., k : k + 1, :],
             primal.us[..., k + 1 :, :]],
            axis=-2,
        )
        dt_n = jnp.asarray(
            np.concatenate([dt[:k], [dt[k] / 2, dt[k] / 2], dt[k + 1:]]),
            primal.dt.dtype,
        )
        dual_ix = np.concatenate([np.arange(k + 1), [k], np.arange(k + 1, N)])
        new_N = N + 1

    ix = jnp.asarray(dual_ix)
    rs = lambda a: jnp.take(a, ix, axis=-2)  # noqa: E731
    # the per-interval dt-box multipliers are stage-indexed [hi, lo] pairs
    # flattened to (..., 2N) — remap them through the same index map
    mu_dt = duals.mu_dt
    if mu_dt.shape[-1] == 2 * N:
        s2 = mu_dt.shape[:-1] + (N, 2)
        mu_dt = rs(mu_dt.reshape(s2)).reshape(mu_dt.shape[:-1] + (2 * new_N,))
    duals = dataclasses.replace(
        duals,
        lam_def=rs(duals.lam_def),
        mu_obs=rs(duals.mu_obs),
        mu_rate=rs(duals.mu_rate),
        mu_box=rs(duals.mu_box),
        mu_dt=mu_dt,
    )
    return Primal(xs=xs, us=us_n, dt=dt_n), duals, new_N


def resize_primal(primal: Primal, new_N: int, spec=None) -> Primal:
    """Resample the trajectory onto a ``new_N``-stage grid, preserving the
    total horizon time T = N·dt (so dt' = dt·N/N').

    Parity: FiniteDifferencesVariableGridSE2 grid resizing — the reference
    inserts/erases vertices near the end; we SE(2)-interpolate the whole
    state path onto the new uniform grid (shortest-arc angle blending) and
    nearest-stage-sample the controls, which is equivalent up to the warm
    start the next solve refines anyway.
    """
    N = primal.n_stages
    if new_N == N:
        return primal
    dtype = primal.xs.dtype
    from mpc_local_planner_tpu.core.so2 import _wrap_theta, se2_boxminus

    pos = jnp.arange(new_N + 1, dtype=dtype) * (N / new_N)
    i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, N - 1)
    frac = (pos - i0.astype(dtype))[:, None]  # (new_N+1, 1), broadcasts over batch
    xa = jnp.take(primal.xs, i0, axis=-2)
    xb = jnp.take(primal.xs, i0 + 1, axis=-2)
    xs = _wrap_theta(xa + frac * se2_boxminus(xb, xa))
    iu = jnp.clip(
        jnp.round(jnp.arange(new_N, dtype=dtype) * (N / new_N)).astype(jnp.int32),
        0, N - 1,
    )
    us = jnp.take(primal.us, iu, axis=-2)
    dt = primal.dt * (N / new_N)
    if spec is not None:
        dt = jnp.clip(dt, max(spec.dt_min, 1e-3), spec.dt_max)
    return Primal(xs=xs, us=us, dt=dt)


def resize_duals(duals, new_N: int):
    """Nearest-stage resample of the stage-indexed AL multipliers onto a
    ``new_N``-stage grid (the dual-side counterpart of :func:`resize_primal`;
    scalars — terminal/dt/ball multipliers and ρ — carry over unchanged)."""
    N = duals.lam_def.shape[-2]
    if new_N == N:
        return duals
    idx = jnp.clip(
        jnp.round(jnp.arange(new_N) * (N / new_N)).astype(jnp.int32), 0, N - 1
    )
    rs = lambda a: jnp.take(a, idx, axis=-2)  # noqa: E731
    return dataclasses.replace(
        duals,
        lam_def=rs(duals.lam_def),
        mu_obs=rs(duals.mu_obs),
        mu_rate=rs(duals.mu_rate),
        mu_box=rs(duals.mu_box),
    )
