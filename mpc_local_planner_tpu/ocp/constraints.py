"""Inequality and equality constraint residuals.

Parity (file :: symbol):
  optimal_control/stage_inequality_se2.h       :: StageInequalitySE2
     - obstacle avoidance: min_obstacle_dist − dist(footprint(pose_k), obs) ≤ 0
       with dynamic obstacles extrapolated to the stage time (constant velocity)
     - control deviation (acceleration) bounds: (u_k − u_{k−1})/dt ∈ [lo, hi]
  optimal_control/final_state_conditions_se2.h :: TerminalBallSE2
     - ‖x_N ⊖ x_ref‖²_S − r² ≤ 0
  grid xf_fixed semantics (full_discretization_grid_base_se2.h): fixed terminal
     state components become equality constraints here (the reference fixes the
     vertex; a fixed-shape dense build constrains instead — same solution set).

Conventions: every inequality is g(z) ≤ 0; padded slots evaluate to a large
negative constant (inactive, zero gradient). Shapes are static functions of
``OcpSpec`` so batched solves compile once.
"""

from __future__ import annotations

import jax.numpy as jnp

from mpc_local_planner_tpu.core.so2 import se2_boxminus
from mpc_local_planner_tpu.geometry.obstacles import BIG_DISTANCE


def obstacle_inequalities(spec, xs, dt, scenario):
    """Per-stage obstacle terms, stages k = 1..N (x_0 is fixed).

    Returns (..., N, M) with M = spec.obstacle_cap. Inactive obstacle slots
    yield min_obstacle_dist − BIG_DISTANCE « 0.
    """
    if spec.obstacle_cap == 0:
        return jnp.zeros(xs.shape[:-2] + (spec.N, 0), dtype=xs.dtype)
    poses = xs[..., 1:, :]  # (..., N, 3)
    if spec.enable_dynamic_obstacles:
        # constant-velocity extrapolation to the stage times t_k = k·dt
        # (cumulative Σ dt_j on a non-uniform grid); dt stop-gradded —
        # predicted positions are stage data, not decision-dependent
        # (matches the reference's treatment).
        import jax

        dt_sg = jax.lax.stop_gradient(jnp.asarray(dt))
        if spec.nonuniform_dt:
            t = jnp.cumsum(dt_sg, axis=-1)
        else:
            t = jnp.arange(1, spec.N + 1, dtype=xs.dtype) * dt_sg
        obs_k = scenario.obstacles.predict_stages(t)
        d = spec.footprint.distances(poses, obs_k)
    else:
        d = spec.footprint.distances(poses, scenario.obstacles)
    return spec.min_obstacle_dist - d


def control_rate_inequalities(spec, us, dt, u_prev):
    """Acceleration bounds on control differences, stages k = 0..N-1.

    The reference bounds (u_k − u_{k−1})/dt ∈ [lo, hi]; we enforce the
    dt-scaled equivalent (identical feasible set for dt > 0):

      g_hi = (u_k − u_{k−1}) − hi·dt ≤ 0 ;  g_lo = lo·dt − (u_k − u_{k−1}) ≤ 0

    with u_{−1} = u_prev (the control applied last cycle). The scaled form has
    no 1/dt — its curvature stays bounded as the variable-dt solver explores
    small dt, where the quotient form's exact Hessian (∝ du/dt³) explodes.
    Unbounded entries (inf limits) map to always-inactive residuals.
    """
    lo, hi = spec.control_rate_box()
    # sanitize ±inf limits to a large finite sentinel BEFORE any arithmetic:
    # inf·dt inside a jnp.where still poisons the gradient (0·inf = NaN).
    lo = jnp.maximum(jnp.asarray(lo, dtype=us.dtype), -BIG_DISTANCE)
    hi = jnp.minimum(jnp.asarray(hi, dtype=us.dtype), BIG_DISTANCE)
    u_ext = jnp.concatenate([u_prev[..., None, :], us], axis=-2)
    du = u_ext[..., 1:, :] - u_ext[..., :-1, :]
    dt = jnp.asarray(dt)
    # per-stage dt (..., N) broadcasts over the nu axis only; scalar dt over both
    dtb = dt[..., None] if dt.ndim == us.ndim - 1 else dt[..., None, None]
    g_hi = du - hi * dtb
    g_lo = lo * dtb - du
    return jnp.concatenate([g_hi, g_lo], axis=-1)  # (..., N, 2*nu)


def control_box_inequalities(spec, us):
    """Input box u ∈ [u_min, u_max] as inequalities (..., N, 2*nu)."""
    lo, hi = spec.control_box()
    lo = jnp.asarray(lo, dtype=us.dtype)
    hi = jnp.asarray(hi, dtype=us.dtype)
    return jnp.concatenate([us - hi, lo - us], axis=-1)


def dt_inequalities(spec, dt, dtype):
    """dt ∈ [dt_min, dt_max] when dt is a decision variable; else inactive.

    Returns (..., 2) for scalar dt, (..., 2·N) flattened for per-stage dt
    (non-uniform grid: every interval owns its box — parity:
    cbr NonUniformFiniteDifferencesVariableGrid per-vertex dt bounds).
    """
    dt = jnp.asarray(dt, dtype=dtype)
    if not spec.variable_dt:
        z = jnp.full(dt.shape + (2,), -BIG_DISTANCE, dtype=dtype)
        return z
    g = jnp.stack([dt - spec.dt_max, spec.dt_min - dt], axis=-1)
    if spec.nonuniform_dt:
        return g.reshape(g.shape[:-2] + (-1,))
    return g


def terminal_ball_inequality(spec, xs, xf):
    """‖x_N ⊖ xf‖²_S − r² ≤ 0 (parity: TerminalBallSE2); inactive if r ≤ 0."""
    if spec.ball_radius <= 0.0:
        return jnp.full(xs.shape[:-2] + (1,), -BIG_DISTANCE, dtype=xs.dtype)
    s = jnp.asarray(spec.ball_weights, dtype=xs.dtype)
    dx = se2_boxminus(xs[..., -1, :], xf)
    return (jnp.sum(dx * dx * s, axis=-1) - spec.ball_radius**2)[..., None]


def terminal_equality(spec, xs, xf):
    """Masked fixed-terminal-state equality: xf_fixed[i] → (x_N ⊖ xf)_i = 0."""
    mask = jnp.asarray(spec.xf_fixed)
    dx = se2_boxminus(xs[..., -1, :], xf)
    return jnp.where(mask, dx, 0.0)
