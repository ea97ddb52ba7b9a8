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
    v = jnp.sum(disp * heading, axis=-1) / dt[..., None]
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
    dt = jnp.full(batch, spec.dt_ref, dtype=scenario.x0.dtype)
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
    xs = se2_interpolate(pa, pb, frac[..., None])
    xs = xs.at[..., 0, :].set(x0)
    batch = xs.shape[:-2]
    us = jnp.zeros(batch + (spec.N, spec.nu), dtype=xs.dtype)
    dtv = jnp.full(batch, spec.dt_ref if dt is None else dt, dtype=xs.dtype)
    return Primal(xs=xs, us=us, dt=dtv)


def warm_start_shift(primal: Primal, x0, steps: int = 1) -> Primal:
    """Shift the previous solution by ``steps`` stages and re-anchor x_0.

    Parity: FullDiscretizationGridBaseSE2 warm start — shift trajectory by the
    elapsed interval, append the tail by repeating the final state/control.
    Fixed-shape: a roll + masked overwrite of the tail.
    """
    N = primal.n_stages
    k = jnp.arange(N + 1)
    src = jnp.minimum(k + steps, N)
    xs = jnp.take(primal.xs, src, axis=-2)
    ku = jnp.arange(N)
    src_u = jnp.minimum(ku + steps, N - 1)
    us = jnp.take(primal.us, src_u, axis=-2)
    xs = xs.at[..., 0, :].set(x0)
    return Primal(xs=xs, us=us, dt=primal.dt)
