"""Finite-difference collocation on SE(2).

Parity: ``optimal_control/fd_collocation_se2.h`` (forward / midpoint /
Crank-Nicolson SE(2) collocation terms) and the equality edges built by
``optimal_control/finite_differences_grid_se2.h :: createEdges``.

The reference's residual is ``(x_{k+1} ⊖ x_k)/dt − f(·)`` per stage, with the
θ-difference wrapped on SO(2). We use the dt-scaled *defect* form

    c_k = (x_k ⊞ dt·φ(x_k, u_k, x_{k+1})) ⊖ x_{k+1}

(same zero set, better conditioned for the Riccati QP solve because
∂c/∂x_{k+1} ≈ −I). All functions are stage-vectorized over k and over
arbitrary leading batch dims; no Python control flow depends on data.
"""

from __future__ import annotations

import jax.numpy as jnp

from mpc_local_planner_tpu.core.so2 import _wrap_theta as _wrap
from mpc_local_planner_tpu.core.so2 import se2_interpolate


def _phi_forward(model, xk, uk, xk1):
    return model.f(xk, uk)


def _phi_midpoint(model, xk, uk, xk1):
    # SE(2)-aware midpoint: θ interpolated along the shortest arc.
    xm = se2_interpolate(xk, xk1, 0.5)
    return model.f(xm, uk)


def _phi_crank_nicolson(model, xk, uk, xk1):
    return 0.5 * (model.f(xk, uk) + model.f(xk1, uk))


COLLOCATION_METHODS = {
    "forward_differences": _phi_forward,
    "midpoint_differences": _phi_midpoint,
    "crank_nicolson_differences": _phi_crank_nicolson,
}

# Multiple-shooting transcription (parity: cbr:optimal_control
# structured_ocp/discretization_grids/multiple_shooting_grid.h — one shooting
# node per stage, explicit RK integration across the interval). The defect is
#   c_k = Φ(x_k, u_k, dt) ⊖ x_{k+1}
# with Φ an explicit integrator step (numerics/integrators.py). Method names:
# "shooting_<integrator>[_<substeps>]", e.g. "shooting_rk4", "shooting_rk4_4".
SHOOTING_PREFIX = "shooting_"


def _parse_shooting(method: str):
    rest = method[len(SHOOTING_PREFIX) :]
    parts = rest.rsplit("_", 1)
    if len(parts) == 2 and parts[1].isdigit():
        return parts[0], int(parts[1])
    return rest, 1


def _shooting_pred(model, method: str, xk, uk, dt):
    from mpc_local_planner_tpu.numerics.integrators import integrate

    integ, substeps = _parse_shooting(method)
    return integrate(model.f, xk, uk, dt, method=integ, substeps=substeps)


def stage_defect(model, method: str, xk, uk, xk1, dt):
    """Single-stage transcription defect c_k (shape (..., 3))."""
    if method.startswith(SHOOTING_PREFIX):
        dt_ = dt[..., None] if jnp.ndim(dt) else dt
        pred = _shooting_pred(model, method, xk, uk, dt_)
    else:
        phi = COLLOCATION_METHODS[method]
        f = phi(model, xk, uk, xk1)
        pred = xk + (dt[..., None] * f if jnp.ndim(dt) else dt * f)
    return _wrap(pred - xk1)


def collocation_defects(model, method: str, xs, us, dt):
    """All N stage defects for a trajectory.

    xs: (..., N+1, 3); us: (..., N, nu); dt: (...,) scalar per trajectory.
    Returns (..., N, 3). The equality constraint of the OCP is defects == 0.
    """
    xk = xs[..., :-1, :]
    xk1 = xs[..., 1:, :]
    dt = jnp.asarray(dt)
    # dt is scalar-per-trajectory (ndim = xs.ndim − 2) or per-stage
    # (..., N) on a non-uniform grid (ndim = xs.ndim − 1); both broadcast
    # against the (..., N, 3) stage axis.
    dt_b = dt[..., None] if dt.ndim == xs.ndim - 1 else dt[..., None, None]
    if method.startswith(SHOOTING_PREFIX):
        pred = _shooting_pred(model, method, xk, us, dt_b)
    else:
        phi = COLLOCATION_METHODS[method]
        pred = xk + dt_b * phi(model, xk, us, xk1)
    return _wrap(pred - xk1)
