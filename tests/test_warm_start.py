"""Warm-start machinery unit tests: shift, resample, dual shifting."""

import jax.numpy as jnp
import numpy as np

from mpc_local_planner_tpu.benchmarks import config1_unicycle_quadratic, config3_carlike_min_time
from mpc_local_planner_tpu.ocp.grid import (
    Primal,
    warm_start_resample,
    warm_start_shift,
)
from mpc_local_planner_tpu.ocp.problem import make_ocp_functions
from mpc_local_planner_tpu.solvers.al_sqp import SolverSettings, init_duals, shift_duals


def _straight_primal(spec, v=0.3):
    """A dynamically consistent straight-line trajectory."""
    dt = spec.dt_ref
    k = jnp.arange(spec.N + 1, dtype=jnp.float64)
    xs = jnp.stack([v * dt * k, jnp.zeros_like(k), jnp.zeros_like(k)], axis=-1)
    us = jnp.tile(jnp.array([[v, 0.0]]), (spec.N, 1))
    return Primal(xs=xs, us=us, dt=jnp.asarray(dt, jnp.float64))


def test_shift_preserves_feasibility_with_dynamics_tail():
    spec = config1_unicycle_quadratic(N=8)
    p = _straight_primal(spec)
    funcs = make_ocp_functions(spec)
    np.testing.assert_allclose(np.asarray(funcs.defects(p)), 0.0, atol=1e-12)
    x0_new = p.xs[1]
    p2 = warm_start_shift(p, x0_new, steps=1, spec=spec)
    # the extrapolated tail keeps the shifted trajectory exactly feasible
    np.testing.assert_allclose(np.asarray(funcs.defects(p2)), 0.0, atol=1e-9)
    np.testing.assert_allclose(np.asarray(p2.xs[0]), np.asarray(x0_new))


def test_resample_is_terminal_anchored_and_rescales_dt():
    spec = config3_carlike_min_time(N=10, obstacle_cap=0)
    p = _straight_primal(spec, v=0.4)
    xf = p.xs[-1]
    p2 = warm_start_resample(p, p.xs[1], steps=1, spec=spec)
    # terminal state preserved; dt shrunk by (N-1)/N
    np.testing.assert_allclose(np.asarray(p2.xs[-1]), np.asarray(xf), atol=1e-9)
    np.testing.assert_allclose(
        float(p2.dt), float(p.dt) * (spec.N - 1) / spec.N, atol=1e-12
    )
    np.testing.assert_allclose(np.asarray(p2.xs[0]), np.asarray(p.xs[1]), atol=1e-12)


def test_shift_duals_rolls_stage_multipliers_and_resets_rho():
    spec = config1_unicycle_quadratic(N=5)
    st = SolverSettings(rho0=25.0)
    d = init_duals(spec, st, dtype=jnp.float64)
    import dataclasses as dc

    d = dc.replace(
        d,
        lam_def=jnp.arange(15.0).reshape(5, 3),
        mu_box=jnp.arange(20.0).reshape(5, 4),
        rho=jnp.asarray(1e6),
    )
    d2 = shift_duals(d, st, steps=1)
    np.testing.assert_allclose(np.asarray(d2.lam_def[0]), np.asarray(d.lam_def[1]))
    np.testing.assert_allclose(np.asarray(d2.lam_def[-1]), np.asarray(d.lam_def[-1]))
    np.testing.assert_allclose(np.asarray(d2.mu_box[2]), np.asarray(d.mu_box[3]))
    assert float(d2.rho) == 25.0
