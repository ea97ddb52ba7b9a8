"""cost_integration_method: left_sum vs trapezoidal (parity:
grid.cost_integration_method — corbo LeftSum / TrapezoidalRule)."""

import dataclasses as dc

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_local_planner_tpu.geometry.footprints import PointFootprint
from mpc_local_planner_tpu.ocp.costs import quadratic_form_cost
from mpc_local_planner_tpu.ocp.grid import Primal, initial_primal
from mpc_local_planner_tpu.ocp.spec import OcpSpec, Scenario
from mpc_local_planner_tpu.planner.config import load_config
from mpc_local_planner_tpu.solvers.al_sqp import (
    SolverSettings,
    init_duals,
    solve_single,
)
from mpc_local_planner_tpu.solvers.golden import solve_golden
from mpc_local_planner_tpu.systems.models import RobotLimits, UnicycleModel
from mpc_local_planner_tpu.core.so2 import se2_boxminus

RNG = np.random.default_rng(3)


def _spec(integration: str) -> OcpSpec:
    return OcpSpec(
        model=UnicycleModel(), footprint=PointFootprint(), N=12,
        objective="quadratic_form", q_diag=(2.0, 2.0, 1.0), r_diag=(1.0, 1.0),
        qf_diag=(10.0, 10.0, 5.0), integral_form=True,
        cost_integration=integration, dt_ref=0.3,
        limits=RobotLimits(max_vel_x=0.6, max_vel_x_backwards=0.2, max_vel_theta=0.6),
    )


def test_trapezoidal_cost_value_matches_hand_rule():
    """dt·Σ_k ½(lx_k + lx_{k+1}) + dt·Σ lu_k computed directly."""
    spec = _spec("trapezoidal")
    xs = jnp.asarray(RNG.normal(size=(13, 3)))
    us = jnp.asarray(RNG.normal(size=(12, 2)))
    dt = jnp.asarray(0.25)
    xref = jnp.asarray([1.0, -0.5, 0.3])
    got = float(quadratic_form_cost(spec, xs, us, dt, xref))

    q = np.asarray(spec.q_diag)
    r = np.asarray(spec.r_diag)
    dx = np.asarray(se2_boxminus(xs, xref))
    lx = np.sum(dx * dx * q, axis=-1)               # (13,)
    lu = np.sum(np.asarray(us) ** 2 * r, axis=-1)   # (12,)
    expect = float(dt) * (np.sum(0.5 * (lx[:-1] + lx[1:])) + np.sum(lu))
    np.testing.assert_allclose(got, expect, rtol=1e-12)

    # and left_sum differs on the same trajectory (sanity that the flag acts)
    got_left = float(quadratic_form_cost(_spec("left_sum"), xs, us, dt, xref))
    expect_left = float(dt) * (np.sum(lx[:-1]) + np.sum(lu))
    np.testing.assert_allclose(got_left, expect_left, rtol=1e-12)
    assert abs(got - got_left) > 1e-6


def test_trapezoidal_solver_matches_golden():
    spec = _spec("trapezoidal")
    scen = Scenario.goal_only(
        jnp.array([0.0, 0.0, 0.0]), jnp.array([1.5, 0.8, 0.6]), dtype=jnp.float64
    )
    settings = SolverSettings.for_spec(spec)
    init = initial_primal(spec, scen)
    duals = init_duals(spec, settings, dtype=jnp.float64)
    r = jax.jit(lambda s, i, d: solve_single(spec, settings, s, i, d))(
        scen, init, duals
    )
    assert bool(r.converged)
    sol_g, res = solve_golden(spec, scen, tol=1e-12)
    assert res.status in (0, 8), res.message
    np.testing.assert_allclose(
        np.asarray(r.primal.us), np.asarray(sol_g.us), atol=1e-3
    )
    # the two integration rules give genuinely different optima
    spec_l = _spec("left_sum")
    r_l = jax.jit(lambda s, i, d: solve_single(spec_l, settings, s, i, d))(
        scen, init, init_duals(spec_l, settings, dtype=jnp.float64)
    )
    assert float(jnp.max(jnp.abs(r.primal.us - r_l.primal.us))) > 1e-4


def test_config_plumbs_and_validates_cost_integration():
    cfg = load_config(
        """
grid:
  grid_size_ref: 12
  cost_integration_method: trapezoidal
planning:
  objective:
    type: quadratic_form
    quadratic_form:
      integral_form: true
"""
    )
    assert cfg.to_ocp_spec().cost_integration == "trapezoidal"
    with pytest.raises(ValueError, match="cost_integration"):
        load_config(
            "grid:\n  cost_integration_method: simpson\n"
        ).to_ocp_spec()
