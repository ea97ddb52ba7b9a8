"""Midpoint / Crank-Nicolson collocation at the solver level vs golden.

(Forward differences is exercised throughout; these pin the other two
reference collocation rules end-to-end.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_local_planner_tpu.geometry.footprints import PointFootprint
from mpc_local_planner_tpu.ocp.grid import initial_primal
from mpc_local_planner_tpu.ocp.spec import OcpSpec, Scenario
from mpc_local_planner_tpu.solvers.al_sqp import (
    SolverSettings,
    init_duals,
    solve_single,
)
from mpc_local_planner_tpu.solvers.golden import solve_golden
from mpc_local_planner_tpu.systems.models import RobotLimits, UnicycleModel

LIMITS = RobotLimits(max_vel_x=0.4, max_vel_x_backwards=0.2, max_vel_theta=0.3)


@pytest.mark.parametrize(
    "colloc", ["midpoint_differences", "crank_nicolson_differences"]
)
def test_collocation_rule_matches_golden(colloc):
    spec = OcpSpec(
        model=UnicycleModel(), footprint=PointFootprint(), N=15,
        collocation=colloc, objective="quadratic_form",
        q_diag=(2.0, 2.0, 2.0), r_diag=(1.0, 1.0), qf_diag=(10.0, 10.0, 10.0),
        dt_ref=0.3, limits=LIMITS,
    )
    scen = Scenario.goal_only(
        jnp.array([0.0, 0.0, 0.0]), jnp.array([1.5, 0.8, 0.3]), dtype=jnp.float64
    )
    settings = SolverSettings(n_al=10, n_sqp=10)
    init = initial_primal(spec, scen)
    duals = init_duals(spec, settings, dtype=jnp.float64)
    r = jax.jit(lambda s, i, d: solve_single(spec, settings, s, i, d))(
        scen, init, duals
    )
    assert bool(r.converged), colloc
    sol_g, res = solve_golden(spec, scen, tol=1e-12)
    assert res.status in (0, 8), res.message
    du = np.max(np.abs(np.asarray(r.primal.us) - np.asarray(sol_g.us)))
    assert du < 1e-4, (colloc, du)


def test_collocation_rules_differ_from_forward():
    """The three rules must actually produce different discrete solutions."""
    sols = {}
    for colloc in (
        "forward_differences", "midpoint_differences", "crank_nicolson_differences"
    ):
        spec = OcpSpec(
            model=UnicycleModel(), footprint=PointFootprint(), N=10,
            collocation=colloc, objective="quadratic_form",
            qf_diag=(10.0, 10.0, 10.0), dt_ref=0.4, limits=LIMITS,
        )
        scen = Scenario.goal_only(
            jnp.array([0.0, 0.0, 0.0]), jnp.array([1.0, 0.6, 0.8]),
            dtype=jnp.float64,
        )
        settings = SolverSettings(n_al=8, n_sqp=8)
        init = initial_primal(spec, scen)
        duals = init_duals(spec, settings, dtype=jnp.float64)
        r = solve_single(spec, settings, scen, init, duals)
        sols[colloc] = np.asarray(r.primal.us)
    d1 = np.max(np.abs(sols["forward_differences"] - sols["midpoint_differences"]))
    d2 = np.max(np.abs(sols["midpoint_differences"] - sols["crank_nicolson_differences"]))
    assert d1 > 1e-3 and d2 > 1e-3
