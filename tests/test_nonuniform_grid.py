"""Non-uniform per-stage dt grid (grid.type: non_uniform_fd_grid).

Parity: cbr:optimal_control/structured_ocp/discretization_grids/
non_uniform_finite_differences_variable_grid.h ::
NonUniformFiniteDifferencesVariableGrid — every interval owns its dt
decision variable, dt bounds apply per stage, and the min-time objective
becomes Σ dt_k. Solved by every backend: the structured Riccati AL-SQP path
treats δdt_k as an extra control column of stage k (see
solvers/riccati.py::build_augmented_transition_nonuniform), and the
generic-AD solvers (lsq_lm soft-penalty LM, float64 golden) solve the flat
form.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_local_planner_tpu.geometry.footprints import PointFootprint
from mpc_local_planner_tpu.ocp.grid import initial_primal
from mpc_local_planner_tpu.ocp.problem import make_ocp_functions
from mpc_local_planner_tpu.ocp.spec import OcpSpec, Scenario
from mpc_local_planner_tpu.solvers.al_sqp import SolverSettings, init_duals
from mpc_local_planner_tpu.solvers.golden import solve_golden
from mpc_local_planner_tpu.solvers.lsq_lm import solve_single_lm
from mpc_local_planner_tpu.systems.models import RobotLimits, UnicycleModel

LIMITS = RobotLimits(max_vel_x=0.4, max_vel_x_backwards=0.2, max_vel_theta=0.3)


def _min_time_spec(N=12, nonuniform=True):
    return OcpSpec(
        model=UnicycleModel(),
        footprint=PointFootprint(),
        N=N,
        objective="minimum_time",
        variable_dt=True,
        nonuniform_dt=nonuniform,
        dt_min=1e-3,
        dt_max=1.0,
        dt_ref=0.3,
        xf_fixed=(True, True, True),
        limits=LIMITS,
    )


def _scen(dtype=jnp.float64):
    return Scenario.goal_only(
        x0=jnp.array([0.0, 0.0, 0.0]), xf=jnp.array([2.0, 1.0, 0.0]), dtype=dtype
    )


def test_spec_requires_variable_dt():
    with pytest.raises(ValueError, match="nonuniform_dt requires variable_dt"):
        OcpSpec(
            model=UnicycleModel(), footprint=PointFootprint(), N=5,
            nonuniform_dt=True,
        )


def test_primal_and_constraint_shapes():
    spec = _min_time_spec(N=7)
    scen = _scen()
    fns = make_ocp_functions(spec)
    p = initial_primal(spec, scen)
    assert p.dt.shape == (7,)
    assert fns.n_dt == 7
    z = fns.flatten(p)
    assert z.shape == (fns.n_free,)
    p2 = fns.unflatten(z, scen.x0)
    np.testing.assert_allclose(np.asarray(p2.dt), np.asarray(p.dt))
    assert fns.ineq(p, scen).shape == (fns.n_ineq,)
    assert fns.eq(p, scen).shape == (fns.n_eq,)


def test_costs_match_uniform_when_dt_constant():
    """With dt_k ≡ dt the non-uniform evaluators must reproduce the uniform
    ones exactly (cost, defects, and the dt-box inequalities)."""
    for integration in ("left_sum", "trapezoidal"):
        spec_u = dataclasses.replace(
            _min_time_spec(N=9, nonuniform=False),
            objective="quadratic_form",
            integral_form=True,
            cost_integration=integration,
            q_diag=(2.0, 2.0, 1.0),
            r_diag=(1.0, 0.5),
            xf_fixed=(False, False, False),
        )
        spec_n = dataclasses.replace(spec_u, nonuniform_dt=True)
        scen = _scen()
        fns_u, fns_n = make_ocp_functions(spec_u), make_ocp_functions(spec_n)
        key = jax.random.PRNGKey(0)
        p_u = initial_primal(spec_u, scen)
        xs = p_u.xs + 0.1 * jax.random.normal(key, p_u.xs.shape, p_u.xs.dtype)
        us = 0.2 * jax.random.normal(key, p_u.us.shape, p_u.us.dtype)
        p_u = dataclasses.replace(p_u, xs=xs, us=us)
        p_n = dataclasses.replace(
            p_u, dt=jnp.full((spec_n.N,), p_u.dt, p_u.xs.dtype)
        )
        np.testing.assert_allclose(
            float(fns_n.cost(p_n, scen)), float(fns_u.cost(p_u, scen)), rtol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(fns_n.eq(p_n, scen)), np.asarray(fns_u.eq(p_u, scen)),
            atol=1e-14,
        )


def test_lm_objective_residuals_reproduce_total_cost():
    """½‖r_obj‖² must equal total_cost for per-stage dt (incl. the non-uniform
    trapezoidal regrouping w_j = ½(dt_{j−1}+dt_j))."""
    from mpc_local_planner_tpu.solvers.lsq_lm import _objective_residuals

    scen = _scen()
    key = jax.random.PRNGKey(3)
    for objective, integral, integration in (
        ("minimum_time", False, "left_sum"),
        ("quadratic_form", True, "left_sum"),
        ("quadratic_form", True, "trapezoidal"),
    ):
        spec = dataclasses.replace(
            _min_time_spec(N=8),
            objective=objective,
            integral_form=integral,
            cost_integration=integration,
            q_diag=(2.0, 2.0, 1.0),
            r_diag=(1.0, 0.5),
            xf_fixed=(False, False, False),
            qf_diag=(3.0, 3.0, 3.0) if objective == "quadratic_form" else None,
        )
        fns = make_ocp_functions(spec)
        p = initial_primal(spec, scen)
        dt = p.dt * jax.random.uniform(
            key, p.dt.shape, p.dt.dtype, minval=0.5, maxval=1.5
        )
        p = dataclasses.replace(p, dt=dt)
        r = _objective_residuals(spec, p, scen)
        np.testing.assert_allclose(
            0.5 * float(jnp.sum(r * r)), float(fns.cost(p, scen)),
            rtol=1e-10, err_msg=f"{objective}/{integration}",
        )


def test_golden_nonuniform_min_time_beats_uniform():
    """The per-stage-dt feasible set contains the uniform one, so the
    non-uniform minimum time can only be ≤ the uniform optimum."""
    N = 12
    scen = _scen()
    sol_u, res_u = solve_golden(_min_time_spec(N, nonuniform=False), scen, tol=1e-12)
    assert res_u.status in (0, 8)
    spec_n = _min_time_spec(N, nonuniform=True)
    sol_n, res_n = solve_golden(spec_n, scen, tol=1e-12)
    assert res_n.status in (0, 8)
    assert sol_n.dt.shape == (N,)
    T_u = float(sol_u.dt) * N
    T_n = float(jnp.sum(sol_n.dt))
    assert T_n <= T_u * (1.0 + 1e-6), (T_n, T_u)
    # per-stage bounds hold and the fixed terminal state is reached
    assert float(jnp.min(sol_n.dt)) >= spec_n.dt_min - 1e-9
    assert float(jnp.max(sol_n.dt)) <= spec_n.dt_max + 1e-9
    np.testing.assert_allclose(
        np.asarray(sol_n.xs[-1]), np.asarray(scen.xf), atol=1e-6
    )


def test_lm_nonuniform_min_time_matches_golden():
    spec = _min_time_spec(N=12)
    scen = _scen()
    sol_g, res = solve_golden(spec, scen, tol=1e-12)
    assert res.status in (0, 8)
    st = SolverSettings(
        n_al=8, n_sqp=60, rho0=10.0, rho_growth=10.0, rho_max=1e8,
        tol_eq=1e-3, tol_ineq=1e-3,
    )
    init = initial_primal(spec, scen)
    duals = init_duals(spec, st, dtype=jnp.float64)
    r = jax.jit(lambda s, i, d: solve_single_lm(spec, st, s, i, d))(
        scen, init, duals
    )
    assert bool(r.converged), (float(r.eq_norm), float(r.ineq_viol))
    T_g = float(jnp.sum(sol_g.dt))
    T_a = float(jnp.sum(r.primal.dt))
    assert abs(T_a - T_g) / T_g < 5e-3, (T_a, T_g)
    np.testing.assert_allclose(
        np.asarray(r.primal.xs[-1]), np.asarray(scen.xf), atol=1e-4
    )


def test_al_sqp_nonuniform_min_time_matches_golden():
    """The structured Riccati path (δdt_k as an extra control column) reaches
    the same minimum time as the float64 golden on the per-stage-dt grid.

    Cold-started min-time on a non-uniform grid is a harder landscape than
    uniform (each interval can trade duration against its neighbours, and
    intervals parked on the dt_min floor are legitimate reparameterizations),
    so the budget is wider than the uniform golden tests use.
    """
    from mpc_local_planner_tpu.solvers.al_sqp import solve_single

    spec = _min_time_spec(N=12)
    scen = _scen()
    sol_g, res = solve_golden(spec, scen, tol=1e-12)
    assert res.status in (0, 8)
    st = SolverSettings(
        n_al=12, n_sqp=40, rho0=10.0, rho_growth=5.0, rho_max=1e8,
        tol_eq=1e-3, tol_ineq=1e-3,
    )
    init = initial_primal(spec, scen)
    duals = init_duals(spec, st, dtype=jnp.float64)
    r = jax.jit(lambda s, i, d: solve_single(spec, st, s, i, d))(
        scen, init, duals
    )
    assert bool(r.converged), (float(r.eq_norm), float(r.ineq_viol))
    assert r.primal.dt.shape == (12,)
    T_g = float(jnp.sum(sol_g.dt))
    T_a = float(jnp.sum(r.primal.dt))
    # same minimum time (the dt *profile* may differ: collapsing an interval
    # onto the floor and stretching a neighbour is time-neutral)
    assert abs(T_a - T_g) / T_g < 5e-3, (T_a, T_g)
    np.testing.assert_allclose(
        np.asarray(r.primal.xs[-1]), np.asarray(scen.xf), atol=1e-3
    )
    # per-stage bounds hold
    assert float(jnp.min(r.primal.dt)) >= spec.dt_min - 1e-9
    assert float(jnp.max(r.primal.dt)) <= spec.dt_max + 1e-9


def test_al_sqp_nonuniform_trapezoidal_matches_golden():
    """Quadratic-form + trapezoidal integration on the per-stage-dt grid: the
    structured path's stage regrouping (stage k carries ½(dt_{k-1}+dt_k)·lx_k,
    terminal carries ½·dt_{N-1}·lx_N) must reach the golden optimum."""
    from mpc_local_planner_tpu.solvers.al_sqp import solve_single

    spec = dataclasses.replace(
        _min_time_spec(N=10),
        objective="quadratic_form",
        integral_form=True,
        cost_integration="trapezoidal",
        q_diag=(2.0, 2.0, 1.0),
        r_diag=(1.0, 0.5),
        qf_diag=(10.0, 10.0, 4.0),
        xf_fixed=(False, False, False),
        hybrid_time_weight=0.5,
    )
    scen = _scen()
    sol_g, res = solve_golden(spec, scen, tol=1e-12)
    assert res.status in (0, 8)
    st = SolverSettings(
        n_al=12, n_sqp=40, rho0=10.0, rho_growth=5.0, rho_max=1e8,
        tol_eq=1e-3, tol_ineq=1e-3,
    )
    init = initial_primal(spec, scen)
    duals = init_duals(spec, st, dtype=jnp.float64)
    r = jax.jit(lambda s, i, d: solve_single(spec, st, s, i, d))(
        scen, init, duals
    )
    assert bool(r.converged), (float(r.eq_norm), float(r.ineq_viol))
    fns = make_ocp_functions(spec)
    c_g = float(fns.cost(sol_g, scen))
    c_a = float(fns.cost(r.primal, scen))
    # same objective value (the evaluator is shared, so this also pins the
    # stage-separable regrouping to the flat trapezoidal sum)
    assert c_a <= c_g * (1.0 + 5e-3), (c_a, c_g)


def test_config_lowering_and_guards():
    from mpc_local_planner_tpu.planner.config import load_config
    from mpc_local_planner_tpu.planner.controller import Controller

    yaml = """
robot:
  type: unicycle
grid:
  type: non_uniform_fd_grid
  grid_size_ref: 10
  variable_grid:
    enable: true
    min_dt: 0.001
    max_dt: 1.0
planning:
  objective:
    type: minimum_time
solver:
  type: lsq_lm
"""
    cfg = load_config(yaml)
    spec = cfg.to_ocp_spec()
    assert spec.nonuniform_dt and spec.variable_dt
    Controller(cfg)  # lsq_lm accepts the grid
    # the structured Riccati path accepts it too (δdt_k control column)
    Controller(load_config(yaml.replace("type: lsq_lm", "type: al_sqp")))

    with pytest.raises(ValueError, match="unknown grid type"):
        load_config(yaml.replace("non_uniform_fd_grid", "bogus_grid"))
