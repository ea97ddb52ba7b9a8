"""AL-SQP vs float64 golden solver (scipy SLSQP) — BASELINE configs.

This is the correctness anchor substituting for the unrunnable C++ reference
(SURVEY.md §5, §8 step 3): same transcription, independent algorithm.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_local_planner_tpu.geometry.footprints import CircularFootprint, PointFootprint
from mpc_local_planner_tpu.geometry.obstacles import ObstacleSet
from mpc_local_planner_tpu.ocp.grid import initial_primal
from mpc_local_planner_tpu.ocp.spec import OcpSpec, Scenario
from mpc_local_planner_tpu.solvers.al_sqp import (
    SolverSettings,
    init_duals,
    solve_single,
)
from mpc_local_planner_tpu.solvers.golden import solve_golden
from mpc_local_planner_tpu.systems.models import RobotLimits, SimpleCarModel, UnicycleModel

LIMITS = RobotLimits(max_vel_x=0.4, max_vel_x_backwards=0.2, max_vel_theta=0.3)


def _solve_both(spec, scen, settings):
    sol_g, res = solve_golden(spec, scen, tol=1e-12)
    assert res.status in (0, 8), res.message  # 8 = line-search stall at the optimum
    init = initial_primal(spec, scen)
    duals = init_duals(spec, settings, dtype=jnp.float64)
    r = jax.jit(lambda s, i, d: solve_single(spec, settings, s, i, d))(
        scen, init, duals
    )
    return sol_g, r


def test_baseline1_unicycle_quadratic_matches_golden():
    """BASELINE config #1: unicycle, quadratic form, N=20, no obstacles."""
    spec = OcpSpec(
        model=UnicycleModel(),
        footprint=PointFootprint(),
        N=20,
        objective="quadratic_form",
        q_diag=(2.0, 2.0, 2.0),
        r_diag=(1.0, 1.0),
        qf_diag=(10.0, 10.0, 10.0),
        dt_ref=0.3,
        limits=LIMITS,
    )
    scen = Scenario.goal_only(
        x0=jnp.array([0.0, 0.0, 0.0]), xf=jnp.array([2.0, 1.0, 0.0]),
        dtype=jnp.float64,
    )
    sol_g, r = _solve_both(spec, scen, SolverSettings(n_al=8, n_sqp=10))
    assert bool(r.converged)
    du = np.max(np.abs(np.asarray(r.primal.us) - np.asarray(sol_g.us)))
    dx = np.max(np.abs(np.asarray(r.primal.xs) - np.asarray(sol_g.xs)))
    assert du < 1e-5, du
    assert dx < 1e-5, dx


def test_min_time_unicycle_matches_golden_horizon():
    """Min-time, variable dt, fixed terminal state: optimal time must match.

    (Time-optimal control sequences are non-unique along saturated arcs, so
    the binding comparison is T* and feasibility, not per-stage controls.)
    """
    spec = OcpSpec(
        model=UnicycleModel(),
        footprint=PointFootprint(),
        N=20,
        objective="minimum_time",
        variable_dt=True,
        dt_min=1e-3,
        dt_max=1.0,
        dt_ref=0.3,
        xf_fixed=(True, True, True),
        limits=LIMITS,
    )
    scen = Scenario.goal_only(
        x0=jnp.array([0.0, 0.0, 0.0]), xf=jnp.array([2.0, 1.0, 0.0]),
        dtype=jnp.float64,
    )
    sol_g, r = _solve_both(spec, scen, SolverSettings.for_spec(spec))
    assert bool(r.converged)
    T_g = float(sol_g.dt) * spec.N
    T_a = float(r.primal.dt) * spec.N
    assert abs(T_a - T_g) / T_g < 1e-3, (T_a, T_g)
    # terminal state reached
    np.testing.assert_allclose(
        np.asarray(r.primal.xs[-1]), np.asarray(scen.xf), atol=1e-4
    )


def test_obstacle_avoidance_matches_golden():
    """Quadratic objective + circular obstacle blocking the straight line."""
    obs = ObstacleSet.from_lists(circles=[(1.0, 0.45, 0.3)], dtype=jnp.float64)
    spec = OcpSpec(
        model=UnicycleModel(),
        footprint=CircularFootprint(radius=0.2),
        N=20,
        objective="quadratic_form",
        q_diag=(2.0, 2.0, 2.0),
        r_diag=(1.0, 1.0),
        qf_diag=(20.0, 20.0, 20.0),
        dt_ref=0.3,
        min_obstacle_dist=0.1,
        obstacle_cap=obs.total_capacity,
        limits=LIMITS,
    )
    scen = Scenario.goal_only(
        x0=jnp.array([0.0, 0.0, 0.0]), xf=jnp.array([2.0, 0.9, 0.0]),
        obstacle_set=obs, dtype=jnp.float64,
    )
    settings = SolverSettings(n_al=12, n_sqp=12, rho0=10.0)
    init = initial_primal(spec, scen)
    duals = init_duals(spec, settings, dtype=jnp.float64)
    r = jax.jit(lambda s, i, d: solve_single(spec, settings, s, i, d))(
        scen, init, duals
    )
    assert bool(r.converged)
    # the solver's trajectory must respect the clearance everywhere
    d = spec.footprint.distances(r.primal.xs[1:], scen.obstacles)
    assert float(jnp.min(d)) > spec.min_obstacle_dist - 1e-4
    # SLSQP cannot start from the (infeasible) straight-line init here; let it
    # polish the AL-SQP solution — if our point were not a local optimum,
    # SLSQP would move away from it.
    sol_g, res = solve_golden(spec, scen, init=r.primal, tol=1e-12)
    assert res.status in (0, 8), res.message  # 8 = line-search stall at the optimum
    # the valley is shallow: SLSQP's own terminal precision here is O(1e-3)
    # in u (its polished point is marginally WORSE in cost), so compare both
    # controls and objective value
    du = np.max(np.abs(np.asarray(r.primal.us) - np.asarray(sol_g.us)))
    assert du < 5e-3, du
    assert abs(float(r.cost) - res.fun) / res.fun < 1e-4


def test_carlike_quadratic_matches_golden():
    """Simple-car (Ackermann) model with steering bounds."""
    limits = RobotLimits(
        max_vel_x=0.4, max_vel_x_backwards=0.2, max_steering_angle=0.7
    )
    spec = OcpSpec(
        model=SimpleCarModel(wheelbase=0.5),
        footprint=PointFootprint(),
        N=20,
        objective="quadratic_form",
        q_diag=(2.0, 2.0, 1.0),
        r_diag=(1.0, 1.0),
        qf_diag=(20.0, 20.0, 5.0),
        dt_ref=0.3,
        limits=limits,
    )
    scen = Scenario.goal_only(
        x0=jnp.array([0.0, 0.0, 0.0]), xf=jnp.array([1.5, 0.8, 0.5]),
        dtype=jnp.float64,
    )
    sol_g, r = _solve_both(spec, scen, SolverSettings(n_al=12, n_sqp=12))
    assert bool(r.converged)
    du = np.max(np.abs(np.asarray(r.primal.us) - np.asarray(sol_g.us)))
    assert du < 1e-4, du


def test_batched_solve_matches_unbatched():
    """vmapped batch of scenarios reproduces per-scenario solves exactly."""
    spec = OcpSpec(
        model=UnicycleModel(), footprint=PointFootprint(), N=10,
        objective="quadratic_form", qf_diag=(10.0, 10.0, 10.0),
        dt_ref=0.3, limits=LIMITS,
    )
    settings = SolverSettings(n_al=4, n_sqp=6)
    goals = jnp.array([[1.0, 0.5, 0.0], [0.8, -0.7, 1.0], [1.5, 0.0, -0.5]],
                      dtype=jnp.float64)
    x0 = jnp.zeros((3, 3), dtype=jnp.float64)
    scen = Scenario.goal_only(x0=x0, xf=goals, dtype=jnp.float64)
    init = initial_primal(spec, scen)
    duals = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (3,) + a.shape),
        init_duals(spec, settings, dtype=jnp.float64),
    )
    rb = jax.jit(jax.vmap(lambda s, i, d: solve_single(spec, settings, s, i, d)))(
        scen, init, duals
    )
    for b in range(3):
        scen_b = jax.tree_util.tree_map(lambda a: a[b], scen)
        init_b = jax.tree_util.tree_map(lambda a: a[b], init)
        duals_b = init_duals(spec, settings, dtype=jnp.float64)
        r1 = solve_single(spec, settings, scen_b, init_b, duals_b)
        np.testing.assert_allclose(
            np.asarray(rb.primal.us[b]), np.asarray(r1.primal.us), atol=1e-10
        )
