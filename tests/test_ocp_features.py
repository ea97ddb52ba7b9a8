"""Feature-matrix coverage: via points, dynamic obstacles, rate limits,
terminal ball, integral/hybrid costs.

Each test asserts the semantic effect of the feature on the solution
(the golden-match tests in test_solver_golden.py anchor exactness).
"""

import dataclasses as dc

import jax
import jax.numpy as jnp
import numpy as np

from mpc_local_planner_tpu.geometry.footprints import CircularFootprint, PointFootprint
from mpc_local_planner_tpu.geometry.obstacles import ObstacleSet
from mpc_local_planner_tpu.ocp.grid import initial_primal
from mpc_local_planner_tpu.ocp.spec import OcpSpec, Scenario
from mpc_local_planner_tpu.solvers.al_sqp import (
    SolverSettings,
    init_duals,
    solve_single,
)
from mpc_local_planner_tpu.systems.models import RobotLimits, UnicycleModel

LIMITS = RobotLimits(max_vel_x=0.4, max_vel_x_backwards=0.2, max_vel_theta=0.3)


def _solve(spec, scen, settings=None):
    settings = settings or SolverSettings.for_spec(spec)
    init = initial_primal(spec, scen)
    duals = init_duals(spec, settings, dtype=jnp.float64)
    return jax.jit(lambda s, i, d: solve_single(spec, settings, s, i, d))(
        scen, init, duals
    )


def test_via_points_attract_trajectory():
    spec = OcpSpec(
        model=UnicycleModel(), footprint=PointFootprint(), N=20,
        objective="minimum_time_via_points", variable_dt=True,
        dt_min=1e-3, dt_max=1.0, dt_ref=0.3, xf_fixed=(True, True, True),
        via_cap=1, via_position_weight=50.0, limits=LIMITS,
    )
    scen_free = Scenario.goal_only(
        jnp.array([0.0, 0.0, 0.0]), jnp.array([2.0, 0.0, 0.0]),
        via_cap=1, dtype=jnp.float64,
    )
    via = jnp.array([[1.0, 0.6, 0.0]])
    scen_via = dc.replace(
        scen_free, via_points=via, via_mask=jnp.array([True])
    )
    r_free = _solve(spec, scen_free)
    r_via = _solve(spec, scen_via)
    assert bool(r_via.converged)
    # with the via point active, the trajectory must pass near (1.0, 0.6)
    d_free = float(jnp.min(jnp.linalg.norm(r_free.primal.xs[:, :2] - via[0, :2], axis=1)))
    d_via = float(jnp.min(jnp.linalg.norm(r_via.primal.xs[:, :2] - via[0, :2], axis=1)))
    assert d_via < 0.15 < d_free


def test_dynamic_obstacle_prediction_shifts_avoidance():
    # obstacle starts LEFT of the path but moves right across it; with
    # dynamic prediction enabled the solver must anticipate the crossing
    obs = ObstacleSet.from_lists(
        circles=[(1.0, 0.8, 0.25)], circle_vels=[(0.0, -0.6)], dtype=jnp.float64
    )
    base = dict(
        model=UnicycleModel(), footprint=CircularFootprint(radius=0.15), N=20,
        objective="quadratic_form", q_diag=(2.0, 2.0, 2.0), r_diag=(1.0, 1.0),
        qf_diag=(20.0, 20.0, 20.0), dt_ref=0.3, min_obstacle_dist=0.1,
        obstacle_cap=1, limits=LIMITS,
    )
    scen = Scenario.goal_only(
        jnp.array([0.0, 0.0, 0.0]), jnp.array([2.0, 0.0, 0.0]),
        obstacle_set=obs, dtype=jnp.float64,
    )
    r_static = _solve(OcpSpec(**base, enable_dynamic_obstacles=False), scen,
                      SolverSettings(n_al=10, n_sqp=10))
    r_dyn = _solve(OcpSpec(**base, enable_dynamic_obstacles=True), scen,
                   SolverSettings(n_al=10, n_sqp=10))
    assert bool(r_dyn.converged)
    # static: obstacle at y=0.8 never blocks the straight path → straight
    ymax_static = float(jnp.max(jnp.abs(r_static.primal.xs[:, 1])))
    # dynamic: the obstacle crosses y=0 around t≈1.3s (stage ~4-5) → detour
    ymax_dyn = float(jnp.max(jnp.abs(r_dyn.primal.xs[:, 1])))
    assert ymax_static < 0.05
    assert ymax_dyn > 0.05
    # verify clearance against the PREDICTED obstacle positions
    from mpc_local_planner_tpu.ocp.constraints import obstacle_inequalities

    spec_dyn = OcpSpec(**base, enable_dynamic_obstacles=True)
    g = obstacle_inequalities(spec_dyn, r_dyn.primal.xs, r_dyn.primal.dt, scen)
    assert float(jnp.max(g)) < 1e-3


def test_control_rate_limits_bound_acceleration():
    limits = RobotLimits(
        max_vel_x=0.4, max_vel_x_backwards=0.2, max_vel_theta=0.3,
        acc_lim_x=0.2, dec_lim_x=0.2, acc_lim_theta=0.2,
    )
    spec = OcpSpec(
        model=UnicycleModel(), footprint=PointFootprint(), N=20,
        objective="quadratic_form", qf_diag=(10.0, 10.0, 10.0),
        dt_ref=0.3, limits=limits,
    )
    scen = Scenario.goal_only(
        jnp.array([0.0, 0.0, 0.0]), jnp.array([2.0, 1.0, 0.0]), dtype=jnp.float64
    )
    r = _solve(spec, scen, SolverSettings(n_al=10, n_sqp=10))
    assert bool(r.converged)
    us = np.asarray(r.primal.us)
    dt = float(r.primal.dt)
    du = np.diff(np.vstack([np.zeros((1, 2)), us]), axis=0) / dt
    assert np.max(du[:, 0]) <= 0.2 + 1e-3      # acc_lim_x
    assert np.min(du[:, 0]) >= -0.2 - 1e-3     # dec_lim_x
    assert np.max(np.abs(du[:, 1])) <= 0.2 + 1e-3


def test_terminal_ball_constrains_final_state():
    spec = OcpSpec(
        model=UnicycleModel(), footprint=PointFootprint(), N=15,
        objective="quadratic_form", q_diag=(0.1, 0.1, 0.1), r_diag=(1.0, 1.0),
        ball_weights=(1.0, 1.0, 0.0), ball_radius=0.3, dt_ref=0.3,
        limits=LIMITS,
    )
    scen = Scenario.goal_only(
        jnp.array([0.0, 0.0, 0.0]), jnp.array([1.5, 0.5, 0.0]), dtype=jnp.float64
    )
    r = _solve(spec, scen, SolverSettings(n_al=10, n_sqp=10))
    assert bool(r.converged)
    dxy = float(jnp.linalg.norm(r.primal.xs[-1, :2] - scen.xf[:2]))
    assert dxy <= 0.3 + 1e-3


def test_integral_form_and_hybrid_cost():
    mk = lambda **kw: OcpSpec(  # noqa: E731
        model=UnicycleModel(), footprint=PointFootprint(), N=15,
        objective="quadratic_form", qf_diag=(10.0, 10.0, 10.0),
        dt_ref=0.3, limits=LIMITS, **kw,
    )
    scen = Scenario.goal_only(
        jnp.array([0.0, 0.0, 0.0]), jnp.array([1.0, 0.5, 0.0]), dtype=jnp.float64
    )
    r_plain = _solve(mk(), scen)
    r_integral = _solve(mk(integral_form=True), scen)
    r_hybrid = _solve(mk(hybrid_time_weight=1.0), scen)
    for r in (r_plain, r_integral, r_hybrid):
        assert bool(r.converged)
    # integral form scales stage terms by dt (0.3): a different optimum
    assert abs(float(r_plain.cost) - float(r_integral.cost)) > 1e-3
    # fixed dt → the hybrid term only offsets the cost by w·N·dt
    np.testing.assert_allclose(
        float(r_hybrid.cost) - float(r_plain.cost), 15 * 0.3, atol=1e-2
    )
