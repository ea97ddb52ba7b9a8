"""BASELINE.json configs #2 and #3 solved end-to-end and verified vs golden.

Config #2: diff-drive, 10 circular obstacles, quadratic cost + terminal
ball, N=30. Config #3: car-like (Ackermann) min-time, N=50, obstacles.
(Config #1 is covered in test_solver_golden; #4/#5 batched variants in
test_ensemble / test_mixed_ensemble.)
"""

import jax
import jax.numpy as jnp
import numpy as np

from mpc_local_planner_tpu.benchmarks import (
    config2_diffdrive_obstacles,
    config3_carlike_min_time,
)
from mpc_local_planner_tpu.geometry.obstacles import ObstacleSet
from mpc_local_planner_tpu.ocp.grid import initial_primal
from mpc_local_planner_tpu.ocp.problem import make_ocp_functions
from mpc_local_planner_tpu.ocp.spec import Scenario
from mpc_local_planner_tpu.solvers.al_sqp import (
    SolverSettings,
    init_duals,
    solve_single,
)
from mpc_local_planner_tpu.solvers.golden import solve_golden


def _ring_obstacles(n=10, cx=1.6, cy=0.0, r=1.0, orad=0.18):
    """n circles on a ring around the path midpoint, leaving a corridor."""
    ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
    keep = np.abs(np.sin(ang)) > 0.25  # leave entry/exit gaps on the x-axis
    circles = [
        (cx + r * np.cos(a), cy + r * np.sin(a), orad)
        for a, k in zip(ang, keep) if k
    ]
    while len(circles) < n:  # pad with far-away circles to fill capacity
        circles.append((100.0 + len(circles), 100.0, orad))
    return ObstacleSet.from_lists(circles=circles, dtype=jnp.float64)


def test_config2_diffdrive_obstacles_matches_golden():
    obs = _ring_obstacles()
    spec = config2_diffdrive_obstacles(N=30, obstacle_cap=10)
    scen = Scenario.goal_only(
        jnp.array([0.0, 0.0, 0.0]), jnp.array([3.2, 0.0, 0.0]),
        obstacle_set=obs, dtype=jnp.float64,
    )
    settings = SolverSettings(n_al=12, n_sqp=12, tol_eq=1e-4, tol_ineq=1e-4)
    init = initial_primal(spec, scen)
    duals = init_duals(spec, settings, dtype=jnp.float64)
    r = jax.jit(lambda s, i, d: solve_single(spec, settings, s, i, d))(
        scen, init, duals
    )
    assert bool(r.converged)
    # terminal ball satisfied
    dxy = float(jnp.linalg.norm(r.primal.xs[-1, :2] - scen.xf[:2]))
    assert dxy <= spec.ball_radius + 1e-3
    # obstacle clearance everywhere
    d = spec.footprint.distances(r.primal.xs[1:], scen.obstacles)
    assert float(jnp.min(d)) > spec.min_obstacle_dist - 1e-3
    # golden polish from our solution must not move (local optimality)
    sol_g, res = solve_golden(spec, scen, init=r.primal, tol=1e-10)
    assert res.status in (0, 8), res.message
    du = np.max(np.abs(np.asarray(r.primal.us) - np.asarray(sol_g.us)))
    assert du < 5e-3, du


def test_config3_carlike_min_time_n50_matches_golden():
    obs = _ring_obstacles(n=10, cx=1.6, r=1.2, orad=0.15)
    spec = config3_carlike_min_time(N=50, obstacle_cap=10)
    scen = Scenario.goal_only(
        jnp.array([0.0, 0.0, 0.0]), jnp.array([3.2, 0.0, 0.0]),
        obstacle_set=obs, dtype=jnp.float64,
    )
    settings = SolverSettings.for_spec(spec)
    init = initial_primal(spec, scen)
    duals = init_duals(spec, settings, dtype=jnp.float64)
    r = jax.jit(lambda s, i, d: solve_single(spec, settings, s, i, d))(
        scen, init, duals
    )
    assert bool(r.converged)
    np.testing.assert_allclose(
        np.asarray(r.primal.xs[-1]), np.asarray(scen.xf), atol=1e-3
    )
    d = spec.footprint.distances(r.primal.xs[1:], scen.obstacles)
    assert float(jnp.min(d)) > spec.min_obstacle_dist - 1e-3
    # golden agreement on the optimal horizon (controls are non-unique along
    # saturated min-time arcs; T* is the binding quantity — BASELINE's 1e-3)
    sol_g, res = solve_golden(spec, scen, init=r.primal, tol=1e-10)
    assert res.status in (0, 8), res.message
    T_a = float(r.primal.dt) * spec.N
    T_g = float(sol_g.dt) * spec.N
    assert abs(T_a - T_g) / T_g < 1e-3, (T_a, T_g)

    funcs = make_ocp_functions(spec)
    eq_g = float(jnp.max(jnp.abs(funcs.eq(sol_g, scen))))
    assert eq_g < 1e-6  # golden itself is feasible
