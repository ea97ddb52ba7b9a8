"""lsq_lm solver (Levenberg–Marquardt with soft penalties) vs golden + AL-SQP.

Parity: cbr:optimization/solver/levenberg_marquardt_dense.h ::
LevenbergMarquardtDense — the reference's fallback solver. Soft quadratic
penalties converge to the constrained optimum as the weights grow, so the
comparisons below use tolerances matched to the final penalty weight, not
machine precision.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mpc_local_planner_tpu.geometry.footprints import PointFootprint
from mpc_local_planner_tpu.geometry.obstacles import ObstacleSet
from mpc_local_planner_tpu.ocp.grid import initial_primal
from mpc_local_planner_tpu.ocp.spec import OcpSpec, Scenario
from mpc_local_planner_tpu.solvers.al_sqp import SolverSettings, init_duals
from mpc_local_planner_tpu.solvers.golden import solve_golden
from mpc_local_planner_tpu.solvers.lsq_lm import solve_single_lm
from mpc_local_planner_tpu.systems.models import RobotLimits, UnicycleModel

LIMITS = RobotLimits(max_vel_x=0.4, max_vel_x_backwards=0.2, max_vel_theta=0.3)

LM_SETTINGS = SolverSettings(
    n_al=8, n_sqp=40, rho0=10.0, rho_growth=10.0, rho_max=1e8,
    tol_eq=1e-3, tol_ineq=1e-3,
)


def _quadratic_spec(N=20):
    return OcpSpec(
        model=UnicycleModel(),
        footprint=PointFootprint(),
        N=N,
        objective="quadratic_form",
        q_diag=(2.0, 2.0, 2.0),
        r_diag=(1.0, 1.0),
        qf_diag=(10.0, 10.0, 10.0),
        dt_ref=0.3,
        limits=LIMITS,
    )


def _lm_solve(spec, scen, settings=LM_SETTINGS):
    init = initial_primal(spec, scen)
    duals = init_duals(spec, settings, dtype=jnp.float64)
    return jax.jit(lambda s, i, d: solve_single_lm(spec, settings, s, i, d))(
        scen, init, duals
    )


def test_lm_quadratic_matches_golden():
    spec = _quadratic_spec()
    scen = Scenario.goal_only(
        x0=jnp.array([0.0, 0.0, 0.0]), xf=jnp.array([2.0, 1.0, 0.0]),
        dtype=jnp.float64,
    )
    sol_g, res = solve_golden(spec, scen, tol=1e-12)
    assert res.status in (0, 8)
    r = _lm_solve(spec, scen)
    assert bool(r.converged), (float(r.eq_norm), float(r.ineq_viol))
    # soft-penalty optimum approaches the constrained one as weights grow
    dx = np.max(np.abs(np.asarray(r.primal.xs) - np.asarray(sol_g.xs)))
    du = np.max(np.abs(np.asarray(r.primal.us) - np.asarray(sol_g.us)))
    assert dx < 5e-3, dx
    assert du < 5e-3, du


def test_lm_min_time_matches_golden_horizon():
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
    sol_g, res = solve_golden(spec, scen, tol=1e-12)
    assert res.status in (0, 8)
    # min-time has near-zero objective curvature — the LM fallback needs a
    # deep inner budget (measured: 8×60 reaches T* to 1e-5 rel; 6×25 stalls
    # at +18%); same pattern as the AL-SQP min-time preset
    st = SolverSettings(
        n_al=8, n_sqp=60, rho0=10.0, rho_growth=10.0, rho_max=1e8,
        tol_eq=1e-3, tol_ineq=1e-3,
    )
    r = _lm_solve(spec, scen, st)
    assert bool(r.converged)
    T_g = float(sol_g.dt) * spec.N
    T_a = float(r.primal.dt) * spec.N
    assert abs(T_a - T_g) / T_g < 1e-3, (T_a, T_g)
    np.testing.assert_allclose(
        np.asarray(r.primal.xs[-1]), np.asarray(scen.xf), atol=1e-4
    )


def test_lm_obstacle_avoidance_clears_margin():
    obs = ObstacleSet.from_lists(circles=[(1.0, 0.45, 0.3)], dtype=jnp.float64)
    spec = _quadratic_spec()
    spec = __import__("dataclasses").replace(
        spec, obstacle_cap=obs.total_capacity, min_obstacle_dist=0.1
    )
    scen = Scenario.goal_only(
        x0=jnp.array([0.0, 0.0, 0.0]), xf=jnp.array([2.0, 1.0, 0.0]),
        dtype=jnp.float64,
    )
    scen = __import__("dataclasses").replace(scen, obstacles=obs)
    r = _lm_solve(spec, scen)
    # every trajectory point clears the obstacle by ~the margin (soft: small
    # residual violation allowed)
    d = np.linalg.norm(np.asarray(r.primal.xs)[:, :2] - np.array([1.0, 0.45]), axis=1)
    assert np.min(d) > 0.3 + 0.1 - 5e-3, np.min(d)


def test_controller_dispatch_lsq_lm_reaches_goal():
    from mpc_local_planner_tpu.planner.config import load_config
    from mpc_local_planner_tpu.planner.controller import Controller

    yaml = """
robot:
  type: unicycle
  unicycle:
    max_vel_x: 0.4
    max_vel_x_backwards: 0.2
    max_vel_theta: 0.3
grid:
  grid_size_ref: 15
  dt_ref: 0.3
planning:
  objective:
    type: quadratic_form
    quadratic_form:
      state_weights: [2.0, 2.0, 2.0]
      control_weights: [1.0, 1.0]
  terminal_cost:
    type: quadratic
    quadratic:
      final_state_weights: [10.0, 10.0, 10.0]
collision:
  min_obstacle_dist: 0.2
  obstacle_capacity: 0
solver:
  type: lsq_lm
  iterations: 4
  inner_iterations: 15
  rho0: 10.0
  rho_growth: 10.0
footprint_model:
  type: circular
  radius: 0.2
"""
    cfg = load_config(yaml)
    ctrl = Controller(cfg, dtype=jnp.float32)
    spec = ctrl.spec
    x = jnp.array([0.0, 0.0, 0.0], dtype=jnp.float32)
    goal = jnp.array([1.2, 0.6, float(np.arctan2(0.6, 1.2))], dtype=jnp.float32)
    import dataclasses as dc

    reached = False
    for _cycle in range(60):
        scen = Scenario.goal_only(x, goal, nu=spec.nu, via_cap=0, dtype=jnp.float32)
        scen = dc.replace(scen, obstacles=ObstacleSet.empty(0, 0, 0, 0, dtype=jnp.float32))
        res = ctrl.step(scen)
        x = x + spec.dt_ref * spec.model.f(x, res.u0)
        if ctrl.is_goal_reached(x, goal):
            reached = True
            break
    assert reached, np.asarray(x)


def test_unknown_solver_type_rejected():
    import pytest

    from mpc_local_planner_tpu.planner.config import load_config
    from mpc_local_planner_tpu.planner.controller import Controller

    yaml = """
robot:
  type: unicycle
solver:
  type: bogus
"""
    with pytest.raises(ValueError, match="unknown solver.type"):
        Controller(load_config(yaml))
