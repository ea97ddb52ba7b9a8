"""Model-family coverage at the solver level: kinematic bicycle, front-wheel
car, and backward motion — each verified against the float64 golden solver.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mpc_local_planner_tpu.geometry.footprints import PointFootprint
from mpc_local_planner_tpu.ocp.grid import initial_primal
from mpc_local_planner_tpu.ocp.spec import OcpSpec, Scenario
from mpc_local_planner_tpu.solvers.al_sqp import (
    SolverSettings,
    init_duals,
    solve_single,
)
from mpc_local_planner_tpu.solvers.golden import solve_golden
from mpc_local_planner_tpu.systems.models import (
    KinematicBicycleModelVelocityInput,
    RobotLimits,
    SimpleCarFrontWheelDrivingModel,
    UnicycleModel,
)


def _both(spec, scen, settings):
    init = initial_primal(spec, scen)
    duals = init_duals(spec, settings, dtype=jnp.float64)
    r = jax.jit(lambda s, i, d: solve_single(spec, settings, s, i, d))(
        scen, init, duals
    )
    assert bool(r.converged)
    sol_g, res = solve_golden(spec, scen, init=r.primal, tol=1e-11)
    assert res.status in (0, 8), res.message
    du = np.max(np.abs(np.asarray(r.primal.us) - np.asarray(sol_g.us)))
    return r, du


def test_kinematic_bicycle_quadratic_matches_golden():
    spec = OcpSpec(
        model=KinematicBicycleModelVelocityInput(lf=0.25, lr=0.25),
        footprint=PointFootprint(), N=20, objective="quadratic_form",
        q_diag=(2.0, 2.0, 1.0), r_diag=(1.0, 1.0), qf_diag=(20.0, 20.0, 5.0),
        dt_ref=0.3,
        limits=RobotLimits(max_vel_x=0.4, max_vel_x_backwards=0.2, max_steering_angle=0.9),
    )
    scen = Scenario.goal_only(
        jnp.array([0.0, 0.0, 0.0]), jnp.array([1.5, 0.7, 0.4]), dtype=jnp.float64
    )
    _, du = _both(spec, scen, SolverSettings(n_al=12, n_sqp=12))
    assert du < 1e-3, du


def test_front_wheel_drive_car_matches_golden():
    spec = OcpSpec(
        model=SimpleCarFrontWheelDrivingModel(wheelbase=0.5),
        footprint=PointFootprint(), N=20, objective="quadratic_form",
        q_diag=(2.0, 2.0, 1.0), r_diag=(1.0, 1.0), qf_diag=(20.0, 20.0, 5.0),
        dt_ref=0.3,
        limits=RobotLimits(max_vel_x=0.4, max_vel_x_backwards=0.2, max_steering_angle=0.9),
    )
    scen = Scenario.goal_only(
        jnp.array([0.0, 0.0, 0.0]), jnp.array([1.4, 0.6, 0.3]), dtype=jnp.float64
    )
    _, du = _both(spec, scen, SolverSettings(n_al=12, n_sqp=12))
    assert du < 1e-3, du


def test_backward_motion_respects_asymmetric_speed_limit():
    """Goal directly behind the robot: reverse at max_vel_x_backwards."""
    spec = OcpSpec(
        model=UnicycleModel(), footprint=PointFootprint(), N=20,
        objective="quadratic_form", q_diag=(2.0, 2.0, 2.0), r_diag=(0.1, 0.1),
        qf_diag=(20.0, 20.0, 20.0), dt_ref=0.3,
        limits=RobotLimits(max_vel_x=0.4, max_vel_x_backwards=0.15, max_vel_theta=0.3),
    )
    scen = Scenario.goal_only(
        jnp.array([0.0, 0.0, 0.0]), jnp.array([-0.8, 0.0, 0.0]), dtype=jnp.float64
    )
    r, du = _both(spec, scen, SolverSettings(n_al=10, n_sqp=10))
    us = np.asarray(r.primal.us)
    assert us[:, 0].min() >= -0.15 - 1e-4   # asymmetric backward bound
    assert us[:, 0].min() < -0.1            # it actually reverses
    assert du < 1e-3, du
