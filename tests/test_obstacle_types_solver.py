"""All four obstacle geometry types exercised through the full solver."""

import jax
import jax.numpy as jnp
import numpy as np

from mpc_local_planner_tpu.geometry.footprints import CircularFootprint
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


def test_mixed_obstacle_types_respected_by_solver():
    obs = ObstacleSet.from_lists(
        points=[(0.8, 0.4)],
        circles=[(1.3, -0.3, 0.2)],
        lines=[((1.7, 0.35), (2.0, 0.7))],
        polygons=[[(0.4, -0.65), (0.7, -0.65), (0.7, -0.35), (0.4, -0.35)]],
        dtype=jnp.float64,
    )
    spec = OcpSpec(
        model=UnicycleModel(), footprint=CircularFootprint(radius=0.15), N=25,
        objective="quadratic_form", q_diag=(2.0, 2.0, 1.0), r_diag=(1.0, 1.0),
        qf_diag=(20.0, 20.0, 5.0), dt_ref=0.3, min_obstacle_dist=0.08,
        obstacle_cap=obs.total_capacity, limits=LIMITS,
    )
    scen = Scenario.goal_only(
        jnp.array([0.0, 0.0, 0.0]), jnp.array([2.4, 0.0, 0.0]),
        obstacle_set=obs, dtype=jnp.float64,
    )
    settings = SolverSettings(n_al=12, n_sqp=12, rho0=10.0)
    init = initial_primal(spec, scen)
    duals = init_duals(spec, settings, dtype=jnp.float64)
    r = jax.jit(lambda s, i, d: solve_single(spec, settings, s, i, d))(
        scen, init, duals
    )
    assert bool(r.converged)
    d = spec.footprint.distances(r.primal.xs[1:], scen.obstacles)
    # all four obstacle slots respected at every stage
    assert float(jnp.min(d)) > spec.min_obstacle_dist - 1e-3
    # and the goal is still reached
    np.testing.assert_allclose(
        np.asarray(r.primal.xs[-1, :2]), np.asarray(scen.xf[:2]), atol=0.1
    )
