"""minimum_time_via_points objective vs the float64 golden solver."""

import dataclasses as dc

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
from mpc_local_planner_tpu.systems.models import RobotLimits, UnicycleModel


def test_min_time_via_points_matches_golden():
    spec = OcpSpec(
        model=UnicycleModel(), footprint=PointFootprint(), N=20,
        objective="minimum_time_via_points", variable_dt=True,
        dt_min=1e-3, dt_max=1.0, dt_ref=0.3, xf_fixed=(True, True, True),
        via_cap=2, via_position_weight=100.0,
        limits=RobotLimits(max_vel_x=0.4, max_vel_x_backwards=0.2, max_vel_theta=0.4),
    )
    scen = Scenario.goal_only(
        jnp.array([0.0, 0.0, 0.0]), jnp.array([2.0, 0.0, 0.0]),
        via_cap=2, dtype=jnp.float64,
    )
    scen = dc.replace(
        scen,
        via_points=jnp.array([[0.7, 0.35, 0.0], [1.4, -0.3, 0.0]]),
        via_mask=jnp.array([True, True]),
    )
    settings = SolverSettings.for_spec(spec)
    init = initial_primal(spec, scen)
    duals = init_duals(spec, settings, dtype=jnp.float64)
    r = jax.jit(lambda s, i, d: solve_single(spec, settings, s, i, d))(
        scen, init, duals
    )
    assert bool(r.converged)
    # trajectory passes near both via points
    for vp in np.asarray(scen.via_points):
        dmin = float(
            jnp.min(jnp.linalg.norm(r.primal.xs[:, :2] - jnp.asarray(vp[:2]), axis=1))
        )
        assert dmin < 0.15, (vp, dmin)
    # golden polish stays put (same local optimum, T* agreement)
    sol_g, res = solve_golden(spec, scen, init=r.primal, tol=1e-11)
    assert res.status in (0, 8), res.message
    T_a = float(r.primal.dt) * spec.N
    T_g = float(sol_g.dt) * spec.N
    assert abs(T_a - T_g) / T_g < 2e-3, (T_a, T_g)
