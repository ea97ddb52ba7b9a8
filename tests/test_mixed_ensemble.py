"""Mixed-model fleet solving (BASELINE config #5 shape)."""

import jax
import jax.numpy as jnp

from mpc_local_planner_tpu.benchmarks import (
    config1_unicycle_quadratic,
    random_ensemble,
)
from mpc_local_planner_tpu.geometry.footprints import PointFootprint
from mpc_local_planner_tpu.ocp.spec import OcpSpec
from mpc_local_planner_tpu.parallel.ensembles import MixedEnsembleSolver
from mpc_local_planner_tpu.solvers.al_sqp import SolverSettings
from mpc_local_planner_tpu.systems.models import RobotLimits, SimpleCarModel


def test_mixed_unicycle_and_carlike_fleet():
    spec_uni = config1_unicycle_quadratic(N=10)
    spec_car = OcpSpec(
        model=SimpleCarModel(wheelbase=0.5), footprint=PointFootprint(), N=12,
        objective="quadratic_form", qf_diag=(10.0, 10.0, 5.0), dt_ref=0.3,
        limits=RobotLimits(max_vel_x=0.4, max_vel_x_backwards=0.2, max_steering_angle=0.8),
    )
    st = SolverSettings(n_al=6, n_sqp=6, tol_eq=1e-3, tol_ineq=1e-3)
    solver = MixedEnsembleSolver([(spec_uni, st), (spec_car, st)])
    scen_u = random_ensemble(spec_uni, 8, jax.random.PRNGKey(0), dtype=jnp.float32, goal_radius=1.2)
    scen_c = random_ensemble(spec_car, 6, jax.random.PRNGKey(1), dtype=jnp.float32, goal_radius=1.2)
    iu, du = solver.init_state(0, scen_u)
    ic, dc = solver.init_state(1, scen_c)
    results = solver.solve_all([scen_u, scen_c], [iu, ic], [du, dc])
    assert results[0].primal.us.shape == (8, 10, 2)
    assert results[1].primal.us.shape == (6, 12, 2)
    s = solver.summary(results)
    assert s["n_scenarios"] == 14
    assert s["converged_frac"] > 0.5
