"""Checkpoint/resume of controller warm-start state (SURVEY §6)."""

import jax.numpy as jnp
import numpy as np

from mpc_local_planner_tpu.checkpoint import (
    load_controller_state,
    load_solve_state,
    save_controller_state,
    save_solve_state,
)
from mpc_local_planner_tpu.core.value_comparison import all_close, approx_equal
from mpc_local_planner_tpu.ocp.spec import Scenario
from mpc_local_planner_tpu.planner.config import load_config
from mpc_local_planner_tpu.planner.controller import Controller


def _cfg():
    return load_config(
        {
            "grid": {"grid_size_ref": 8, "dt_ref": 0.3},
            "planning": {
                "objective_type": "quadratic_form",
                "terminal_cost_type": "quadratic",
            },
            "collision": {"obstacle_capacity": 0},
            "solver": {"iterations": 3, "inner_iterations": 4},
        }
    )


def test_controller_state_roundtrip(tmp_path):
    cfg = _cfg()
    c1 = Controller(cfg)
    scen = Scenario.goal_only(jnp.zeros(3), jnp.array([1.0, 0.3, 0.3]))
    import dataclasses as dc

    from mpc_local_planner_tpu.geometry.obstacles import ObstacleSet

    scen = dc.replace(scen, obstacles=ObstacleSet.empty(0, 0, 0, 0))
    r1 = c1.step(scen)
    path = str(tmp_path / "state.npz")
    save_controller_state(path, c1)

    c2 = Controller(cfg)
    assert load_controller_state(path, c2)
    assert all_close(c1._primal, c2._primal, atol=0)
    assert all_close(c1._duals, c2._duals, atol=0)
    # both controllers continue identically from the restored state
    r1b = c1.step(scen)
    r2b = c2.step(scen)
    np.testing.assert_array_equal(np.asarray(r1b.u0), np.asarray(r2b.u0))
    assert bool(jnp.all(approx_equal(r1.u0, r1b.u0, atol=1.0)))  # sanity


def test_solve_state_roundtrip(tmp_path):
    from mpc_local_planner_tpu.benchmarks import config1_unicycle_quadratic
    from mpc_local_planner_tpu.ocp.grid import initial_primal
    from mpc_local_planner_tpu.solvers.al_sqp import SolverSettings, init_duals

    spec = config1_unicycle_quadratic(N=6)
    scen = Scenario.goal_only(jnp.zeros(3), jnp.array([1.0, 0.0, 0.0]))
    primal = initial_primal(spec, scen)
    duals = init_duals(spec, SolverSettings())
    path = str(tmp_path / "solve.npz")
    save_solve_state(path, primal, duals)
    p2, d2 = load_solve_state(path, duals_template=duals)
    assert all_close(primal, p2, atol=0)
    assert all_close(duals, d2, atol=0)
