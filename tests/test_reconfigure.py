"""Live parameter retuning (parity: the reference's dynamic_reconfigure
surface on cfg/Controller.cfg — a subset of controller/solver parameters can
be changed on a running planner without restarting it).

TPU semantics under test: every parameter is a compile-time constant, so a
reconfigure drops the program cache; the warm-start state survives iff the
static problem shapes are unchanged.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from mpc_local_planner_tpu.geometry.obstacles import ObstacleSet
from mpc_local_planner_tpu.ocp.spec import Scenario
from mpc_local_planner_tpu.planner.config import load_config, reconfigure_config
from mpc_local_planner_tpu.planner.controller import Controller

BASE = {
    "robot": {"type": "unicycle",
              "unicycle": {"max_vel_x": 0.4, "max_vel_x_backwards": 0.2,
                           "max_vel_theta": 0.5}},
    "grid": {"grid_size_ref": 10, "dt_ref": 0.3},
    "planning": {
        "objective": {"type": "quadratic_form",
                      "quadratic_form": {"state_weights": [2.0, 2.0, 1.0],
                                         "control_weights": [1.0, 1.0]}},
        "terminal_cost": {"type": "quadratic",
                          "quadratic": {"final_state_weights": [10.0, 10.0, 2.0]}},
    },
    "collision": {"min_obstacle_dist": 0.2, "obstacle_capacity": 0},
    "solver": {"iterations": 6, "inner_iterations": 8},
    "footprint_model": {"type": "point"},
}


def _scen(nu=2):
    s = Scenario.goal_only(
        jnp.zeros(3, jnp.float32), jnp.array([1.5, 0.5, 0.0], jnp.float32),
        nu=nu, via_cap=0, dtype=jnp.float32,
    )
    return dataclasses.replace(
        s, obstacles=ObstacleSet.empty(0, 0, 0, 0, dtype=jnp.float32)
    )


def test_reconfigure_config_merges_and_validates():
    cfg = load_config(BASE)
    new = reconfigure_config(cfg, {
        "planning": {"objective": {"quadratic_form": {"control_weights": [5.0, 5.0]}}},
        "collision": {"min_obstacle_dist": 0.4},
    })
    assert new.planning.control_weights == (5.0, 5.0)
    assert new.collision.min_obstacle_dist == 0.4
    # untouched namespaces/values carry over
    assert new.planning.state_weights == (2.0, 2.0, 1.0)
    assert new.grid.grid_size_ref == 10
    with pytest.raises(KeyError, match="unknown"):
        reconfigure_config(cfg, {"collision": {"no_such_param": 1}})
    with pytest.raises(KeyError, match="namespace"):
        reconfigure_config(cfg, {"collisions": {}})


def test_reconfigure_weights_keeps_warm_state_and_takes_effect():
    ctrl = Controller(load_config(BASE), dtype=jnp.float32)
    scen = _scen()
    r0 = ctrl.step(scen)
    assert ctrl._primal is not None
    # retune control weights much stiffer: warm state survives, programs drop
    kept = ctrl.reconfigure(
        {"planning": {"objective": {"quadratic_form": {"control_weights": [50.0, 50.0]}}}}
    )
    assert kept
    assert ctrl._primal is not None and len(ctrl._cache) == 0
    r1 = ctrl.step(scen)
    # the stiffer R visibly shrinks the first commanded control
    assert float(jnp.linalg.norm(r1.u0)) < float(jnp.linalg.norm(r0.u0))


def test_reconfigure_rejected_update_leaves_controller_untouched():
    """A reconfigure that fails validation must be atomic: the live
    controller keeps its old config, solver dispatch, warm state, and
    compiled programs (no half-mutated state)."""
    ctrl = Controller(load_config(BASE), dtype=jnp.float32)
    r0 = ctrl.step(_scen())
    cache_keys = set(ctrl._cache.keys())
    # an unknown solver backend fails Controller validation
    with pytest.raises(ValueError, match="unknown solver.type"):
        ctrl.reconfigure({"solver": {"type": "bogus_backend"}})
    assert ctrl.config.solver.type == "al_sqp"
    assert not ctrl.spec.nonuniform_dt
    assert ctrl._primal is not None
    assert set(ctrl._cache.keys()) == cache_keys
    # and it still steps fine on the old problem
    r1 = ctrl.step(_scen())
    assert r1.x_seq.values.shape == r0.x_seq.values.shape


def test_reconfigure_structural_change_resets_state():
    ctrl = Controller(load_config(BASE), dtype=jnp.float32)
    ctrl.step(_scen())
    assert ctrl._primal is not None
    kept = ctrl.reconfigure({"grid": {"grid_size_ref": 14}})  # horizon change
    assert not kept
    assert ctrl._primal is None
    # next cycle cold-solves on the new horizon
    r = ctrl.step(_scen())
    assert r.x_seq.values.shape[-2] == 15
