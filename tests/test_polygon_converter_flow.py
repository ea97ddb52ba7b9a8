"""Costmap polygon-converter flow: clusters → hulls → scenario → solve.

Parity: costmap_converter::CostmapToPolygonsDBSMCCH feeding the obstacle
container (SURVEY.md §3.3). Requires the native library.
"""

import numpy as np
import pytest

from mpc_local_planner_tpu import native
from mpc_local_planner_tpu.planner.config import load_config
from mpc_local_planner_tpu.planner.local_planner import Costmap, LocalPlanner

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built (make -C native)"
)


def test_polygon_obstacles_flow_into_solver(monkeypatch):
    cfg = load_config(
        {
            "grid": {"grid_size_ref": 12, "dt_ref": 0.3},
            "planning": {
                "objective_type": "quadratic_form",
                "terminal_cost_type": "quadratic",
            },
            "collision": {
                "min_obstacle_dist": 0.1,
                "obstacle_capacity": 0,
                "costmap_converter": "polygons",
                "polygon_capacity": 4,
                "max_polygon_vertices": 8,
            },
            "solver": {"iterations": 6, "inner_iterations": 8,
                       "tol_eq": 0.001, "tol_ineq": 0.001},
            "footprint_model": {"type": "circular", "radius": 0.15},
        }
    )
    spec = cfg.to_ocp_spec()
    assert spec.obstacle_cap == 4  # polygons only
    lp = LocalPlanner(cfg)
    t = np.linspace(0, 1, 20)
    plan = np.stack([2.0 * t, np.zeros_like(t), np.zeros_like(t)], axis=1)
    lp.set_plan(plan)
    # a square lethal blob beside the path → one polygon obstacle
    data = np.zeros((40, 40), dtype=np.uint8)
    data[24:28, 8:12] = 254  # world ≈ (0.0±, 1.5): y = -1+2.4..2.8
    cm = Costmap(data=data, origin=(-1.0, -1.0), resolution=0.1)

    captured = {}
    orig = lp.controller.step

    def spy(scen, plan=None, **kw):
        captured["scen"] = scen
        return orig(scen, plan=plan, **kw)

    monkeypatch.setattr(lp.controller, "step", spy)
    twist, res = lp.compute_velocity_commands(np.zeros(3), np.zeros(2), costmap=cm)
    scen = captured["scen"]
    n_poly = int(np.asarray(scen.obstacles.polygon_mask).sum())
    assert n_poly == 1
    assert res is not None
    assert float(twist[0]) > 0.0  # driving toward the goal
    # the blob's hull covers its extent (cell centers span 0.3 m)
    nv = int(np.asarray(scen.obstacles.polygon_nv[0]))
    verts = np.asarray(scen.obstacles.polygons[0][:nv])
    assert verts[:, 1].min() > 1.0  # off-path, above the corridor
