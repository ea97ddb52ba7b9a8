"""LocalPlanner via-point pipeline (global_plan_viapoint_sep > 0)."""

import numpy as np

from mpc_local_planner_tpu.planner.config import load_config
from mpc_local_planner_tpu.planner.local_planner import LocalPlanner


def test_via_points_flow_from_plan_to_scenario(monkeypatch):
    cfg = load_config(
        {
            "controller": {
                "global_plan_viapoint_sep": 0.4,
                "max_global_plan_lookahead_dist": 2.0,
            },
            "grid": {"grid_size_ref": 12, "dt_ref": 0.3,
                     "xf_fixed": [True, True, True],
                     "variable_grid": {"enable": True, "min_dt": 0.001, "max_dt": 1.0}},
            "planning": {"objective": {"type": "minimum_time_via_points",
                                       "minimum_time_via_points": {"position_weight": 5.0}}},
            "collision": {"obstacle_capacity": 0},
            "solver": {"iterations": 8, "inner_iterations": 8, "rho0": 100.0},
            "via_capacity": 6,
        }
    )
    spec = cfg.to_ocp_spec()
    assert spec.via_cap == 6
    assert spec.objective == "minimum_time_via_points"
    lp = LocalPlanner(cfg)
    t = np.linspace(0, 1, 30)
    plan = np.stack([2.0 * t, 0.3 * np.sin(np.pi * t), np.zeros_like(t)], axis=1)
    lp.set_plan(plan)

    captured = {}
    orig_step = lp.controller.step

    def spy(scen, plan=None, **kw):
        captured["scen"] = scen
        return orig_step(scen, plan=plan, **kw)

    monkeypatch.setattr(lp.controller, "step", spy)
    twist, res = lp.compute_velocity_commands(np.zeros(3), np.zeros(2))
    scen = captured["scen"]
    n_via = int(np.asarray(scen.via_mask).sum())
    assert n_via >= 2                      # via points extracted every 0.4 m
    assert res is not None
    # solver actually used them: converged with the via objective
    assert bool(np.asarray(res.solve.converged).all())
