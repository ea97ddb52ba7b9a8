"""Standalone planner demo (parity: test_mpc_optim_node + Stage demos).

Runs a full closed-loop navigation episode — global plan, costmap with
obstacles, MPC cycles, feasibility vetoes — and renders the scene to a PNG.

    python examples/demo_planner.py [config.yaml] [out.png]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    cfg_path = sys.argv[1] if len(sys.argv) > 1 else "examples/cfg/diff_drive_quadratic_form.yaml"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "demo_scene.png"

    from mpc_local_planner_tpu.planner import LocalPlanner, load_config
    from mpc_local_planner_tpu.planner.local_planner import Costmap
    from mpc_local_planner_tpu.utils.compilation_cache import enable_persistent_cache
    from mpc_local_planner_tpu.utils.publisher import Publisher

    enable_persistent_cache()

    cfg = load_config(cfg_path)
    lp = LocalPlanner(cfg)

    # global plan: an S-curve to (3, 1)
    t = np.linspace(0, 1, 40)
    plan = np.stack([3.0 * t, 0.5 * (1 - np.cos(np.pi * t)), np.zeros_like(t)], axis=1)
    lp.set_plan(plan)

    # costmap: one lethal blob ON the plan (forces a detour), one beside it
    data = np.zeros((60, 80), dtype=np.uint8)
    data[24:26, 19:22] = 254   # world ≈ (1.5, 1.0) — near the path; far
    # enough that the lookahead goal keeps obstacle clearance (a goal inside
    # the clearance zone + xf_fixed is an infeasible OCP — the reference
    # relies on global replanning in that case)
    data[32:36, 55:58] = 254   # world ≈ (5.2, 1.8) — off-path
    cm = Costmap(data=data, origin=(-0.5, -1.5), resolution=0.1)

    import jax.numpy as jnp

    model = lp.controller.spec.model
    x = np.array([0.0, 0.0, 0.0])
    u_prev = np.zeros(2)  # control currently applied (feeds the rate bounds)
    traj = [x.copy()]
    for cycle in range(120):
        twist, res = lp.compute_velocity_commands(x, u_prev, costmap=cm)
        if res is None:
            print(f"cycle {cycle}: solver/feasibility veto — holding")
            continue
        # execute the planned control profile for one control period (ZOH
        # sampling of u_seq — with variable-dt min-time grids the stage dt
        # can be much shorter than the control period, so holding just u0
        # would not track the plan)
        sub = 6
        h = cfg.grid.dt_ref / sub
        for s in range(sub):
            u_prev = np.asarray(res.u_seq.interpolate((s + 0.5) * h, mode="zoh"))
            x = x + h * np.asarray(model.f(jnp.asarray(x), jnp.asarray(u_prev)))
        traj.append(x.copy())
        if lp.is_goal_reached(x):
            print(f"goal reached in {cycle + 1} cycles")
            break

    pub = Publisher()
    pub.publish_global_plan(plan)
    pub.publish_local_plan(np.asarray(traj), label="driven trajectory")
    ys, xs = np.nonzero(cm.data >= 254)
    pub.ax().plot(cm.origin[0] + (xs + 0.5) * cm.resolution,
                  cm.origin[1] + (ys + 0.5) * cm.resolution, "s",
                  color="tab:red", markersize=3, label="lethal cells")
    pub.publish_robot_footprint(traj[-1], lp.controller.spec.footprint)
    pub.save(out_path, title=f"{cfg.robot.type} | {cfg.planning.objective_type}")
    print(f"scene written to {out_path}")


if __name__ == "__main__":
    main()
