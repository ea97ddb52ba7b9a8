"""Stage-like multi-room navigation demo (parity: the reference's Stage
simulator demos — maps + move_base global planner + mpc_local_planner).

Builds a two-room world with a door passage, plans globally with the A*
make_plan analog, drives the full LocalPlanner pipeline to the far room,
and renders the episode.

    python examples/demo_rooms.py [out.png] [scenario]

scenario ∈ {two_rooms, corridor, clutter} (default two_rooms).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "rooms_scene.png"
    scenario = sys.argv[2] if len(sys.argv) > 2 else "two_rooms"

    from mpc_local_planner_tpu.planner import load_config
    from mpc_local_planner_tpu.utils.compilation_cache import enable_persistent_cache
    from mpc_local_planner_tpu.utils.publisher import Publisher
    from mpc_local_planner_tpu.utils.worlds import (
        astar_plan,
        cluttered_room,
        corridor_corner,
        min_clearance,
        run_episode,
        two_rooms,
    )

    enable_persistent_cache()

    worlds = {
        "two_rooms": (two_rooms(door_width=0.8, resolution=0.1),
                      (0.8, 0.8, 0.0), (5.2, 5.2, 0.0)),
        "corridor": (corridor_corner(width=1.1, resolution=0.1),
                     (0.55, 0.55, 0.0), (4.45, 4.45, 1.57)),
        "clutter": (cluttered_room(n_boxes=5, resolution=0.1, seed=3),
                    (0.8, 0.8, 0.0), (5.2, 5.2, 0.0)),
    }
    cm, start, goal = worlds[scenario]

    cfg_path = os.path.join(os.path.dirname(__file__), "cfg",
                            "diff_drive_quadratic_form.yaml")
    cfg = load_config(cfg_path)

    reached, traj, vetoes = run_episode(
        cfg, cm, np.asarray(start), np.asarray(goal),
        robot_radius=0.25, max_cycles=250,
    )
    clr = min_clearance(cm, traj)
    print(f"{scenario}: reached={reached} cycles={traj.shape[0]} "
          f"vetoes={vetoes} min_clearance={clr:.3f} m")

    plan = astar_plan(cm, start[:2], goal[:2], robot_radius=0.25)
    pub = Publisher()
    pub.publish_global_plan(plan)
    pub.publish_local_plan(traj, label="driven trajectory")
    ys, xs = np.nonzero(cm.data >= 254)
    pub.ax().plot(cm.origin[0] + (xs + 0.5) * cm.resolution,
                  cm.origin[1] + (ys + 0.5) * cm.resolution, "s",
                  color="0.3", markersize=2, label="walls")
    pub.save(out_path, title=f"{scenario} | reached={reached}")
    print(f"scene written to {out_path}")


if __name__ == "__main__":
    main()
