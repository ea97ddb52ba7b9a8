"""Costmap-converter line + dynamic-obstacle modes (parity:
costmap_converter :: CostmapToLinesDBSRANSAC / CostmapToDynamicObstacles).

Runs against whichever implementation is active (native C++ when built,
python fallback otherwise) plus an explicit native-vs-python equivalence
check when the library is available.
"""

import numpy as np
import pytest

from mpc_local_planner_tpu import native
from mpc_local_planner_tpu.planner.config import load_config
from mpc_local_planner_tpu.planner.local_planner import (
    Costmap,
    LocalPlanner,
    cluster_centroids,
    costmap_to_obstacle_points,
    extract_line_segments,
    tracker_update,
)


def _wall_costmap():
    data = np.zeros((60, 60), dtype=np.uint8)
    data[20, 10:40] = 254   # horizontal wall y=2.05, x in [1, 4]
    data[30:33, 45:48] = 254  # compact blob
    return Costmap(data=data, origin=(0.0, 0.0), resolution=0.1)


def test_line_extraction_recovers_wall():
    cm = _wall_costmap()
    segs = extract_line_segments(cm)
    assert segs.shape[0] >= 1
    # the wall segment: endpoints near (1.05, 2.05) and (3.95, 2.05)
    lengths = np.linalg.norm(segs[:, 1] - segs[:, 0], axis=1)
    wall = segs[np.argmax(lengths)]
    assert abs(wall[:, 1].mean() - 2.05) < 0.06
    assert abs(np.linalg.norm(wall[1] - wall[0]) - 2.9) < 0.2


@pytest.mark.skipif(not native.available(), reason="native library not built")
def test_native_line_extraction_matches_python():
    cm = _wall_costmap()
    a = extract_line_segments(cm)
    b = native.extract_lines(cm)
    assert a.shape == b.shape
    # same dominant wall segment (order/orientation may differ)
    la = a[np.argmax(np.linalg.norm(a[:, 1] - a[:, 0], axis=1))]
    lb = b[np.argmax(np.linalg.norm(b[:, 1] - b[:, 0], axis=1))]
    d1 = np.linalg.norm(la - lb)
    d2 = np.linalg.norm(la - lb[::-1])
    assert min(d1, d2) < 0.15


@pytest.mark.skipif(not native.available(), reason="native library not built")
def test_native_tracker_matches_python():
    cen0 = np.array([[1.0, 1.0, 0.2], [3.0, 2.0, 0.3]])
    cen1 = cen0 + np.array([[0.2, 0.0, 0.0], [0.0, -0.1, 0.0]])
    t_py, nid_py = tracker_update(np.zeros((0, 8)), cen0, dt=0.1)
    t_py, nid_py = tracker_update(t_py, cen1, dt=0.1, vel_alpha=1.0, next_id=nid_py)
    t_c, nid_c = native.tracker_update(np.zeros((0, 8)), cen0, dt=0.1)
    t_c, nid_c = native.tracker_update(t_c, cen1, dt=0.1, vel_alpha=1.0, next_id=nid_c)
    np.testing.assert_allclose(t_py, t_c, atol=1e-12)
    assert nid_py == nid_c
    np.testing.assert_allclose(t_c[0, 3:5], [2.0, 0.0], atol=1e-9)
    np.testing.assert_allclose(t_c[1, 3:5], [0.0, -1.0], atol=1e-9)
    np.testing.assert_allclose(t_c[:, 7], [0.2, 0.3], atol=1e-12)  # radii carried


def test_tracker_coasts_through_missed_detection():
    """A track with no matching centroid coasts on its constant-velocity
    prediction (velocity and id preserved) for max_missed frames, then
    rematches a reappearing blob (parity: CostmapToDynamicObstacles' Kalman
    tracks surviving missed detections)."""
    impls = [tracker_update] + ([native.tracker_update] if native.available() else [])
    for upd in impls:
        t, nid = upd(np.zeros((0, 8)), np.array([[1.0, 1.0, 0.2]]), dt=0.1)
        t, nid = upd(t, np.array([[1.05, 1.0, 0.2]]), dt=0.1, vel_alpha=1.0, next_id=nid)
        assert abs(t[0, 3] - 0.5) < 1e-9  # vx = 0.05 / 0.1
        tid = t[0, 0]
        # frame with NO detections: the track coasts, not dies
        t, nid = upd(t, np.zeros((0, 3)), dt=0.1, next_id=nid)
        assert t.shape[0] == 1 and t[0, 0] == tid
        assert abs(t[0, 1] - 1.10) < 1e-9   # coasted x += vx*dt
        assert abs(t[0, 3] - 0.5) < 1e-9    # velocity preserved
        assert t[0, 6] == 1.0               # missed counter
        # the blob reappears near the prediction: same id, missed resets
        t, nid = upd(t, np.array([[1.15, 1.0, 0.2]]), dt=0.1,
                     vel_alpha=1.0, next_id=nid)
        assert t.shape[0] == 1 and t[0, 0] == tid and t[0, 6] == 0.0
        # beyond max_missed the track dies
        t2 = t
        for _ in range(3):
            t2, nid = upd(t2, np.zeros((0, 3)), dt=0.1, next_id=nid, max_missed=2)
        assert t2.shape[0] == 0


def test_force_inclusion_dist_bypasses_behind_filter():
    data = np.zeros((40, 40), dtype=np.uint8)
    data[20, 10] = 254  # behind the robot (robot at (3, 2) facing +x)
    cm = Costmap(data=data, origin=(0.0, 0.0), resolution=0.1)
    pose = np.array([3.0, 2.05, 0.0])
    # cell at (1.05, 2.05): dist 1.95, behind. behind_dist 1.5 drops it...
    none = costmap_to_obstacle_points(
        cm, pose, behind_dist=1.5, cutoff_dist=2.5, force_inclusion_dist=0.0
    )
    assert none.shape[0] == 0
    # ...force_inclusion_dist 2.0 includes it
    kept = costmap_to_obstacle_points(
        cm, pose, behind_dist=1.5, cutoff_dist=2.5, force_inclusion_dist=2.0
    )
    assert kept.shape[0] == 1
    if native.available():
        k2 = native.extract_points(
            cm, pose, 1.5, 2.5, force_inclusion_dist=2.0
        )
        np.testing.assert_allclose(kept, k2, atol=1e-12)
        assert native.extract_points(cm, pose, 1.5, 2.5).shape[0] == 0


def _dyn_config():
    return load_config(
        {
            "controller": {"max_global_plan_lookahead_dist": 4.0},
            "robot": {"type": "unicycle",
                      "unicycle": {"max_vel_x": 0.4, "max_vel_x_backwards": 0.2,
                                   "max_vel_theta": 0.4}},
            "grid": {"grid_size_ref": 15, "dt_ref": 0.3},
            "planning": {
                "objective": {"type": "quadratic_form",
                              "quadratic_form": {"state_weights": [2.0, 2.0, 2.0],
                                                 "control_weights": [1.0, 1.0]}},
                "terminal_cost": {"type": "quadratic",
                                  "quadratic": {"final_state_weights": [10.0, 10.0, 10.0]}},
            },
            "collision": {
                "min_obstacle_dist": 0.1,
                "obstacle_capacity": 0,
                "costmap_converter": "dynamic",
                "dynamic_capacity": 4,
                "tracker_vel_alpha": 1.0,
                "enable_dynamic_obstacles": True,
                "collision_check_no_poses": 0,
            },
            "footprint_model": {"type": "circular", "radius": 0.15},
            "solver": {"iterations": 8, "inner_iterations": 8},
        }
    )


def test_dynamic_converter_feeds_velocity_to_solver():
    """A blob moving across costmap frames becomes a velocity-carrying
    circular obstacle the solver anticipates (VERDICT item 5 'done'
    criterion)."""
    cfg = _dyn_config()
    spec = cfg.to_ocp_spec()
    assert spec.obstacle_cap == 4
    assert spec.enable_dynamic_obstacles
    lp = LocalPlanner(cfg)
    t = np.linspace(0, 1, 30)
    plan = np.stack([3.0 * t, np.zeros_like(t), np.zeros_like(t)], axis=1)
    lp.set_plan(plan)

    def costmap_at(cx):
        data = np.zeros((60, 80), dtype=np.uint8)
        mx = int((cx + 0.5) / 0.1)
        data[8:11, mx : mx + 3] = 254  # blob at y ≈ -0.6, moving +x
        return Costmap(data=data, origin=(-0.5, -1.5), resolution=0.1)

    captured = {}
    orig_step = lp.controller.step

    def spy(scen, **kw):
        captured["scen"] = scen
        return orig_step(scen, **kw)

    lp.controller.step = spy

    x = np.array([0.0, 0.0, 0.0])
    # one whole cell (0.1 m) per dt_ref=0.3 s cycle → vx = 1/3
    for k, cx in enumerate([1.0, 1.1, 1.2]):
        lp.compute_velocity_commands(x, np.zeros(2), costmap=costmap_at(cx))
    scen = captured["scen"]
    mask = np.asarray(scen.obstacles.circle_mask)
    assert mask.sum() == 1
    vx = float(np.asarray(scen.obstacles.circle_vels)[mask][0, 0])
    assert abs(vx - 1.0 / 3.0) < 0.05, vx
    # one persistent track
    assert lp._tracks.shape[0] == 1 and lp._tracks[0, 5] >= 2
