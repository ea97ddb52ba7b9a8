"""Native C++ costmap runtime vs the Python reference implementation.

The shared library (native/libmpccostmap.so) is optional; tests skip when it
is not built. Build with `make -C native`.
"""

import numpy as np
import pytest

from mpc_local_planner_tpu import native
from mpc_local_planner_tpu.planner.local_planner import (
    Costmap,
    costmap_to_obstacle_points,
    footprint_cost,
    is_pose_trajectory_feasible,
)

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built (make -C native)"
)


def _costmap(seed=0):
    rng = np.random.default_rng(seed)
    data = np.zeros((40, 50), dtype=np.uint8)
    idx = rng.integers(0, 40 * 50, size=30)
    data.flat[idx] = 254
    return Costmap(data=data, origin=(-1.0, -2.0), resolution=0.1)


def test_extract_points_matches_python():
    cm = _costmap()
    pose = (0.5, 0.3, 0.7)
    ref = costmap_to_obstacle_points(cm, pose, behind_dist=1.0, cutoff_dist=2.0)
    nat = native.extract_points(cm, pose, behind_dist=1.0, cutoff_dist=2.0)
    ref_s = sorted(map(tuple, np.round(ref, 9)))
    nat_s = sorted(map(tuple, np.round(nat, 9)))
    assert ref_s == nat_s


def test_footprint_cost_matches_python():
    cm = _costmap(1)
    for pose in [(0.5, 0.3), (1.0, 1.0), (-0.5, -1.5), (10.0, 10.0)]:
        for r in (0.0, 0.25):
            assert native.footprint_cost(cm, pose, r) == footprint_cost(cm, pose, r)


def test_trajectory_feasible_matches_python():
    cm = _costmap(2)
    rng = np.random.default_rng(3)
    for _ in range(5):
        xs = np.column_stack(
            [
                rng.uniform(-0.5, 3.5, size=6),
                rng.uniform(-1.5, 1.5, size=6),
                rng.uniform(-3, 3, size=6),
            ]
        )
        assert native.trajectory_feasible(cm, xs, 0.15) == is_pose_trajectory_feasible(
            cm, xs, 0.15
        )


def test_extract_polygons_covers_clusters():
    data = np.zeros((30, 30), dtype=np.uint8)
    data[5:9, 5:9] = 254        # square blob
    data[20, 10:20] = 254       # line blob
    cm = Costmap(data=data, origin=(0.0, 0.0), resolution=0.1)
    polys = native.extract_polygons(cm)
    assert len(polys) == 2
    # the square blob's hull must span its extent (cell centers 0.55..0.85)
    areas = []
    for p in polys:
        x = p[:, 0]
        y = p[:, 1]
        areas.append(0.5 * abs(np.dot(x, np.roll(y, 1)) - np.dot(y, np.roll(x, 1))))
    assert max(areas) == pytest.approx(0.3 * 0.3, rel=1e-6)
