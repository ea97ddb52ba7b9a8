"""ctypes bindings for the native (C++) costmap runtime.

Parity: the reference's native L7 path — costmap_2d scans, costmap_converter
polygon extraction, CostmapModel feasibility (native/costmap.cpp). Falls
back to the pure-Python implementations in planner/local_planner.py when the
shared library has not been built (`make -C native`).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native", "libmpccostmap.so")
_lib = None


def load() -> Optional[ctypes.CDLL]:
    """Load (and memoize) the native library; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    dp = ctypes.POINTER(ctypes.c_double)
    ip = ctypes.POINTER(ctypes.c_int)
    lib.mpc_costmap_extract_points.restype = ctypes.c_int
    lib.mpc_costmap_extract_points.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, dp, ctypes.c_double, ctypes.c_double, ctypes.c_uint8,
        dp, ctypes.c_int, ctypes.c_double,
    ]
    lib.mpc_costmap_extract_lines.restype = ctypes.c_int
    lib.mpc_costmap_extract_lines.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, ctypes.c_uint8, ctypes.c_int, ctypes.c_double,
        ctypes.c_int, dp, ctypes.c_int,
    ]
    lib.mpc_costmap_cluster_centroids.restype = ctypes.c_int
    lib.mpc_costmap_cluster_centroids.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, ctypes.c_uint8, ctypes.c_int, dp, ctypes.c_int,
    ]
    lib.mpc_tracker_update.restype = ctypes.c_int
    lib.mpc_tracker_update.argtypes = [
        dp, ctypes.c_int, dp, ctypes.c_int, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, ip, dp, ctypes.c_int, ctypes.c_int,
    ]
    lib.mpc_costmap_extract_polygons.restype = ctypes.c_int
    lib.mpc_costmap_extract_polygons.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, ctypes.c_uint8, ctypes.c_int, dp, ip, ctypes.c_int,
        ctypes.c_int,
    ]
    lib.mpc_costmap_footprint_cost.restype = ctypes.c_double
    lib.mpc_costmap_footprint_cost.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
    ]
    lib.mpc_costmap_trajectory_feasible.restype = ctypes.c_int
    lib.mpc_costmap_trajectory_feasible.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, dp, ctypes.c_int, ctypes.c_double, ctypes.c_int,
        ctypes.c_double,
    ]
    _lib = lib
    return lib


def available() -> bool:
    return load() is not None


def _grid(costmap):
    data = np.ascontiguousarray(costmap.data, dtype=np.uint8)
    H, W = data.shape
    return data, H, W, float(costmap.origin[0]), float(costmap.origin[1]), float(costmap.resolution)


def extract_points(
    costmap, robot_pose, behind_dist: float, cutoff_dist: float,
    threshold: int = 254, max_out: int = 4096,
    force_inclusion_dist: float = 0.0,
) -> np.ndarray:
    lib = load()
    data, H, W, ox, oy, res = _grid(costmap)
    pose = np.ascontiguousarray(np.asarray(robot_pose, dtype=np.float64)[:3])
    out = np.empty((max_out, 2), dtype=np.float64)
    n = lib.mpc_costmap_extract_points(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), H, W, ox, oy, res,
        pose.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        float(behind_dist), float(cutoff_dist), threshold,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), max_out,
        float(force_inclusion_dist),
    )
    return out[:n].copy()


def extract_lines(
    costmap, threshold: int = 254, min_cluster: int = 2,
    inlier_dist: float = 0.08, min_inliers: int = 4, max_out: int = 64,
) -> np.ndarray:
    """Line-segment obstacles from the costmap (parity:
    CostmapToLinesDBSRANSAC). Returns (L, 2, 2) segment endpoints."""
    lib = load()
    data, H, W, ox, oy, res = _grid(costmap)
    out = np.empty((max_out, 4), dtype=np.float64)
    n = lib.mpc_costmap_extract_lines(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), H, W, ox, oy, res,
        threshold, min_cluster, float(inlier_dist), min_inliers,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), max_out,
    )
    return out[:n].reshape(n, 2, 2).copy()


def cluster_centroids(
    costmap, threshold: int = 254, min_cluster: int = 2, max_out: int = 64,
) -> np.ndarray:
    """Blob detection: per-cluster (cx, cy, radius) — the front end of the
    dynamic-obstacle converter (parity: CostmapToDynamicObstacles)."""
    lib = load()
    data, H, W, ox, oy, res = _grid(costmap)
    out = np.empty((max_out, 3), dtype=np.float64)
    n = lib.mpc_costmap_cluster_centroids(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), H, W, ox, oy, res,
        threshold, min_cluster,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), max_out,
    )
    return out[:n].copy()


def tracker_update(
    prev_tracks: np.ndarray, centroids: np.ndarray, dt: float,
    gate_dist: float = 0.6, vel_alpha: float = 0.5, next_id: int = 0,
    max_out: int = 64, max_missed: int = 2,
):
    """Frame-to-frame centroid tracking with velocity estimation and
    coasting through up to ``max_missed`` missed detections (parity:
    CostmapToDynamicObstacles blob tracker). Tracks are rows of
    (id, x, y, vx, vy, age, missed, radius); centroids (M, 2) xy or (M, 3)
    xy + radius. Returns (tracks (T, 8), next_id)."""
    lib = load()
    prev = np.ascontiguousarray(np.asarray(prev_tracks, dtype=np.float64).reshape(-1, 8))
    cur = np.asarray(centroids, dtype=np.float64)
    cur = cur.reshape(-1, cur.shape[-1] if cur.size else 2)
    if cur.shape[-1] == 2:
        cur = np.concatenate([cur, np.zeros((cur.shape[0], 1))], axis=1)
    cur = np.ascontiguousarray(cur)
    out = np.empty((max_out, 8), dtype=np.float64)
    nid = ctypes.c_int(int(next_id))
    n = lib.mpc_tracker_update(
        prev.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), prev.shape[0],
        cur.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), cur.shape[0],
        float(dt), float(gate_dist), float(vel_alpha), ctypes.byref(nid),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), max_out,
        int(max_missed),
    )
    return out[:n].copy(), int(nid.value)


def extract_polygons(
    costmap, threshold: int = 254, min_cluster: int = 2,
    max_polys: int = 64, max_total_verts: int = 2048,
) -> Tuple[np.ndarray, ...]:
    """Cluster lethal cells into convex-hull polygon obstacles.

    Returns a tuple of (nv_i, 2) vertex arrays (parity:
    CostmapToPolygonsDBSMCCH output).
    """
    lib = load()
    data, H, W, ox, oy, res = _grid(costmap)
    verts = np.empty((max_total_verts, 2), dtype=np.float64)
    counts = np.empty((max_polys,), dtype=np.int32)
    n = lib.mpc_costmap_extract_polygons(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), H, W, ox, oy, res,
        threshold, min_cluster,
        verts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        max_polys, max_total_verts,
    )
    polys = []
    off = 0
    for i in range(n):
        polys.append(verts[off : off + counts[i]].copy())
        off += counts[i]
    return tuple(polys)


def footprint_cost(costmap, pose, footprint_radius: float = 0.0) -> float:
    lib = load()
    data, H, W, ox, oy, res = _grid(costmap)
    return lib.mpc_costmap_footprint_cost(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), H, W, ox, oy, res,
        float(pose[0]), float(pose[1]), float(footprint_radius),
    )


def trajectory_feasible(
    costmap, xs: np.ndarray, footprint_radius: float = 0.0,
    check_poses: int = -1, min_resolution_angular: float = np.pi,
) -> bool:
    lib = load()
    data, H, W, ox, oy, res = _grid(costmap)
    xs = np.ascontiguousarray(np.asarray(xs, dtype=np.float64))
    return bool(
        lib.mpc_costmap_trajectory_feasible(
            data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), H, W, ox, oy,
            res, xs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            xs.shape[0], float(footprint_radius), int(check_poses),
            float(min_resolution_angular),
        )
    )
