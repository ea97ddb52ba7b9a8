"""Trajectory conversions.

Parity: mpc_local_planner ``utils/conversion.h/.cpp`` — corbo TimeSeries ⇄
ROS pose/trajectory messages. Without ROS, the interchange formats are plain
numpy arrays: a "plan" is (P, 3) rows of (x, y, theta); a timed trajectory
is (times (T,), poses (T, 3)).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np


def time_series_to_poses(series) -> Tuple[np.ndarray, np.ndarray]:
    """TimeSeries(SE2) → (times (T,), poses (T, 3)).

    Parity: convert(TimeSeries → PoseStamped[]).
    """
    return np.asarray(series.times), np.asarray(series.values)[..., :3]


def poses_to_plan_array(poses: List) -> np.ndarray:
    """List of (x, y[, theta]) → (P, 3) plan array with heading fill-in.

    Missing headings are taken from successive segment directions (parity:
    the planner's plan preprocessing when pose orientations are absent).
    """
    arr = np.asarray([np.asarray(p, dtype=np.float64) for p in poses])
    if arr.shape[1] == 3:
        return arr
    out = np.zeros((arr.shape[0], 3))
    out[:, :2] = arr[:, :2]
    d = np.diff(arr[:, :2], axis=0)
    th = np.arctan2(d[:, 1], d[:, 0])
    out[:-1, 2] = th
    out[-1, 2] = th[-1] if th.size else 0.0
    return out
