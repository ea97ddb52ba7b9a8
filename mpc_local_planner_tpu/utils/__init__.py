"""Utilities: visualization/publishing and conversions.

Parity: mpc_local_planner utils/ (publisher.h/.cpp — RViz markers;
conversion.h — TimeSeries ⇄ trajectory messages; SURVEY.md §3.1).
"""

from mpc_local_planner_tpu.utils.publisher import Publisher
from mpc_local_planner_tpu.utils.conversion import (
    time_series_to_poses,
    poses_to_plan_array,
)

__all__ = ["Publisher", "time_series_to_poses", "poses_to_plan_array"]
