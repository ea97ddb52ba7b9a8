"""Planner layer: capability parity with the reference's L6/L7 (no ROS).

Parity: mpc_local_planner_ros.{h,cpp} (plugin glue) + controller.{h,cpp}
(MPC controller orchestration), SURVEY.md §2 L6/L7 and §8 step 7.
"""

from mpc_local_planner_tpu.planner.config import PlannerConfig, load_config
from mpc_local_planner_tpu.planner.controller import Controller, ControlResult
from mpc_local_planner_tpu.planner.local_planner import LocalPlanner

__all__ = [
    "PlannerConfig",
    "load_config",
    "Controller",
    "ControlResult",
    "LocalPlanner",
]
