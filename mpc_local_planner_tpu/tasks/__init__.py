"""Tasks: closed-loop simulation/benchmark harnesses.

Parity: cbr:tasks (corbo-tasks) — task_interface.h,
closed_loop_control_task.h (ClosedLoopControlTask::performTask: plant +
controller loop with TimeSeries signal recording and timing statistics;
SURVEY.md §3.2, §4.5).
"""

from mpc_local_planner_tpu.tasks.closed_loop import ClosedLoopControlTask, ClosedLoopLog

__all__ = ["ClosedLoopControlTask", "ClosedLoopLog"]
