"""Message-type records.

Parity: mpc_local_planner_msgs — OptimalControlResult.msg (dims,
time_states[], flattened states[], time_controls[], controls[],
optimal_solution_found, cpu_time) and StateFeedback.msg (header + state[]);
SURVEY.md §3.1. Plain dataclasses with flat-array layout identical to the
ROS messages so logs/tools translate 1:1; ``from_control_result`` bridges
from the controller output.
"""

from __future__ import annotations

import dataclasses
from typing import List

import numpy as np


@dataclasses.dataclass
class OptimalControlResult:
    """Flattened solve result (parity: OptimalControlResult.msg fields)."""

    dim_states: int
    dim_controls: int
    time_states: np.ndarray     # (N+1,)
    states: np.ndarray          # (N+1)*dim_states flattened
    time_controls: np.ndarray   # (N,)
    controls: np.ndarray        # N*dim_controls flattened
    optimal_solution_found: bool
    cpu_time: float             # seconds (per-solve wall time)

    @staticmethod
    def from_control_result(res, cpu_time: float = 0.0) -> "OptimalControlResult":
        xs = np.asarray(res.x_seq.values)
        us = np.asarray(res.u_seq.values)
        return OptimalControlResult(
            dim_states=xs.shape[-1],
            dim_controls=us.shape[-1],
            time_states=np.asarray(res.x_seq.times),
            states=xs.reshape(-1),
            time_controls=np.asarray(res.u_seq.times),
            controls=us.reshape(-1),
            optimal_solution_found=bool(np.asarray(res.solve.converged).all()),
            cpu_time=cpu_time,
        )

    def unflatten(self):
        """(states (N+1, nx), controls (N, nu))."""
        return (
            self.states.reshape(-1, self.dim_states),
            self.controls.reshape(-1, self.dim_controls),
        )


@dataclasses.dataclass
class StateFeedback:
    """External state feedback (parity: StateFeedback.msg: header + state[]).

    Merged with odometry per the `prefer_x_feedback` policy
    (RobotDynamicsInterface::mergeStateFeedbackAndOdomFeedback).
    """

    stamp: float
    state: List[float]
