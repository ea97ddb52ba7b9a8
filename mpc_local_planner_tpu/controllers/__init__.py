"""Controller library.

Parity: cbr:controllers (corbo-controllers) — predictive_controller.h
(PredictiveController: see planner/controller.py for the MPC version),
lqr_controller.h, pid_controller.h, simple_state_controller.h,
dual_mode_controller.h (SURVEY.md §3.2). All controllers are pure pytree
state machines: ``(controller_state, u) = step(controller_state, x, xref, dt)``
so batches of control loops jit/vmap/scan cleanly.
"""

from mpc_local_planner_tpu.controllers.lqr import LqrController
from mpc_local_planner_tpu.controllers.pid import PidController
from mpc_local_planner_tpu.controllers.simple_state import SimpleStateController
from mpc_local_planner_tpu.controllers.dual_mode import DualModeController

__all__ = [
    "LqrController",
    "PidController",
    "SimpleStateController",
    "DualModeController",
]
