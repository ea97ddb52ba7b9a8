"""OCP layer: transcription, costs, constraints, problem assembly.

Parity: mpc_local_planner ``optimal_control/*`` (SE(2) grids, collocation,
costs, stage inequalities) over cbr:optimal_control (StructuredOptimalControlProblem,
discretization grids, stage functions). TPU-first: the hypergraph is replaced
by dense fixed-shape stage-wise structure (SURVEY.md §8).
"""

from mpc_local_planner_tpu.ocp.collocation import (
    COLLOCATION_METHODS,
    collocation_defects,
)
from mpc_local_planner_tpu.ocp.spec import OcpSpec, Scenario
from mpc_local_planner_tpu.ocp.problem import OcpFunctions, make_ocp_functions
from mpc_local_planner_tpu.ocp.grid import (
    Primal,
    initial_primal,
    primal_from_plan,
    warm_start_shift,
)

__all__ = [
    "COLLOCATION_METHODS",
    "collocation_defects",
    "OcpSpec",
    "Scenario",
    "OcpFunctions",
    "make_ocp_functions",
    "Primal",
    "initial_primal",
    "primal_from_plan",
    "warm_start_shift",
]
