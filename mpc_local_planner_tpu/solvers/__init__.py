"""Solvers: batched TPU AL-SQP with Riccati KKT sweeps + float64 golden anchor.

Parity: cbr:optimization solvers (SolverIpopt, LevenbergMarquardtDense/Sparse,
SolverOsqp) — replaced TPU-first by a fixed-shape augmented-Lagrangian SQP
whose equality-constrained QP subproblem is solved by a batched parametric
Riccati sweep (SURVEY.md §8 steps 3-5).
"""

from mpc_local_planner_tpu.solvers.golden import solve_golden
from mpc_local_planner_tpu.solvers.al_sqp import SolverSettings, SolveResult, make_solver
from mpc_local_planner_tpu.solvers.rescue import make_rescue
from mpc_local_planner_tpu.solvers.f64_fallback import make_f64_fallback

__all__ = [
    "solve_golden", "SolverSettings", "SolveResult", "make_solver",
    "make_rescue", "make_f64_fallback",
]
