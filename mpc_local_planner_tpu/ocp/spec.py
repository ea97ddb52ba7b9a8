"""OCP specification (static) and per-solve scenario data (batched pytree).

Parity: the parameter surface assembled by ``src/controller.cpp``
(Controller::configureGrid / configureOcp — grid, planning, collision, robot
namespaces; SURVEY.md Appendix A) and the runtime inputs of
``Controller::step`` (current state, goal, obstacle container, via points).

TPU-first split: everything that affects *shapes or compiled code* lives in
``OcpSpec`` (static dataclass, hashable, closed over by jit); everything that
varies per solve/scenario lives in ``Scenario`` (a pytree of arrays with
arbitrary leading batch dims — vmap/shard_map batch over it).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from mpc_local_planner_tpu.geometry.obstacles import ObstacleSet
from mpc_local_planner_tpu.systems.models import RobotLimits


@dataclasses.dataclass(frozen=True)
class OcpSpec:
    """Static problem definition. Hashable: safe to close over under jit.

    Field parity map (reference param → field):
      grid.grid_size_ref → N (number of stages; N+1 states)
      grid.collocation_method → collocation
      grid.dt_ref / variable_grid.min_dt / max_dt → dt_ref, dt_min, dt_max
      grid.variable_grid.enable → variable_dt (min-time: dt is a variable)
      grid.xf_fixed → xf_fixed
      planning.objective.type → objective
      planning.objective.quadratic_form.{state,control}_weights → q_diag, r_diag
      planning.objective.quadratic_form.integral_form → integral_form
      planning.objective.hybrid_cost_minimum_time → hybrid_time_weight
      planning.objective.minimum_time_via_points.* → via_* fields
      planning.terminal_cost.type/final_state_weights → qf_diag (None = none)
      planning.terminal_constraint.type/ball.* → ball_* (radius<=0 disables)
      collision.min_obstacle_dist → min_obstacle_dist
      robot.* limits → limits (box + rate bounds via the model)
    """

    model: object                     # BaseRobotSE2 instance (frozen pytree w/ float fields)
    footprint: object                 # footprint model instance
    N: int = 20
    collocation: str = "forward_differences"
    objective: str = "quadratic_form"  # | minimum_time | minimum_time_via_points
    q_diag: Tuple[float, ...] = (2.0, 2.0, 2.0)
    r_diag: Tuple[float, ...] = (1.0, 1.0)
    integral_form: bool = False
    # integration rule for the integral-form stage cost (parity:
    # grid.cost_integration_method — corbo LeftSum / TrapezoidalRule).
    # Trapezoidal regroups exactly per stage: dt·[½lx_0 + Σ_{1..N-1} lx_k +
    # ½lx_N] + dt·Σ lu_k (u is piecewise constant, so the control integral is
    # identical under both rules).
    cost_integration: str = "left_sum"
    hybrid_time_weight: float = 0.0   # adds w * N * dt to a quadratic objective
    qf_diag: Optional[Tuple[float, ...]] = None
    ball_weights: Tuple[float, ...] = (1.0, 1.0, 1.0)
    ball_radius: float = 0.0          # <= 0 disables the terminal ball
    xf_fixed: Tuple[bool, bool, bool] = (False, False, False)
    dt_ref: float = 0.3
    dt_min: float = 0.0
    dt_max: float = 10.0
    variable_dt: bool = False
    # per-stage dt decision variables (parity: cbr:optimal_control/
    # non_uniform_finite_differences_variable_grid.h — NonUniformFiniteDifferences
    # VariableGrid: each interval owns its dt, bounds apply per stage, the
    # min-time objective becomes Σ dt_k). Primal.dt is (..., N) when set.
    # Solved by all solvers: the structured Riccati AL-SQP path treats δdt_k
    # as an extra control column of stage k (see solvers/riccati.py ::
    # build_augmented_transition_nonuniform); lsq_lm and golden solve the
    # generic-AD form.
    nonuniform_dt: bool = False
    limits: RobotLimits = dataclasses.field(default_factory=RobotLimits)
    min_obstacle_dist: float = 0.5
    obstacle_cap: int = 0             # total padded obstacle slots the solve is compiled for
    via_cap: int = 0                  # padded via-point slots
    via_position_weight: float = 1.0
    via_orientation_weight: float = 0.0
    # ordered mode: via points claim stages monotonically in list order
    # (parity: minimum_time_via_points.via_points_ordered —
    # min_time_via_points_cost.h :: MinTimeViaPointsCost)
    via_points_ordered: bool = False
    enable_dynamic_obstacles: bool = False

    def __post_init__(self):
        if self.collocation not in (
            "forward_differences",
            "midpoint_differences",
            "crank_nicolson_differences",
        ) and not self.collocation.startswith("shooting_"):
            raise ValueError(f"unknown collocation {self.collocation!r}")
        if self.objective not in (
            "quadratic_form",
            "minimum_time",
            "minimum_time_via_points",
        ):
            raise ValueError(f"unknown objective {self.objective!r}")
        if self.cost_integration not in ("left_sum", "trapezoidal"):
            raise ValueError(
                f"unknown cost_integration {self.cost_integration!r}; "
                "options: left_sum, trapezoidal"
            )
        if self.nonuniform_dt and not self.variable_dt:
            raise ValueError("nonuniform_dt requires variable_dt")

    # -- derived static properties -------------------------------------- #
    @property
    def nx(self) -> int:
        return 3

    @property
    def nu(self) -> int:
        return self.model.control_dim

    @property
    def min_time(self) -> bool:
        return self.objective in ("minimum_time", "minimum_time_via_points")

    def control_box(self):
        return self.model.control_bounds(self.limits)

    def control_rate_box(self):
        return self.model.control_rate_bounds(self.limits)

    def __hash__(self):
        # model/footprint are frozen dataclasses of floats — hash by repr of
        # their static structure + field values.
        return hash((repr(self.model), repr(self.footprint))) ^ hash(
            tuple(
                getattr(self, f.name)
                for f in dataclasses.fields(self)
                if f.name not in ("model", "footprint", "limits")
            )
        ) ^ hash(repr(self.limits))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Scenario:
    """Per-solve runtime data. Arbitrary leading batch dims on every leaf.

    Parity: the arguments of Controller::step — current state (odometry or
    StateFeedback merge), goal from the pruned/transformed global plan,
    obstacle container, via-point container, previously applied control
    (for the first control-deviation constraint).
    """

    x0: jax.Array          # (..., 3) current state
    xf: jax.Array          # (..., 3) goal / terminal reference
    obstacles: ObstacleSet
    via_points: jax.Array  # (..., Mv, 3) via poses (x, y, theta)
    via_mask: jax.Array    # (..., Mv) bool
    u_prev: jax.Array      # (..., nu) control applied in the previous cycle

    @staticmethod
    def goal_only(x0, xf, nu: int = 2, obstacle_set: Optional[ObstacleSet] = None,
                  via_cap: int = 0, dtype=jnp.float32) -> "Scenario":
        """Convenience constructor for obstacle-free point-to-point problems."""
        x0 = jnp.asarray(x0, dtype=dtype)
        xf = jnp.asarray(xf, dtype=dtype)
        if obstacle_set is None:
            obstacle_set = ObstacleSet.empty(dtype=dtype)
        batch = x0.shape[:-1]
        if batch and obstacle_set.points.ndim == 2:
            # broadcast an unbatched obstacle field over the scenario batch
            obstacle_set = jax.tree_util.tree_map(
                lambda a: jnp.broadcast_to(a, batch + a.shape), obstacle_set
            )
        return Scenario(
            x0=x0,
            xf=xf,
            obstacles=obstacle_set,
            via_points=jnp.zeros(batch + (via_cap, 3), dtype=dtype),
            via_mask=jnp.zeros(batch + (via_cap,), dtype=bool),
            u_prev=jnp.zeros(batch + (nu,), dtype=dtype),
        )
