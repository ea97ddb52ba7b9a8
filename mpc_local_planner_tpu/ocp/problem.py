"""OCP assembly: bundles cost / equality / inequality evaluators.

Parity: cbr:optimal_control ``structured_ocp/structured_optimal_control_problem.h``
(StructuredOptimalControlProblem — owns grid + dynamics + solver + NlpFunctions;
compute() = warm start → assemble → solve) and the NLP-vector mapping of
``cbr:optimization/hyper_graph_optimization_problem_edge_based.h``.

TPU-first: no graph. The constraint system of the fixed-shape OCP is
  equality   : N collocation defects (N, 3) + masked terminal equality (3,)
  inequality : obstacles (N, M) ++ control-rate (N, 2nu) ++ control box
               (N, 2nu) ++ dt box (2,) ++ terminal ball (1,)
all evaluated as dense stage-wise arrays. ``flatten``/``unflatten`` give the
packed decision vector z = [X_free, U, dt?] used by the float64 golden solver
(scipy SLSQP); the TPU AL-SQP solver consumes the structured form directly.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from mpc_local_planner_tpu.ocp import constraints as C
from mpc_local_planner_tpu.ocp.collocation import collocation_defects
from mpc_local_planner_tpu.ocp.costs import total_cost
from mpc_local_planner_tpu.ocp.grid import Primal
from mpc_local_planner_tpu.ocp.spec import OcpSpec


@dataclasses.dataclass(frozen=True)
class OcpFunctions:
    """Pure evaluators over (Primal, Scenario); all shapes static per spec."""

    spec: OcpSpec

    # ---- objective ----------------------------------------------------- #
    def cost(self, primal: Primal, scenario) -> jax.Array:
        return total_cost(self.spec, primal.xs, primal.us, primal.dt, scenario)

    # ---- equality constraints ------------------------------------------ #
    def defects(self, primal: Primal) -> jax.Array:
        return collocation_defects(
            self.spec.model, self.spec.collocation, primal.xs, primal.us, primal.dt
        )

    def eq(self, primal: Primal, scenario) -> jax.Array:
        """Flat equality residual: [defects (N*3), terminal_eq (3)]."""
        d = self.defects(primal)
        te = C.terminal_equality(self.spec, primal.xs, scenario.xf)
        flat = d.reshape(d.shape[:-2] + (-1,))
        return jnp.concatenate([flat, te], axis=-1)

    # ---- inequality constraints  (g <= 0) ------------------------------ #
    def ineq(self, primal: Primal, scenario) -> jax.Array:
        s = self.spec
        xs, us, dt = primal.xs, primal.us, primal.dt
        parts = [
            C.obstacle_inequalities(s, xs, dt, scenario).reshape(xs.shape[:-2] + (-1,)),
            C.control_rate_inequalities(s, us, dt, scenario.u_prev).reshape(
                xs.shape[:-2] + (-1,)
            ),
            C.control_box_inequalities(s, us).reshape(xs.shape[:-2] + (-1,)),
            C.dt_inequalities(s, dt, xs.dtype),
            C.terminal_ball_inequality(s, xs, scenario.xf),
        ]
        return jnp.concatenate(parts, axis=-1)

    # ---- static sizes --------------------------------------------------- #
    @property
    def n_eq(self) -> int:
        return self.spec.N * self.spec.nx + self.spec.nx

    @property
    def n_dt(self) -> int:
        """Number of dt decision variables (0 fixed / 1 uniform / N non-uniform)."""
        s = self.spec
        if not s.variable_dt:
            return 0
        return s.N if s.nonuniform_dt else 1

    @property
    def n_ineq(self) -> int:
        s = self.spec
        n_dt_box = 2 * s.N if s.nonuniform_dt else 2
        return s.N * s.obstacle_cap + s.N * 2 * s.nu + s.N * 2 * s.nu + n_dt_box + 1

    @property
    def n_free(self) -> int:
        s = self.spec
        return s.N * s.nx + s.N * s.nu + self.n_dt

    # ---- flat packing for the golden solver ----------------------------- #
    def flatten(self, primal: Primal) -> jax.Array:
        s = self.spec
        parts = [
            primal.xs[..., 1:, :].reshape(primal.xs.shape[:-2] + (-1,)),
            primal.us.reshape(primal.us.shape[:-2] + (-1,)),
        ]
        if s.variable_dt:
            parts.append(primal.dt if s.nonuniform_dt else primal.dt[..., None])
        return jnp.concatenate(parts, axis=-1)

    def unflatten(self, z: jax.Array, x0, dt_fixed=None) -> Primal:
        s = self.spec
        batch = z.shape[:-1]
        nX = s.N * s.nx
        nU = s.N * s.nu
        xs_tail = z[..., :nX].reshape(batch + (s.N, s.nx))
        xs = jnp.concatenate([x0[..., None, :], xs_tail], axis=-2)
        us = z[..., nX : nX + nU].reshape(batch + (s.N, s.nu))
        if s.variable_dt:
            dt = z[..., nX + nU :] if s.nonuniform_dt else z[..., nX + nU]
        else:
            dt = jnp.full(batch, s.dt_ref if dt_fixed is None else dt_fixed, z.dtype)
        return Primal(xs=xs, us=us, dt=dt)


def make_ocp_functions(spec: OcpSpec) -> OcpFunctions:
    """Factory (parity: Controller::configureOcp assembling the structured OCP)."""
    return OcpFunctions(spec=spec)
