"""Float64 golden-reference solver (correctness anchor).

Parity role: substitutes for the C++ reference binary (IPOPT on the
hypergraph NLP) which cannot run here — SURVEY.md §8 step 3. Solves the
*identical* transcription (same OcpFunctions residuals) with an independent
algorithm (scipy SLSQP, float64, exact AD Jacobians) so the TPU AL-SQP
solver can be validated against it to tight tolerances. Host-only and slow
by design; never on the TPU path.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mpc_local_planner_tpu.ocp.grid import Primal, initial_primal
from mpc_local_planner_tpu.ocp.problem import make_ocp_functions


def solve_golden(
    spec,
    scenario,
    init: Optional[Primal] = None,
    tol: float = 1e-10,
    maxiter: int = 1000,
):
    """Solve one (unbatched) OCP with scipy SLSQP in float64.

    Returns (Primal solution, scipy OptimizeResult).
    """
    from scipy.optimize import NonlinearConstraint, minimize

    funcs = make_ocp_functions(spec)
    scenario = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, dtype=jnp.float64)
        if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating)
        else jnp.asarray(a),
        scenario,
    )
    x0 = scenario.x0

    if init is None:
        # initial_primal seeds nonzero forward velocity — at u = 0 the dt
        # column of the collocation Jacobian vanishes (f ∝ v) and SLSQP's
        # LSQ subproblem is singular on min-time problems.
        init = initial_primal(spec, scenario)
    init = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, dtype=jnp.float64), init
    )
    z0 = np.asarray(funcs.flatten(init), dtype=np.float64)

    def unpack(z):
        return funcs.unflatten(jnp.asarray(z, dtype=jnp.float64), x0)

    # SLSQP needs non-degenerate rows: drop identically-zero equality rows
    # (unfixed xf components) and constant padded inequality rows (inactive
    # slots report −BIG_DISTANCE with zero gradient → singular LSQ subproblem).
    eq_keep = np.concatenate(
        [np.ones(spec.N * spec.nx, dtype=bool), np.asarray(spec.xf_fixed, dtype=bool)]
    )
    g0 = np.asarray(jax.jit(lambda z: funcs.ineq(unpack(z), scenario))(z0))
    ineq_keep = g0 > -1.0e5

    cost = jax.jit(lambda z: funcs.cost(unpack(z), scenario))
    grad = jax.jit(jax.grad(lambda z: funcs.cost(unpack(z), scenario)))
    eq = jax.jit(lambda z: funcs.eq(unpack(z), scenario)[eq_keep])
    eq_jac = jax.jit(jax.jacfwd(lambda z: funcs.eq(unpack(z), scenario)[eq_keep]))
    # scipy convention: inequality constraints are fun(z) >= 0 → pass −g.
    ineq = jax.jit(lambda z: -funcs.ineq(unpack(z), scenario)[ineq_keep])
    ineq_jac = jax.jit(jax.jacfwd(lambda z: -funcs.ineq(unpack(z), scenario)[ineq_keep]))

    cons = [
        NonlinearConstraint(
            lambda z: np.asarray(eq(z)), 0.0, 0.0, jac=lambda z: np.asarray(eq_jac(z))
        ),
    ]
    if bool(ineq_keep.any()):
        cons.append(
            NonlinearConstraint(
                lambda z: np.asarray(ineq(z)),
                0.0,
                np.inf,
                jac=lambda z: np.asarray(ineq_jac(z)),
            )
        )

    res = minimize(
        lambda z: float(cost(z)),
        z0,
        jac=lambda z: np.asarray(grad(z), dtype=np.float64),
        constraints=cons,
        method="SLSQP",
        options={"maxiter": maxiter, "ftol": tol},
    )
    sol = unpack(res.x)
    return sol, res
