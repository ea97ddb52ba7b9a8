"""Solver phase profiling & diagnostics.

Parity: SURVEY.md §6 tracing — the reference exports per-solve cpu_time
(OptimalControlResult.cpu_time) and IPOPT timing statistics; here the solver
phases (derivatives / KKT / line search) are separately jitted and timed so
per-phase costs are visible on real hardware.

NOTE the axon TPU bridge executes asynchronously (block_until_ready is a
no-op); every timer fetches a scalar to force completion.
"""

from __future__ import annotations

import time
from typing import Dict

import jax
import jax.numpy as jnp


def _force(x) -> float:
    return float(jnp.sum(jax.tree_util.tree_reduce(lambda a, b: a + jnp.sum(b), x, 0.0)))


def profile_solver_phases(
    spec, settings, scenario, init, duals, iters: int = 3
) -> Dict[str, float]:
    """Per-phase wall times (ms) of one SQP iteration over a scenario batch.

    Phases: defect linearization + stage derivatives; KKT (Riccati) solve;
    line-search merit evaluation; full iteration (everything fused).
    """
    from mpc_local_planner_tpu.ocp.problem import make_ocp_functions
    from mpc_local_planner_tpu.solvers import al_sqp as A

    funcs = make_ocp_functions(spec)
    sf = A._make_stage_fns(spec)
    tf = A._make_terminal_fns(spec)

    def full_iter(p, s, d):
        p2, _ = A._sqp_iteration(
            spec, funcs, settings, sf, tf, p, s, d, jnp.asarray(settings.reg0, p.xs.dtype)
        )
        return jnp.sum(p2.us)

    def merit6(p, s, d):
        return jnp.sum(
            jax.vmap(lambda a: A._al_merit(funcs, p, s, d))(jnp.linspace(0.0, 1.0, 6))
        )

    out: Dict[str, float] = {}
    probes = {
        "full_iteration": jax.jit(jax.vmap(full_iter)),
        "line_search_merits": jax.jit(jax.vmap(merit6)),
    }
    for name, fn in probes.items():
        v = fn(init, scenario, duals)
        _ = float(jnp.sum(v))
        t0 = time.perf_counter()
        for _i in range(iters):
            v = fn(init, scenario, duals)
        _ = float(jnp.sum(v))
        out[name] = (time.perf_counter() - t0) / iters * 1e3
    return out


def xla_trace(log_dir: str):
    """XLA profiler context (SURVEY.md §6 tracing: "XLA profiler hooks").

    Usage::

        with profiling.xla_trace("/tmp/jax-trace"):
            solver(scen, init, duals)

    Writes a TensorBoard-compatible device trace (op timeline, fusion
    boundaries, HBM traffic) — the deep-dive companion to the wall-clock
    phase timers above. Thin alias so callers need no jax.profiler import.
    """
    import jax.profiler

    return jax.profiler.trace(log_dir)


def active_constraints_report(spec, result, scenario) -> Dict[str, float]:
    """Per-class active-inequality counters at the returned iterate
    (SURVEY.md §6 observability: "counters (iterations, KKT residuals,
    active constraints)"). A constraint counts as active when its value is
    within tol of the boundary or violated (g > −tol) — the set the AL
    multipliers are actually shaping. Means are per scenario.
    """
    import numpy as np

    from mpc_local_planner_tpu.ocp import constraints as C

    p = result.primal
    tol = 1e-3
    out: Dict[str, float] = {}

    def classes_of(p, scenario):
        # the constraint kernels are unbatched by design (the solver vmaps
        # them); mirror that here
        return {
            "obstacle": C.obstacle_inequalities(spec, p.xs, p.dt, scenario),
            "rate": C.control_rate_inequalities(spec, p.us, p.dt, scenario.u_prev),
            "box": C.control_box_inequalities(spec, p.us),
            "dt": C.dt_inequalities(spec, p.dt, p.xs.dtype),
            "ball": C.terminal_ball_inequality(spec, p.xs, scenario.xf),
        }

    batch_ndim = p.xs.ndim - 2  # leading scenario axes, if any
    fn = classes_of
    for _ in range(batch_ndim):
        fn = jax.vmap(fn)
    classes = fn(p, scenario)
    for name, g in classes.items():
        g = np.asarray(g)
        active = g > -tol
        per_scen = active.reshape(active.shape[:batch_ndim] + (-1,)).sum(-1)
        out[f"active_{name}_mean"] = float(per_scen.mean())
        out[f"active_{name}_max"] = int(per_scen.max()) if per_scen.size else 0
    return out


def convergence_report(result) -> Dict[str, float]:
    """Ensemble convergence/feasibility counters (SURVEY.md §6 metrics)."""
    import numpy as np

    eq = np.asarray(result.eq_norm).ravel()
    viol = np.asarray(result.ineq_viol).ravel()
    conv = np.asarray(result.converged).ravel()
    return {
        "n_scenarios": int(eq.size),
        "converged_frac": float(conv.mean()) if eq.size else 0.0,
        "eq_p50": float(np.percentile(eq, 50)) if eq.size else 0.0,
        "eq_p99": float(np.percentile(eq, 99)) if eq.size else 0.0,
        "viol_p50": float(np.percentile(viol, 50)) if viol.size else 0.0,
        "viol_p99": float(np.percentile(viol, 99)) if viol.size else 0.0,
        "diverged_frac": float(((eq > 0.5) | (viol > 0.5)).mean()) if eq.size else 0.0,
    }
