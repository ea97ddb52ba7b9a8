"""Profiling / observability helpers (parity: SURVEY.md §6 tracing —
OptimalControlResult.cpu_time, IPOPT timing statistics, and the build plan's
per-phase timers + XLA profiler hooks + active-constraint counters)."""

import jax
import jax.numpy as jnp

from mpc_local_planner_tpu import profiling
from mpc_local_planner_tpu.benchmarks import config3_carlike_min_time, random_ensemble
from mpc_local_planner_tpu.ocp.grid import initial_primal
from mpc_local_planner_tpu.solvers.al_sqp import (
    SolverSettings,
    init_duals,
    solve_single,
)


def _solved(batch=3):
    spec = config3_carlike_min_time(N=8, obstacle_cap=3)
    st = SolverSettings(n_al=2, n_sqp=3, tol_eq=1e-3, tol_ineq=1e-3)
    scen = random_ensemble(spec, batch, jax.random.PRNGKey(0))
    init = initial_primal(spec, scen)
    duals = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (batch,) + a.shape),
        init_duals(spec, st, dtype=jnp.float32),
    )
    r = jax.jit(jax.vmap(lambda s, i, d: solve_single(spec, st, s, i, d)))(
        scen, init, duals
    )
    return spec, st, scen, init, duals, r


def test_profile_solver_phases_returns_positive_times():
    spec, st, scen, init, duals, _ = _solved()
    out = profiling.profile_solver_phases(spec, st, scen, init, duals, iters=1)
    assert set(out) == {"full_iteration", "line_search_merits"}
    assert all(v > 0.0 for v in out.values())


def test_convergence_report_counters():
    *_, r = _solved(batch=4)
    rep = profiling.convergence_report(r)
    assert rep["n_scenarios"] == 4
    assert 0.0 <= rep["converged_frac"] <= 1.0
    assert rep["eq_p50"] <= rep["eq_p99"]
    assert 0.0 <= rep["diverged_frac"] <= 1.0


def test_active_constraints_report_counts_by_class():
    spec, _, scen, _, _, r = _solved(batch=4)
    rep = profiling.active_constraints_report(spec, r, scen)
    for cls in ("obstacle", "rate", "box", "dt", "ball"):
        assert f"active_{cls}_mean" in rep
        assert rep[f"active_{cls}_max"] >= rep[f"active_{cls}_mean"] - 1e-9
    # min-time solutions ride the control box: some box rows must be active
    assert rep["active_box_mean"] > 0.0
    # ball constraint is disabled on this config → never active (sentinel)
    assert rep["active_ball_max"] == 0


def test_xla_trace_writes_profile(tmp_path):
    spec, st, scen, init, duals, _ = _solved(batch=2)
    with profiling.xla_trace(str(tmp_path)):
        jax.block_until_ready(
            jax.jit(jax.vmap(lambda s, i, d: solve_single(spec, st, s, i, d)))(
                scen, init, duals
            ).cost
        )
    assert any(tmp_path.rglob("*"))  # trace artifacts were written
