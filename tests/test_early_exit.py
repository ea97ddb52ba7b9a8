"""Converge-or-budget-exhausted outer loop (SolverSettings.early_exit).

Parity: `solver.ipopt.max_cpu_time`/`max_iter` budget semantics — IPOPT
stops when converged, not after a fixed schedule (SURVEY Appendix A). The
serving preset uses this to spend the 100 ms cycle budget only when needed.
"""

import dataclasses as dc

import jax
import jax.numpy as jnp
import numpy as np

from mpc_local_planner_tpu.benchmarks import config3_carlike_min_time, random_ensemble
from mpc_local_planner_tpu.ocp.grid import initial_primal
from mpc_local_planner_tpu.solvers.al_sqp import (
    SolverSettings,
    init_duals,
    solve_single,
)


def test_early_exit_converges_like_fixed_schedule():
    spec = config3_carlike_min_time(N=10, obstacle_cap=0)
    B = 6
    scen = random_ensemble(spec, B, jax.random.PRNGKey(4))
    scen = dc.replace(scen, xf=scen.x0 + 0.4 * (scen.xf - scen.x0))
    init = initial_primal(spec, scen)
    fixed = SolverSettings.for_spec(spec, n_al=10, n_sqp=8)
    ee = dc.replace(fixed, early_exit=True)
    duals = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (B,) + a.shape),
        init_duals(spec, fixed, dtype=jnp.float32),
    )
    r_fix = jax.jit(
        jax.vmap(lambda s, i, d: solve_single(spec, fixed, s, i, d))
    )(scen, init, duals)
    r_ee = jax.jit(
        jax.vmap(lambda s, i, d: solve_single(spec, ee, s, i, d))
    )(scen, init, duals)
    # same instances converge (the cap is identical; early exit only stops
    # sooner once feasible)
    np.testing.assert_array_equal(
        np.asarray(r_fix.converged), np.asarray(r_ee.converged)
    )
    # early-exit results are feasible to tolerance on converged lanes
    conv = np.asarray(r_ee.converged)
    assert (np.asarray(r_ee.eq_norm)[conv] < fixed.tol_eq).all()
    assert (np.asarray(r_ee.ineq_viol)[conv] < fixed.tol_ineq).all()
    # unbatched (scalar while condition) path works too
    lane = jax.tree_util.tree_map(lambda a: a[0], (scen, init, duals))
    r1 = jax.jit(lambda s, i, d: solve_single(spec, ee, s, i, d))(*lane)
    assert bool(r1.converged) == bool(r_ee.converged[0])


def test_early_exit_never_dispatches_fused():
    """The fused kernel unrolls its schedule and cannot honor a while-loop
    budget cap — the admission predicate (factored out as
    fused_dispatch_ok, which the custom_vmap rule calls) must reject
    early_exit even when every other gate passes."""
    from mpc_local_planner_tpu.benchmarks import random_ensemble
    from mpc_local_planner_tpu.solvers.al_sqp import fused_dispatch_ok

    spec = config3_carlike_min_time(N=8, obstacle_cap=4)
    scen = random_ensemble(spec, 4, jax.random.PRNGKey(0), dtype=jnp.float32)
    base = SolverSettings(n_al=3, n_sqp=4)
    # every other gate passes on a hypothetical TPU backend…
    assert fused_dispatch_ok(spec, base, scen, jnp.float32, "tpu")
    # …and early_exit alone flips the decision
    ee = dc.replace(base, early_exit=True)
    assert not fused_dispatch_ok(spec, ee, scen, jnp.float32, "tpu")
    # sanity on the other gates the predicate owns
    assert not fused_dispatch_ok(spec, base, scen, jnp.float32, "cpu")
    assert not fused_dispatch_ok(spec, base, scen, jnp.float64, "tpu")
    deep = dc.replace(base, n_al=5, n_sqp=4)  # 20 > 16 unrolled budget
    assert not fused_dispatch_ok(spec, deep, scen, jnp.float32, "tpu")
