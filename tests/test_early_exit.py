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
    from mpc_local_planner_tpu.solvers.al_sqp import solve_single_auto

    spec = config3_carlike_min_time(N=8, obstacle_cap=4)
    ee = SolverSettings(n_al=3, n_sqp=4, early_exit=True)
    # the guard is in the custom_vmap rule: on CPU it falls back anyway, so
    # assert the decision input directly — the fused kernel unrolls its
    # schedule and cannot honor a while budget
    assert ee.early_exit
    fn = solve_single_auto(spec, ee)  # must build without error
    assert callable(fn)
