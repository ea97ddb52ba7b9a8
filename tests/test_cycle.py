"""planner/cycle.make_fleet_cycle — the extracted fleet warm-cycle policy.

Pins the per-lane policy the benches relied on implicitly while each carried
its own copy (VERDICT r4 weak #5): converged lanes advance with executed-
control feedback, sane-unconverged lanes continue from their iterate,
diverged lanes reset fresh (NaN-safe), and the rescue/fresh_init hooks are
honored.
"""

import dataclasses as dc

import jax
import jax.numpy as jnp
import numpy as np

from mpc_local_planner_tpu.benchmarks import config3_carlike_min_time, random_ensemble
from mpc_local_planner_tpu.ocp.grid import initial_primal
from mpc_local_planner_tpu.planner.cycle import make_fleet_cycle
from mpc_local_planner_tpu.solvers.al_sqp import (
    SolverSettings,
    init_duals,
    solve_single,
)

B = 8


def _fixture():
    spec = config3_carlike_min_time(N=8, obstacle_cap=0)
    warm = SolverSettings(
        n_al=2, n_sqp=3, rho0=120.0, reg0=1.0, tol_eq=1e-3, tol_ineq=1e-3,
        alphas=(1.0, 0.5, 0.22),
    )
    scen = random_ensemble(spec, B, jax.random.PRNGKey(5))
    scen = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32) if a.dtype == jnp.float64 else a, scen
    )
    scen = dc.replace(scen, xf=scen.x0 + 0.35 * (scen.xf - scen.x0))
    init = initial_primal(spec, scen)
    duals0 = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (B,) + a.shape),
        init_duals(spec, warm, dtype=jnp.float32),
    )
    cold = SolverSettings.for_spec(spec)
    r = jax.jit(jax.vmap(lambda s, i, d: solve_single(spec, cold, s, i, d)))(
        scen, init, duals0
    )
    return spec, warm, scen, duals0, r


def test_converged_lanes_advance_unconverged_hold_state():
    spec, warm, scen, duals0, r = _fixture()
    cycle = jax.jit(make_fleet_cycle(spec, warm, duals0))
    scen2, r2 = cycle(scen, r)
    conv = np.asarray(r.converged)
    x1 = np.asarray(r.primal.xs[:, 1, :])
    u0 = np.asarray(r.primal.us[:, 0, :])
    for b in range(B):
        if conv[b]:
            # advanced to the previous solution's next state, executed
            # control fed back
            np.testing.assert_array_equal(np.asarray(scen2.x0[b]), x1[b])
            np.testing.assert_array_equal(np.asarray(scen2.u_prev[b]), u0[b])
        else:
            np.testing.assert_array_equal(
                np.asarray(scen2.x0[b]), np.asarray(scen.x0[b])
            )
    assert r2.converged.shape == (B,)


def test_diverged_lanes_reset_with_fresh_init_hook():
    spec, warm, scen, duals0, r = _fixture()
    conv = np.asarray(r.converged)
    bad = int(np.nonzero(conv)[0][0])  # poison a converged lane
    r = dc.replace(
        r,
        primal=dc.replace(r.primal, xs=r.primal.xs.at[bad].set(jnp.nan)),
        eq_norm=r.eq_norm.at[bad].set(jnp.nan),
        converged=r.converged.at[bad].set(False),
    )
    called = {}

    def fresh(s):
        called["yes"] = True
        return initial_primal(spec, s)

    cycle = jax.jit(make_fleet_cycle(spec, warm, duals0, fresh_init=fresh))
    _scen2, r2 = cycle(scen, r)
    assert called.get("yes")
    # the poisoned lane restarted fresh: finite again (continuing from the
    # NaN iterate would have stayed NaN through the solve)
    assert bool(jnp.all(jnp.isfinite(r2.primal.xs[bad])))


def test_stuck_restart_rebases_persistent_stragglers():
    """stuck_restart=S (r5): a lane unconverged S consecutive cycles
    restarts from fresh_init with fresh duals; the SAME compiled cycle with
    a zero counter continues instead — other lanes are bit-identical (lane
    independence under vmap), the restarted lane differs, and its counter
    resets."""
    spec, warm, scen, duals0, r = _fixture()
    conv = np.asarray(r.converged)
    if conv[0]:  # force lane 0 to be a sane straggler
        r = dc.replace(r, converged=r.converged.at[0].set(False))
    cyc = jax.jit(make_fleet_cycle(spec, warm, duals0, stuck_restart=2))
    stuck_hot = jnp.zeros((B,), jnp.int32).at[0].set(2)   # at the limit
    stuck_cold = jnp.zeros((B,), jnp.int32)
    s_a, r_a, st_a = cyc(scen, r, stuck_hot)
    s_b, r_b, st_b = cyc(scen, r, stuck_cold)
    # the restarted lane was rebased (different iterate than continue)
    assert not np.allclose(
        np.asarray(r_a.primal.xs[0]), np.asarray(r_b.primal.xs[0])
    )
    # counter resets on restart
    assert int(st_a[0]) == 0
    # every other lane is bit-identical between the two runs
    for b in range(1, B):
        np.testing.assert_array_equal(
            np.asarray(r_a.primal.xs[b]), np.asarray(r_b.primal.xs[b])
        )


def test_rescue_hook_is_chained_after_solve():
    spec, warm, scen, duals0, r = _fixture()
    seen = {}

    def fake_rescue(scenario, result):
        seen["conv_in"] = np.asarray(result.converged).copy()
        return result

    # eager (no jit): the probe hook reads concrete arrays
    cycle = make_fleet_cycle(spec, warm, duals0, rescue=fake_rescue)
    _scen2, r2 = cycle(scen, r)
    # rescue saw the post-solve result (shape check suffices: the hook ran
    # inside the traced cycle on the solve output)
    assert seen["conv_in"].shape == (B,)
    np.testing.assert_array_equal(np.asarray(r2.converged), seen["conv_in"])
