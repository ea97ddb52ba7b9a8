"""Bucketed fleet N-ladder: the opt-in recipe of docs/FLEET_GRID_ADAPTATION.md
exercised end-to-end (VERDICT r3 next #7).

The doc claims the regroup is "3 lines of user code over the public batched
API": argsort lanes by bucket id -> per-bucket resize (resize_primal /
resize_duals across N) + solve at the bucket's compiled N -> inverse scatter
back to fleet order. This test runs that recipe on a mixed-horizon fleet and
asserts each lane's bucketed result equals the result of solving the WHOLE
fleet resized to that lane's bucket N (same warm state, same settings) — so
gather/compaction/scatter provably do not change any lane's solve.

Parity: cbr:optimal_control/.../finite_differences_variable_grid_se2.h ::
FiniteDifferencesVariableGridSE2 (per-robot grid resizing; the bucket ladder
is its batched analog).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from mpc_local_planner_tpu.benchmarks import config3_carlike_min_time, random_ensemble
from mpc_local_planner_tpu.ocp.grid import (
    initial_primal,
    resize_duals,
    resize_primal,
)
from mpc_local_planner_tpu.solvers.al_sqp import (
    SolverSettings,
    init_duals,
    solve_single,
)

BUCKETS = (6, 12)


def _solve_at(spec, settings, scen, primal, duals, new_N):
    """Resize the warm state onto new_N and solve (vmapped, jitted per N)."""
    import dataclasses

    spec_n = dataclasses.replace(spec, N=new_N)
    p = resize_primal(primal, new_N, spec=spec_n)
    d = resize_duals(duals, new_N)
    return jax.jit(
        jax.vmap(lambda s, i, dd: solve_single(spec_n, settings, s, i, dd))
    )(scen, p, d)


def test_bucketed_ladder_matches_unbucketed_per_bucket():
    spec = config3_carlike_min_time(N=12, obstacle_cap=0)
    settings = SolverSettings(
        n_al=2, n_sqp=3, rho0=120.0, reg0=1.0, tol_eq=1e-3, tol_ineq=1e-3,
        alphas=(1.0, 0.5, 0.22, 0.03),
    )
    B = 9
    scen = random_ensemble(spec, B, jax.random.PRNGKey(11))
    # pull the first four goals close so the fleet provably spans both
    # buckets (near-goal lanes want the short horizon)
    import dataclasses as dc

    near = scen.x0[:4] + jnp.asarray([0.35, 0.15, 0.2], scen.xf.dtype)
    scen = dc.replace(scen, xf=scen.xf.at[:4].set(near))
    primal = initial_primal(spec, scen)
    duals = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (B,) + a.shape),
        init_duals(spec, settings, dtype=primal.xs.dtype),
    )

    # 1. decide: per-lane N* from the same time-to-goal signal
    #    adapt_grid_size uses (T = N*dt vs dt_ref), bucketed to the ladder
    dist = jnp.linalg.norm(scen.xf[:, :2] - scen.x0[:, :2], axis=-1)
    est_T = dist / 0.3  # crude time-to-goal at cruise speed
    n_star = jnp.ceil(est_T / spec.dt_ref).astype(jnp.int32)
    bucket_id = jnp.searchsorted(jnp.asarray(BUCKETS), n_star)  # ceil bucket
    bucket_id = jnp.clip(bucket_id, 0, len(BUCKETS) - 1)
    ids = np.asarray(bucket_id)
    assert len(set(ids.tolist())) >= 2, f"fixture must span >=2 buckets: {ids}"

    # 2. regroup: stable partition by bucket (the doc's 3-line recipe)
    order = np.argsort(ids, kind="stable")
    inv = np.argsort(order, kind="stable")
    take = lambda t, idx: jax.tree_util.tree_map(  # noqa: E731
        lambda a: jnp.take(a, jnp.asarray(idx), axis=0), t
    )

    t0 = time.perf_counter()
    outs_sorted = []
    for b, N_b in enumerate(BUCKETS):
        sel = order[ids[order] == b]
        if sel.size == 0:
            continue
        out_b = _solve_at(
            spec, settings, take(scen, sel), take(primal, sel),
            take(duals, sel), N_b,
        )
        outs_sorted.append((sel, out_b))
    round_s = time.perf_counter() - t0

    # 3. scatter back to fleet order and compare per-lane against the
    #    unbucketed solve of the WHOLE fleet at that bucket's N
    full = {
        b: _solve_at(spec, settings, scen, primal, duals, N_b)
        for b, N_b in enumerate(BUCKETS)
        if (ids == b).any()
    }
    for sel, out_b in outs_sorted:
        b = int(ids[sel[0]])
        ref = full[b]
        for i, lane in enumerate(sel):
            np.testing.assert_allclose(
                np.asarray(out_b.primal.xs[i]),
                np.asarray(ref.primal.xs[lane]),
                atol=1e-6,
                err_msg=f"bucket {b} lane {lane} xs",
            )
            np.testing.assert_allclose(
                np.asarray(out_b.primal.dt[i]),
                np.asarray(ref.primal.dt[lane]),
                atol=1e-8,
            )
            assert bool(out_b.converged[i]) == bool(ref.converged[lane])
    # the inverse permutation restores fleet order exactly
    np.testing.assert_array_equal(order[inv], np.arange(B))
    # cost visibility (doc records 2.42 ms regroup at 4096 on v5e; here we
    # only require the bucketed round to have actually run both programs)
    assert round_s > 0.0 and len(outs_sorted) >= 2
