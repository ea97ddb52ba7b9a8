"""Benchmark: batched MPC solves/s on the current accelerator.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Headline metric (BASELINE.json): MPC solves/s per chip at N=30 horizon on the
car-like ensemble. vs_baseline is measured against the implicit real-time
budget of the reference: one solve per 100 ms control cycle on one CPU core
(= 10 solves/s) — the reference publishes no throughput numbers (BASELINE.md).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def main():
    from mpc_local_planner_tpu.benchmarks import config3_carlike_min_time, random_ensemble
    from mpc_local_planner_tpu.ocp.grid import initial_primal
    from mpc_local_planner_tpu.solvers.al_sqp import (
        SolverSettings,
        init_duals,
        solve_single,
    )

    spec = config3_carlike_min_time(N=30, obstacle_cap=8)
    # warm-started MPC iteration budget (the per-cycle production config)
    settings = SolverSettings(n_al=4, n_sqp=4)
    batch = 4096
    scen = random_ensemble(spec, batch, jax.random.PRNGKey(0))
    init = initial_primal(spec, scen)
    duals = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (batch,) + a.shape),
        init_duals(spec, settings, dtype=jnp.float32),
    )

    solve = jax.jit(
        jax.vmap(lambda s, i, d: solve_single(spec, settings, s, i, d))
    )

    # compile + warm up
    r = solve(scen, init, duals)
    jax.block_until_ready(r)

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        r = solve(scen, init, duals)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / iters

    solves_per_s = batch / dt
    baseline = 10.0  # reference: 1 solve / 100 ms cycle on one CPU core
    print(
        json.dumps(
            {
                "metric": "mpc_solves_per_s_n30_carlike",
                "value": round(solves_per_s, 1),
                "unit": "solves/s",
                "vs_baseline": round(solves_per_s / baseline, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
