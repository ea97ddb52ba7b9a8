"""Serving-runtime demo: drive a rolling journey stream for a few blocks.

Parity: the production loop the reference gets from move_base
(`computeVelocityCommands` at `controller_frequency` + recovery-behavior
replanning on failure), batched — E journeys advance through warm MPC
cycles inside one compiled `lax.scan` block; journeys retire on
goal-reached or stuck-abandon and redraw in-graph. See
`mpc_local_planner_tpu/planner/serving.py` and BENCH_NOTES r5.

    python examples/demo_serving.py [n_journeys] [cycles_per_block] [blocks]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    E = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    blocks = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    import jax

    from mpc_local_planner_tpu.benchmarks import (
        config3_carlike_min_time,
        random_ensemble,
    )
    from mpc_local_planner_tpu.planner.serving import JourneyStream, StreamSettings
    from mpc_local_planner_tpu.solvers.al_sqp import SolverSettings
    from mpc_local_planner_tpu.utils.compilation_cache import enable_persistent_cache

    enable_persistent_cache()
    spec = config3_carlike_min_time(N=30, obstacle_cap=8)
    # serving preset: converge-or-budget-exhausted (the ipopt.max_iter analog)
    warm = SolverSettings(
        n_al=8, n_sqp=4, rho0=120.0, reg0=1.0, tol_eq=1e-3, tol_ineq=1e-3,
        alphas=(1.0, 0.5, 0.22), early_exit=True,
    )
    stream = JourneyStream(
        spec, warm,
        redraw_fn=lambda key, n: random_ensemble(spec, n, key),
        settings=StreamSettings(),
    )
    print(f"cold-planning {E} journeys ...", flush=True)
    state = stream.init(E, jax.random.PRNGKey(0))
    run = stream.block_fn(K)
    state, _ = run(state)  # compile + settle
    float(state.result.cost.sum())

    total = dict(conv=0, reached=0, abandoned=0, cycles=0)
    for b in range(blocks):
        t0 = time.perf_counter()
        state, stats = run(state)
        n_conv = int(stats.converged.sum())  # host fetch forces the block
        dt_ms = (time.perf_counter() - t0) * 1e3 / K
        total["conv"] += n_conv
        total["reached"] += int(stats.reached.sum())
        total["abandoned"] += int(stats.abandoned.sum())
        total["cycles"] += K * E
        print(
            f"block {b + 1}/{blocks}: {dt_ms:.2f} ms/cycle, "
            f"conv {n_conv / (K * E):.3f}, "
            f"goals +{int(stats.reached.sum())}, "
            f"abandons +{int(stats.abandoned.sum())}",
            flush=True,
        )
    print(
        f"stream totals: conv {total['conv'] / total['cycles']:.4f} over "
        f"{total['cycles']} lane-cycles, {total['reached']} goals reached, "
        f"{total['abandoned']} journeys abandoned (classify them offline "
        "with stream.audit_abandoned — see bench.py serving mode)"
    )


if __name__ == "__main__":
    main()
