"""TPU-optimized ops: closed-form small-matrix linear algebra, Pallas kernels.

Replaces the generic LAPACK-style paths (jnp.linalg.solve → batched LU with
pivoting) that lower catastrophically on TPU for the tiny (2×2/3×3/6×6)
blocks this workload is made of (SURVEY.md §8 step 5 / hard part #2).
"""

from mpc_local_planner_tpu.ops.smallmat import (
    inv2,
    inv3,
    solve2,
    solve3,
    solve_psd,
)

__all__ = ["inv2", "inv3", "solve2", "solve3", "solve_psd"]
