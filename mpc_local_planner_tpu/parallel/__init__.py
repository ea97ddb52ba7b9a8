"""Parallelism: device meshes and sharded scenario-ensemble solves.

Parity note: the reference is single-threaded/single-process (SURVEY.md §3.4);
multi-chip scenario-ensemble solving is the new capability demanded by
BASELINE.json. Scenarios shard over the mesh (data parallel over ICI/DCN);
collectives are used only for global reductions (convergence counts, merit
statistics), exactly as SURVEY.md §8 step 6 prescribes.
"""

from mpc_local_planner_tpu.parallel.sharding import (
    make_mesh,
    shard_batch,
    make_sharded_solver,
    ensemble_summary,
)

__all__ = ["make_mesh", "shard_batch", "make_sharded_solver", "ensemble_summary"]
