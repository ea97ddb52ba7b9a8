"""Persistent XLA compilation cache.

Role in the design: grid adaptation (``grid.variable_grid.grid_adaptation``)
hops between fixed-shape compiled solves — one per horizon N (the host-side
N ladder, SURVEY.md §8). First-time compilation of each rung costs tens of
seconds on TPU; the persistent cache makes that a once-per-machine cost
instead of once-per-process, which is what a production planner (reference
parity: a ROS node that restarts with the robot) needs.

No reference counterpart — C++ binaries don't JIT. This is the TPU-native
analog of shipping a compiled binary.
"""

from __future__ import annotations

import os


def enable_persistent_cache(path: str | None = None) -> str:
    """Point JAX's compilation cache at ``path`` (default:
    ``~/.cache/mpc_local_planner_tpu/xla``). Safe to call more than once.

    Returns the cache directory in use.
    """
    import jax

    if path is None:
        path = os.path.join(
            os.path.expanduser("~"), ".cache", "mpc_local_planner_tpu", "xla"
        )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache every program, even fast-compiling ones: the planner's N ladder
    # is many medium-sized programs, not one big one
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return path
