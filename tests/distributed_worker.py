"""Worker process for tests/test_distributed.py (not a pytest module).

Joins a 2-process CPU "cluster" via mpc_local_planner_tpu.parallel.distributed,
builds the global ('dcn', 'ici') mesh, runs a tiny sharded ensemble solve with
its process-local batch slice, and prints the global summary — exercising the
exact multi-host code path of a TPU pod slice (coordination service, global
device set, DCN-axis reductions) on localhost CPU.

Usage: python distributed_worker.py <coordinator> <num_procs> <pid>
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from mpc_local_planner_tpu.parallel import distributed  # noqa: E402


def main():
    coordinator, nprocs, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    distributed.initialize(coordinator, nprocs, pid)
    assert jax.process_count() == nprocs
    mesh = distributed.global_mesh()
    assert mesh.shape == {"dcn": nprocs, "ici": jax.local_device_count()}

    from jax.sharding import NamedSharding, PartitionSpec as P

    from mpc_local_planner_tpu.benchmarks import config3_carlike_min_time, random_ensemble
    from mpc_local_planner_tpu.ocp.grid import initial_primal
    from mpc_local_planner_tpu.parallel.sharding import ensemble_summary
    from mpc_local_planner_tpu.solvers.al_sqp import (
        SolverSettings,
        init_duals,
        solve_single,
    )

    spec = config3_carlike_min_time(N=5, obstacle_cap=2)
    settings = SolverSettings(n_al=2, n_sqp=2)
    global_batch = 8
    # every process builds the same global ensemble, then feeds only its slice
    scen = random_ensemble(spec, global_batch, jax.random.PRNGKey(7))
    init = initial_primal(spec, scen)
    duals = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (global_batch,) + a.shape),
        init_duals(spec, settings, dtype=jnp.float32),
    )
    sl = distributed.process_local_batch(global_batch)
    sharding = NamedSharding(mesh, P(("dcn", "ici")))

    def to_global(a):
        import numpy as np

        return jax.make_array_from_process_local_data(
            jax.sharding.NamedSharding(
                mesh, P(("dcn", "ici"), *([None] * (a.ndim - 1)))
            ),
            np.asarray(a[sl]),
            a.shape,
        )

    scen, init, duals = (
        jax.tree_util.tree_map(to_global, t) for t in (scen, init, duals)
    )

    @jax.jit
    def run(s, i, d):
        r = jax.vmap(lambda s_, i_, d_: solve_single(spec, settings, s_, i_, d_))(
            s, i, d
        )
        return ensemble_summary(r)

    n_conv, mean_cost, max_eq, max_viol = jax.block_until_ready(run(scen, init, duals))
    # the summary is a global reduction — identical on every process
    print(
        f"RESULT pid={pid} n_conv={int(n_conv)} mean_cost={float(mean_cost):.6f} "
        f"max_eq={float(max_eq):.6f}",
        flush=True,
    )
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
