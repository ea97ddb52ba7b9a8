"""Weak-scaling benchmark: solves/s vs device count at fixed per-device batch.

Prints one JSON line per device count plus a summary with weak-scaling
efficiency (BASELINE.json: ≥80% at ≥2 hosts). On a multi-chip slice the mesh
shards scenarios over ('dcn','ici'); under
XLA_FLAGS=--xla_force_host_platform_device_count=K it validates the scaling
harness on virtual devices (same code path, no real parallel speedup).
"""

from __future__ import annotations

import json
import os
import time

import jax

# NOTE this environment preloads jax on the axon TPU platform via
# sitecustomize, so JAX_PLATFORMS in the environment arrives too late;
# switch via jax.config (same workaround as tests/conftest.py).
if os.environ.get("BENCH_SCALING_CPU"):
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp


def run(per_device_batch: int = 1024, cycles: int = 4):
    from mpc_local_planner_tpu.benchmarks import config3_carlike_min_time, random_ensemble
    from mpc_local_planner_tpu.ocp.grid import initial_primal
    from mpc_local_planner_tpu.parallel.sharding import make_mesh, make_sharded_solver, shard_batch
    from mpc_local_planner_tpu.solvers.al_sqp import SolverSettings, init_duals

    spec = config3_carlike_min_time(N=30, obstacle_cap=8)
    settings = SolverSettings(n_al=3, n_sqp=3, rho0=50.0, reg0=1.0, tol_eq=1e-3, tol_ineq=1e-3)
    devices = jax.devices()
    results = []
    counts = [n for n in (1, 2, 4, 8, 16, 32) if n <= len(devices)]
    for n_dev in counts:
        batch = per_device_batch * n_dev
        mesh = make_mesh(n_dcn=1, n_ici=n_dev, devices=devices[:n_dev])
        with jax.default_device(jax.devices("cpu")[0]):
            scen = random_ensemble(spec, batch, jax.random.PRNGKey(0))
            init = initial_primal(spec, scen)
            duals = jax.tree_util.tree_map(
                lambda a: jnp.broadcast_to(a, (batch,) + a.shape),
                init_duals(spec, settings, dtype=jnp.float32),
            )
        scen, init, duals = (shard_batch(t, mesh) for t in (scen, init, duals))
        solver = make_sharded_solver(spec, settings, mesh)
        r = solver(scen, init, duals)
        _ = int(jnp.sum(r.converged))
        t0 = time.perf_counter()
        for _i in range(cycles):
            r = solver(scen, init, duals)
        _ = int(jnp.sum(r.converged))
        dt = (time.perf_counter() - t0) / cycles
        sps = batch / dt
        results.append((n_dev, sps))
        print(json.dumps({"devices": n_dev, "batch": batch, "solves_per_s": round(sps, 1)}))
    if len(results) > 1:
        base = results[0][1]
        eff = results[-1][1] / (base * results[-1][0])
        print(json.dumps({
            "metric": "weak_scaling_efficiency",
            "value": round(eff, 3),
            "unit": f"x{results[-1][0]} devices vs x1",
            "vs_baseline": round(eff / 0.8, 2),
        }))


if __name__ == "__main__":
    run()
