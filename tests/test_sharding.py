"""Mesh sharding: sharded ensemble solves match unsharded, collectives work.

Runs on the virtual 8-device CPU mesh (conftest). On real hardware the same
code paths shard over ICI/DCN (SURVEY.md §8 step 6).
"""

import jax
import jax.numpy as jnp
import numpy as np

from mpc_local_planner_tpu.benchmarks import config1_unicycle_quadratic, random_ensemble
from mpc_local_planner_tpu.ocp.grid import initial_primal
from mpc_local_planner_tpu.parallel.sharding import (
    batch_spec,
    ensemble_summary,
    make_mesh,
    make_sharded_solver,
    shard_batch,
)
from mpc_local_planner_tpu.solvers.al_sqp import SolverSettings, init_duals


def _problem(batch):
    spec = config1_unicycle_quadratic(N=10)
    settings = SolverSettings(n_al=3, n_sqp=4)
    scen = random_ensemble(spec, batch, jax.random.PRNGKey(0), dtype=jnp.float32)
    init = initial_primal(spec, scen)
    duals = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (batch,) + a.shape),
        init_duals(spec, settings, dtype=jnp.float32),
    )
    return spec, settings, scen, init, duals


def test_mesh_construction():
    mesh = make_mesh()
    assert mesh.devices.size == len(jax.devices())
    assert mesh.axis_names == ("dcn", "ici")
    mesh2 = make_mesh(n_dcn=2)
    assert mesh2.devices.shape == (2, len(jax.devices()) // 2)


def test_sharded_solve_matches_unsharded():
    batch = 16
    spec, settings, scen, init, duals = _problem(batch)
    plain = make_sharded_solver(spec, settings, mesh=None)
    r_ref = plain(scen, init, duals)

    mesh = make_mesh()
    scen_s, init_s, duals_s = (shard_batch(t, mesh) for t in (scen, init, duals))
    solver = make_sharded_solver(spec, settings, mesh)
    r = solver(scen_s, init_s, duals_s)
    np.testing.assert_allclose(
        np.asarray(r.primal.us), np.asarray(r_ref.primal.us), atol=1e-5
    )
    # outputs keep the batch sharding (no gather in the solve path)
    assert len(r.primal.us.sharding.device_set) == len(jax.devices())


def test_ensemble_summary_reduces_across_devices():
    batch = 16
    spec, settings, scen, init, duals = _problem(batch)
    mesh = make_mesh()
    scen, init, duals = (shard_batch(t, mesh) for t in (scen, init, duals))
    solver = make_sharded_solver(spec, settings, mesh)
    r = solver(scen, init, duals)
    n_conv, mean_cost, max_eq, max_viol = jax.jit(ensemble_summary)(r)
    assert 0 <= int(n_conv) <= batch
    assert np.isfinite(float(mean_cost))


def test_batch_spec_covers_both_axes():
    assert batch_spec() == jax.sharding.PartitionSpec(("dcn", "ici"))
