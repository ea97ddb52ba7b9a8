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


def test_sharded_per_shard_rescue_matches_manual_blocks():
    """rescue_slots on the sharded solver: each device compacts and
    re-solves ITS OWN stragglers (collective-free). Equality target: the
    unsharded solve followed by the rescue applied manually per 2-lane
    shard block (r4; mixed-convergence min-time fixture)."""
    import dataclasses as dc

    from mpc_local_planner_tpu.benchmarks import config3_carlike_min_time
    from mpc_local_planner_tpu.solvers.rescue import make_rescue

    spec = config3_carlike_min_time(N=8, obstacle_cap=0)
    B = 16
    tiny = SolverSettings.for_spec(spec, n_al=6, n_sqp=8)
    deeper = dc.replace(tiny, n_al=10, n_sqp=10)
    scen = random_ensemble(spec, B, jax.random.PRNGKey(2))
    scen = dc.replace(scen, xf=scen.x0 + 0.4 * (scen.xf - scen.x0))
    scen = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32) if a.dtype == jnp.float64 else a, scen
    )
    init = initial_primal(spec, scen)
    duals = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (B,) + a.shape),
        init_duals(spec, tiny, dtype=jnp.float32),
    )
    mesh = make_mesh()
    per_shard = B // mesh.devices.size
    sv = make_sharded_solver(
        spec, tiny, mesh, rescue_slots=per_shard, rescue_settings=deeper
    )
    scen_s, init_s, duals_s = (shard_batch(t, mesh) for t in (scen, init, duals))
    r = sv(scen_s, init_s, duals_s)

    plain = make_sharded_solver(spec, tiny, mesh=None)
    r0 = plain(scen, init, duals)
    resc = jax.jit(make_rescue(spec, tiny, per_shard, rescue_settings=deeper))
    conv_ref, xs_ref = [], []
    for s0 in range(0, B, per_shard):
        blk_s, blk_r = jax.tree_util.tree_map(
            lambda a: a[s0 : s0 + per_shard], (scen, r0)
        )
        out = resc(blk_s, blk_r)
        conv_ref.append(np.asarray(out.converged))
        xs_ref.append(np.asarray(out.primal.xs))
    conv_ref = np.concatenate(conv_ref)
    assert 0 < conv_ref.sum() < B  # fixture keeps a real mix
    np.testing.assert_array_equal(np.asarray(r.converged), conv_ref)
    np.testing.assert_allclose(
        np.asarray(r.primal.xs), np.concatenate(xs_ref), atol=2e-5
    )
