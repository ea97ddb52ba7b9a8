"""Ensemble robustness: batched random scenarios in float32 (the TPU regime).

Parity: SURVEY.md §6 failure-detection — batched solves fail independently;
NaN quarantine must hold and the cold-start convergence rate must stay high.
"""

import jax
import jax.numpy as jnp

from mpc_local_planner_tpu.benchmarks import (
    config2_diffdrive_obstacles,
    config3_carlike_min_time,
    random_ensemble,
)
from mpc_local_planner_tpu.ocp.grid import initial_primal
from mpc_local_planner_tpu.solvers.al_sqp import (
    SolverSettings,
    init_duals,
    solve_single,
)


def _run(spec, settings, batch=32, seed=0):
    scen = random_ensemble(spec, batch, jax.random.PRNGKey(seed), dtype=jnp.float32)
    init = initial_primal(spec, scen)
    duals = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (batch,) + a.shape),
        init_duals(spec, settings, dtype=jnp.float32),
    )
    return jax.jit(
        jax.vmap(lambda s, i, d: solve_single(spec, settings, s, i, d))
    )(scen, init, duals)


def test_carlike_min_time_ensemble_f32():
    spec = config3_carlike_min_time(N=30, obstacle_cap=8)
    r = _run(spec, SolverSettings.for_spec(spec))
    assert not bool(jnp.any(jnp.isnan(r.cost))), "NaN leaked through quarantine"
    conv_rate = float(jnp.mean(r.converged.astype(jnp.float32)))
    assert conv_rate >= 0.7, conv_rate
    # converged scenarios must be truly feasible
    eq_ok = jnp.where(r.converged, r.eq_norm, 0.0)
    assert float(jnp.max(eq_ok)) < 1e-3


def test_diffdrive_obstacle_ensemble_f32():
    spec = config2_diffdrive_obstacles(N=30, obstacle_cap=10)
    r = _run(spec, SolverSettings(n_al=8, n_sqp=10))
    assert not bool(jnp.any(jnp.isnan(r.cost)))
    conv_rate = float(jnp.mean(r.converged.astype(jnp.float32)))
    assert conv_rate >= 0.7, conv_rate
