"""Controller-level rescue + early-exit config surface (r4).

Parity: `solver.ipopt.max_iter`/`max_cpu_time` budget semantics (early
exit) and the per-lane budget reallocation (rescue) exposed through the
reference-style `solver` YAML namespace.
"""

import dataclasses as dc

import jax
import jax.numpy as jnp
import numpy as np

from mpc_local_planner_tpu.geometry.obstacles import ObstacleSet
from mpc_local_planner_tpu.ocp.spec import Scenario
from mpc_local_planner_tpu.planner.config import load_config
from mpc_local_planner_tpu.planner.controller import Controller

BASE = {
    "grid": {
        "grid_size_ref": 10,
        "dt_ref": 0.3,
        "xf_fixed": [True, True, True],
        "variable_grid": {"enable": True, "min_dt": 0.001, "max_dt": 0.5},
    },
    "planning": {"objective": {"type": "minimum_time"}},
    "collision": {"obstacle_capacity": 0},
    "solver": {"tol_eq": 0.001, "tol_ineq": 0.001},
}


def _scen(B, key=3):
    k1, k2 = jax.random.split(jax.random.PRNGKey(key))
    ang = jax.random.uniform(k1, (B,), minval=-0.6, maxval=0.6)
    dist = jax.random.uniform(k2, (B,), minval=0.7, maxval=1.3)
    xf = jnp.stack([dist * jnp.cos(ang), dist * jnp.sin(ang), ang], axis=-1)
    return Scenario(
        x0=jnp.zeros((B, 3), jnp.float32),
        xf=xf.astype(jnp.float32),
        obstacles=jax.tree_util.tree_map(
            lambda a: jnp.broadcast_to(a, (B,) + a.shape),
            ObstacleSet.empty(0, 0, 0, 0),
        ),
        via_points=jnp.zeros((B, 0, 3), jnp.float32),
        via_mask=jnp.zeros((B, 0), bool),
        u_prev=jnp.zeros((B, 2), jnp.float32),
    )


def test_controller_rescue_slots_improves_or_matches_conv():
    B = 6
    cfg_plain = load_config(BASE)
    cfg_rescue = load_config(
        {**BASE, "solver": {**BASE["solver"], "rescue_slots": 4}}
    )
    scen = _scen(B)
    # shallow warm budget so the first (cold-path) solve leaves stragglers
    cfg_plain = dc.replace(
        cfg_plain, solver=dc.replace(cfg_plain.solver, iterations=4,
                                     inner_iterations=5)
    )
    cfg_rescue = dc.replace(
        cfg_rescue, solver=dc.replace(cfg_rescue.solver, iterations=4,
                                      inner_iterations=5)
    )
    # the rescue applies to WARM-budget cycles only (ADVICE r4: its 4x4
    # continue budget is sized for warm stragglers, not the cold schedule),
    # so step twice: the cold step is identical for both controllers, and
    # the second (warm) step is where the rescue engages
    ctrl_plain, ctrl_resc = Controller(cfg_plain, batch=B), Controller(cfg_rescue, batch=B)
    r_plain0, r_resc0 = ctrl_plain.step(scen), ctrl_resc.step(scen)
    np.testing.assert_array_equal(
        np.asarray(r_plain0.solve.converged), np.asarray(r_resc0.solve.converged)
    )
    r_plain = ctrl_plain.step(scen)
    r_resc = ctrl_resc.step(scen)
    c0 = np.asarray(r_plain.solve.converged)
    c1 = np.asarray(r_resc.solve.converged)
    # rescue never loses a converged lane, and converged lanes' solutions
    # pass through the scatter untouched
    assert (c1 | ~c0).all(), (c0, c1)
    for b in np.nonzero(c0)[0]:
        np.testing.assert_array_equal(
            np.asarray(r_resc.solve.primal.xs[b]),
            np.asarray(r_plain.solve.primal.xs[b]),
        )
    assert c1.sum() >= c0.sum()


def test_controller_early_exit_unbatched():
    cfg = load_config({**BASE, "solver": {**BASE["solver"], "early_exit": True}})
    ctrl = Controller(cfg)
    scen = jax.tree_util.tree_map(lambda a: a[0], _scen(1))
    r = ctrl.step(scen)
    assert r.u0.shape == (2,)
    assert bool(jnp.isfinite(r.solve.eq_norm))
    # the settings carry the flag through both presets
    assert ctrl.settings.early_exit and ctrl.warm_settings.early_exit


def test_goal_only_scenario_padded_to_spec_capacities():
    """README-quickstart shape: Scenario.goal_only under an
    obstacle-enabled config is padded with masked slots up to
    spec.obstacle_cap (r4 fix — it used to shape-mismatch the compiled
    solve); over-capacity raises."""
    import pytest

    cfg = load_config(
        {**BASE, "collision": {"obstacle_capacity": 6}}
    )
    ctrl = Controller(cfg)
    scen = jax.tree_util.tree_map(lambda a: a[0], _scen(1))
    r = ctrl.step(scen)  # goal_only-style empty obstacle set, cap 6
    assert r.u0.shape == (2,)
    # over capacity: a 8-slot set into a 6-cap spec
    big = ObstacleSet.empty(8, 0, 0, 0)
    scen_big = dc.replace(scen, obstacles=big)
    with pytest.raises(ValueError, match="obstacle slots"):
        ctrl.step(scen_big)
