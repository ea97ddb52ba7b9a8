"""Round-5 solver-option parity: `solver.max_cycle_ms` (the
`ipopt.max_cpu_time` analog — SURVEY Appendix A) and `solver.polish_launches`
(the measured min-time switch-stage accuracy mitigation, BENCH_NOTES r4).
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


# --------------------------------------------------------------------------- #
# max_cycle_ms — wall-clock cycle budget at AL-phase granularity
# --------------------------------------------------------------------------- #
def test_max_cycle_ms_tiny_budget_caps_to_one_phase():
    cfg = load_config({**BASE, "solver": {**BASE["solver"], "max_cycle_ms": 5.0}})
    ctrl = Controller(cfg)
    # implied converge-or-budget semantics
    assert ctrl.warm_settings.early_exit
    # a measured phase longer than the whole budget → at most one phase
    ctrl.calibrate_cycle_budget(None, phase_ms=10.0)
    assert ctrl.warm_settings.n_al == 1
    assert ctrl.warm_settings.early_exit


def test_max_cycle_ms_generous_budget_is_plain_early_exit():
    over = {**BASE["solver"], "max_cycle_ms": 1000.0}
    cfg = load_config({**BASE, "solver": over})
    cfg_ee = load_config({**BASE, "solver": {**BASE["solver"], "early_exit": True}})
    ctrl = Controller(cfg)
    ctrl.calibrate_cycle_budget(None, phase_ms=0.5)
    # generous budget: the configured warm cap survives — identical to the
    # early_exit configuration
    assert ctrl.warm_settings == Controller(cfg_ee).warm_settings


def test_max_cycle_ms_recalibration_rederives_from_configured_cap():
    cfg = load_config(
        {
            **BASE,
            "solver": {
                **BASE["solver"],
                "max_cycle_ms": 20.0,
                "warm_iterations": 6,
            },
        }
    )
    ctrl = Controller(cfg)
    ctrl.calibrate_cycle_budget(None, phase_ms=15.0)
    assert ctrl.warm_settings.n_al == 1
    # faster hardware: the cap must re-derive from the CONFIGURED 6, not
    # from the previously capped 1
    ctrl.calibrate_cycle_budget(None, phase_ms=5.0)
    assert ctrl.warm_settings.n_al == 4
    ctrl.calibrate_cycle_budget(None, phase_ms=1.0)
    assert ctrl.warm_settings.n_al == 6


def test_max_cycle_ms_auto_calibrates_on_first_warm_cycle():
    cfg = load_config(
        {**BASE, "solver": {**BASE["solver"], "max_cycle_ms": 50.0}}
    )
    ctrl = Controller(cfg)
    scen = jax.tree_util.tree_map(lambda a: a[0], _scen(1))
    ctrl.step(scen)  # cold — no calibration yet
    assert ctrl._phase_ms is None
    r = ctrl.step(scen)  # first warm cycle measures one AL phase
    assert ctrl._phase_ms is not None and ctrl._phase_ms > 0.0
    assert 1 <= ctrl.warm_settings.n_al <= ctrl._warm_nal_cfg
    assert bool(jnp.all(jnp.isfinite(r.u0)))


def test_max_cycle_ms_unset_calibration_raises():
    import pytest

    ctrl = Controller(load_config(BASE))
    with pytest.raises(ValueError, match="max_cycle_ms"):
        ctrl.calibrate_cycle_budget(None, phase_ms=1.0)


# --------------------------------------------------------------------------- #
# stuck_restart_cycles — per-lane recovery replan
# --------------------------------------------------------------------------- #
def test_stuck_restart_cycles_counts_and_restarts(monkeypatch):
    """Counter bookkeeping for the per-lane recovery replan: a SANE
    straggler's counter climbs to S, the restart cycle resets it (fresh
    patience window), converged lanes stay at 0. The solver is canned so
    lane 0 fails sane forever (a genuinely-diverged lane resets through the
    divergence path every cycle and never exercises the stuck path)."""
    B = 3
    cfg = load_config(
        {**BASE, "solver": {**BASE["solver"], "stuck_restart_cycles": 2}}
    )
    ctrl = Controller(cfg, batch=B)
    scen = _scen(B)
    real = ctrl.step(scen)  # cold (real solve; establishes state shapes)
    base_result = real.solve

    def fake_solver_fn(warm):
        def run(scenario, init, duals):
            return dc.replace(
                base_result,
                converged=jnp.asarray([False, True, True]),
                eq_norm=jnp.full((B,), 1e-2),   # sane: above tol, below 0.5
                ineq_viol=jnp.zeros((B,)),
            )

        return run

    monkeypatch.setattr(ctrl, "_solver_fn", fake_solver_fn)
    seen = []
    for _k in range(5):
        ctrl.step(scen)
        seen.append(int(ctrl._stuck[0]))
        assert int(ctrl._stuck[1]) == 0  # converged lanes never accumulate
    # climbs 1, 2 → restart fires at >= 2 → reset → climbs again
    assert seen == [1, 2, 0, 1, 2], seen


# --------------------------------------------------------------------------- #
# polish_launches — post-solve accuracy pass
# --------------------------------------------------------------------------- #
def test_polish_fold_monotone_and_pass_through():
    """The polish keep-rule (`where_tree(r2.converged, r2, r)`) inside ONE
    compiled program: converged lanes can never be lost, and lanes whose
    re-solve did not converge pass the original result through bit for bit.
    (Cross-program conv-flag comparisons are not meaningful — two different
    XLA programs differ by fusion-level f32 noise on boundary lanes.)"""
    from mpc_local_planner_tpu.core.tree import where_tree
    from mpc_local_planner_tpu.ocp.grid import initial_primal
    from mpc_local_planner_tpu.solvers.al_sqp import (
        SolverSettings,
        init_duals,
        solve_single,
    )

    B = 6
    cfg = load_config(BASE)
    spec = cfg.to_ocp_spec()
    settings = SolverSettings.for_spec(spec, n_al=4, n_sqp=5,
                                       tol_eq=1e-3, tol_ineq=1e-3)
    scen = _scen(B)

    @jax.jit
    def run(scen, init, duals):
        solve = jax.vmap(lambda s, i, d: solve_single(spec, settings, s, i, d))
        r = solve(scen, init, duals)
        r2 = solve(scen, r.primal, r.duals)
        return r, r2, where_tree(r2.converged, r2, r)

    init = initial_primal(spec, scen)
    duals = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (B,) + a.shape),
        init_duals(spec, settings, dtype=jnp.float32),
    )
    r, r2, out = run(scen, init, duals)
    np.testing.assert_array_equal(
        np.asarray(out.converged),
        np.asarray(r.converged) | np.asarray(r2.converged),
    )
    keep = ~np.asarray(r2.converged)
    for b in np.nonzero(keep)[0]:
        np.testing.assert_array_equal(
            np.asarray(out.primal.us[b]), np.asarray(r.primal.us[b])
        )


def test_polish_improves_min_time_switch_stage_controls():
    """The measured r4 mitigation: extra warm launches sharpen the bang-bang
    switch stages of a warm-budget min-time solve (du floor 0.16 → 0.06 on
    the N=8 fixture, BENCH_NOTES r4). Protocol: identical cold solves, then
    one warm cycle with/without polish, compared against a deep-budget warm
    reference from the same post-cold state."""
    B = 4
    shallow = {**BASE["solver"], "warm_iterations": 3,
               "warm_inner_iterations": 4}
    cfg0 = load_config({**BASE, "solver": shallow})
    cfg4 = load_config({**BASE, "solver": {**shallow, "polish_launches": 4}})
    deep = load_config(
        {**BASE, "solver": {**BASE["solver"], "warm_iterations": 16,
                            "warm_inner_iterations": 15}}
    )
    scen = _scen(B, key=11)
    c0, c4, cd = (
        Controller(cfg0, batch=B),
        Controller(cfg4, batch=B),
        Controller(deep, batch=B),
    )
    for c in (c0, c4, cd):
        c.step(scen)  # identical cold solves (same settings, same program)
    r0 = c0.step(scen)
    r4 = c4.step(scen)
    rd = cd.step(scen)
    both = (
        np.asarray(r0.solve.converged)
        & np.asarray(r4.solve.converged)
        & np.asarray(rd.solve.converged)
    )
    assert both.any(), "fixture must have converged lanes on all three paths"
    du0 = np.max(
        np.abs(np.asarray(r0.solve.primal.us - rd.solve.primal.us)), axis=(1, 2)
    )
    du4 = np.max(
        np.abs(np.asarray(r4.solve.primal.us - rd.solve.primal.us)), axis=(1, 2)
    )
    # tolerance: polished may tie (lane already at the deep solution's
    # accuracy) but must not regress beyond f32 noise
    assert (du4[both] <= du0[both] + 5e-3).all(), (du0[both], du4[both])
    assert (du4[both] < du0[both] - 1e-3).any() or (du0[both] < 2e-2).all(), (
        du0[both], du4[both],
    )
