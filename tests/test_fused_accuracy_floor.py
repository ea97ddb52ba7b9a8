"""Fused-path accuracy floor vs the float64 golden (VERDICT r3 missing #4).

What binds where (measured r4, see BENCH_NOTES):
- fused vs XLA at the shipping warm budget: <= ~2e-3 on converged lanes —
  the kernel adds (f32-noise) nothing on top of the XLA path.
- warm iterate vs the f64 golden OPTIMUM at 1e-3 feasibility tolerance:
  quadratic-form problems land within ~1e-2 sup-norm on controls
  (median ~1e-3); min-time problems show O(0.1) sup-norm at bang-bang
  SWITCH stages while the objective T* and dt* match to <= 2e-3 / 2e-4 —
  a solver-agnostic near-degeneracy of switch timing at that tolerance
  (the reference's IPOPT at `tol 1e-3` has the same property).
- the BASELINE.md 1e-3 control-sequence target binds on the FULL-budget
  f64 XLA path (tests/test_baseline_configs.py); the warm budget trades
  final polish for cycle rate exactly like `solver.ipopt.max_iter`.

Parity: SURVEY.md §5 (golden fixtures as the substitute reference binary).
"""

import dataclasses as dc

import jax
import jax.numpy as jnp
import numpy as np

from mpc_local_planner_tpu.benchmarks import config3_carlike_min_time, random_ensemble
from mpc_local_planner_tpu.ocp.grid import (
    initial_primal,
    warm_start_resample,
    warm_start_shift,
)
from mpc_local_planner_tpu.ops.fused_al_sqp_pallas import fused_solve
from mpc_local_planner_tpu.solvers.al_sqp import (
    SolverSettings,
    init_duals,
    shift_duals,
    solve_single,
)
from mpc_local_planner_tpu.solvers.golden import solve_golden

WARM = SolverSettings(
    n_al=3, n_sqp=4, rho0=120.0, reg0=1.0, tol_eq=1e-3, tol_ineq=1e-3,
    alphas=(1.0, 0.7, 0.5, 0.22, 0.08, 0.03),
)


def _warm_state(spec, B=10, key=9, min_time=True):
    scen = random_ensemble(spec, B, jax.random.PRNGKey(key))
    scen = dc.replace(scen, xf=scen.x0 + 0.45 * (scen.xf - scen.x0))
    scen32 = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32) if a.dtype == jnp.float64 else a, scen
    )
    cold = SolverSettings.for_spec(spec)
    init = initial_primal(spec, scen32)
    duals0 = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (B,) + a.shape),
        init_duals(spec, cold, dtype=jnp.float32),
    )
    r0 = jax.jit(jax.vmap(lambda s, i, d: solve_single(spec, cold, s, i, d)))(
        scen32, init, duals0
    )
    ok = r0.converged
    x0n = jnp.where(ok[:, None], r0.primal.xs[:, 1, :], scen32.x0)
    scen_w = dc.replace(scen32, x0=x0n)
    ws = warm_start_resample if min_time else warm_start_shift
    initw = ws(r0.primal, x0n, steps=1, spec=spec)
    dw = shift_duals(r0.duals, WARM, steps=1)
    return scen_w, initw, dw


def _polish(spec, scen_w, primal, b):
    scen64 = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float64) if a.dtype == jnp.float32 else a, scen_w
    )
    lane = jax.tree_util.tree_map(lambda a: a[b], scen64)
    pf = jax.tree_util.tree_map(lambda a: jnp.asarray(a[b], jnp.float64), primal)
    sol, res = solve_golden(spec, lane, init=pf)
    return pf, sol, res


def test_min_time_floor_objective_binds_not_switch_stages():
    spec = config3_carlike_min_time(N=8, obstacle_cap=4)
    scen_w, initw, dw = _warm_state(spec, min_time=True)
    out_f = fused_solve(spec, WARM, scen_w, initw, dw, interpret=True)
    out_x = jax.jit(
        jax.vmap(lambda s, i, d: solve_single(spec, WARM, s, i, d))
    )(scen_w, initw, dw)
    n_checked = 0
    for b in range(scen_w.x0.shape[0]):
        if not bool(out_f.converged[b]):
            continue
        pf, sol, res = _polish(spec, scen_w, out_f.primal, b)
        if not res.success:
            continue
        # (1) fused adds nothing beyond the XLA path
        px = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a[b], jnp.float64), out_x.primal
        )
        du_f = float(jnp.max(jnp.abs(pf.us - sol.us)))
        du_x = float(jnp.max(jnp.abs(px.us - sol.us)))
        assert abs(du_f - du_x) < 5e-3, (b, du_f, du_x)
        # (2) the OBJECTIVE (total time) and dt* match the golden tightly
        #     even where switch-stage controls are degenerate
        ddt = float(jnp.max(jnp.abs(jnp.asarray(pf.dt) - sol.dt)))
        T_f = float(jnp.mean(jnp.asarray(pf.dt))) * spec.N
        T_g = float(jnp.mean(jnp.asarray(sol.dt))) * spec.N
        assert ddt < 1e-3, (b, ddt)
        assert abs(T_f - T_g) / T_g < 2e-3, (b, T_f, T_g)
        n_checked += 1
    assert n_checked >= 3, n_checked


def test_polish_launches_shrink_min_time_switch_floor():
    """`solver.polish_launches`' measured mechanism (BENCH_NOTES r4 accuracy
    floor): chaining extra warm launches from the converged iterate shrinks
    the bang-bang switch-stage control error vs the f64 golden (lane-0
    probe measured du 0.16 → 0.06 at 4 launches; across this 6-lane
    fixture the medians measure 0.165 → 0.047). Pin: per-lane the polished
    error never regresses beyond f32 noise, and the MEDIAN floor shrinks
    by at least ~2x. The worst lane may barely move (measured 0.263 →
    0.243 on one lane — its switch ambiguity is not launch-limited), so no
    absolute max is asserted."""
    from mpc_local_planner_tpu.core.tree import where_tree

    spec = config3_carlike_min_time(N=8, obstacle_cap=4)
    scen_w, initw, dw = _warm_state(spec, min_time=True)
    out0 = fused_solve(spec, WARM, scen_w, initw, dw, interpret=True)
    out = out0
    for _k in range(4):
        nxt = fused_solve(
            spec, WARM, scen_w, out.primal, out.duals, interpret=True
        )
        # the controller's polish keep-rule: take a re-solve only where it
        # converged
        out = where_tree(nxt.converged, nxt, out)
    du0s, dups = [], []
    for b in range(scen_w.x0.shape[0]):
        if not (bool(out0.converged[b]) and bool(out.converged[b])):
            continue
        pf0, sol, res = _polish(spec, scen_w, out0.primal, b)
        if not res.success:
            continue
        pfp = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a[b], jnp.float64), out.primal
        )
        du0s.append(float(jnp.max(jnp.abs(pf0.us - sol.us))))
        dups.append(float(jnp.max(jnp.abs(pfp.us - sol.us))))
    assert len(dups) >= 3, dups
    for d0, dp in zip(du0s, dups):
        assert dp <= d0 + 5e-3, (d0, dp)
    m0, mp = float(np.median(du0s)), float(np.median(dups))
    assert mp <= 0.6 * m0 + 1e-3, (du0s, dups)


def test_quadratic_warm_floor_within_1e2():
    spec = dc.replace(
        config3_carlike_min_time(N=8, obstacle_cap=4),
        objective="quadratic_form", variable_dt=False,
        xf_fixed=(False, False, False),
        q_diag=(2.0, 2.0, 2.0), r_diag=(1.0, 1.0), qf_diag=(10.0, 10.0, 10.0),
    )
    scen_w, initw, dw = _warm_state(spec, min_time=False)
    out_f = fused_solve(spec, WARM, scen_w, initw, dw, interpret=True)
    dus = []
    for b in range(scen_w.x0.shape[0]):
        if not bool(out_f.converged[b]):
            continue
        pf, sol, res = _polish(spec, scen_w, out_f.primal, b)
        if not res.success:
            continue
        dus.append(float(jnp.max(jnp.abs(pf.us - sol.us))))
    assert len(dus) >= 4, dus
    # measured max 8.8e-3 (r4 probe); 2.5x margin
    assert max(dus) < 2.2e-2, dus
    assert float(np.median(dus)) < 8e-3, dus
