"""Double-precision host fallback (solvers/f64_fallback.py).

Parity: IPOPT certifies essentially every feasible instance because it
solves in f64 on the host CPU (cbr:optimization/solver/nlp_solver_ipopt.h
:: SolverIpopt::solve); the TPU pipeline is f32, and the f64 fallback is
the escalation tier that restores that property for persistent stragglers.
"""

import dataclasses as dc

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_local_planner_tpu.benchmarks import config3_carlike_min_time, random_ensemble
from mpc_local_planner_tpu.ocp.grid import initial_primal
from mpc_local_planner_tpu.solvers.al_sqp import (
    SolverSettings,
    init_duals,
    solve_single,
)
from mpc_local_planner_tpu.solvers.f64_fallback import make_f64_fallback


def _mixed_result(B=12, seed=2, n_al=6, n_sqp=8):
    """f32 mid-budget cold solve leaving a mix of converged/unconverged
    lanes (same fixture family as tests/test_rescue.py)."""
    spec = config3_carlike_min_time(N=8, obstacle_cap=0)
    tiny = SolverSettings.for_spec(spec, n_al=n_al, n_sqp=n_sqp)
    scen = random_ensemble(spec, B, jax.random.PRNGKey(seed))
    scen = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32) if a.dtype == jnp.float64 else a, scen
    )
    scen = dc.replace(scen, xf=scen.x0 + 0.4 * (scen.xf - scen.x0))
    init = initial_primal(spec, scen)
    duals = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (B,) + a.shape),
        init_duals(spec, tiny, dtype=jnp.float32),
    )
    r = jax.jit(jax.vmap(lambda s, i, d: solve_single(spec, tiny, s, i, d)))(
        scen, init, duals
    )
    return spec, tiny, scen, r


def _deep64(spec):
    """Converge-or-exhausted f64 budget at the shipping tolerance — the
    settings shape the Controller builds for solver.f64_fallback_slots."""
    return SolverSettings.for_spec(
        spec, tol_eq=1e-3, tol_ineq=1e-3, early_exit=True
    )


def test_f64_fallback_improves_stragglers_and_preserves_converged():
    spec, tiny, scen, r = _mixed_result()
    conv0 = np.asarray(r.converged)
    assert 0 < conv0.sum() < conv0.size, conv0  # fixture needs a real mix

    fb = make_f64_fallback(spec, _deep64(spec), slots=8)
    out = fb(scen, r)
    conv1 = np.asarray(out.converged)

    # converged lanes are untouched — bit-identical through the merge
    for b in np.nonzero(conv0)[0]:
        np.testing.assert_array_equal(
            np.asarray(out.primal.xs[b]), np.asarray(r.primal.xs[b])
        )
        assert conv1[b]
    # the fallback never loses a lane, stays f32 on the outside, and the
    # cold f64 budget converges every straggler of this obstacle-free
    # shortened-goal fixture (that totality IS the IPOPT-parity claim)
    assert out.primal.xs.dtype == r.primal.xs.dtype == jnp.float32
    assert conv1.all(), (conv0, conv1)


def test_f64_fallback_all_converged_is_identity():
    spec, tiny, scen, r = _mixed_result()
    forced = dc.replace(r, converged=jnp.ones_like(r.converged))
    fb = make_f64_fallback(spec, _deep64(spec), slots=8)
    assert fb(scen, forced) is forced  # no straggler -> no work, same object


def test_f64_fallback_chunks_cover_all_stragglers():
    spec, tiny, scen, r = _mixed_result()
    conv0 = np.asarray(r.converged)
    assert (~conv0).sum() >= 3  # need several chunks at slots=2
    fb = make_f64_fallback(spec, _deep64(spec), slots=2)
    out = fb(scen, r)
    # every straggler was visited (chunked loop, no truncation): the deep
    # f64 budget converges them all, including those beyond the first chunk
    assert np.asarray(out.converged).all()


def test_f64_fallback_restarts_nonfinite_lanes_fresh():
    spec, tiny, scen, r = _mixed_result()
    conv0 = np.asarray(r.converged)
    bad = int(np.nonzero(~conv0)[0][0])
    r = dc.replace(
        r,
        primal=dc.replace(r.primal, xs=r.primal.xs.at[bad].set(jnp.nan)),
        eq_norm=r.eq_norm.at[bad].set(jnp.nan),
    )
    fb = make_f64_fallback(spec, _deep64(spec), slots=8)
    out = fb(scen, r)
    # continuing from the NaN iterate would have stayed NaN — the fresh
    # restart recovers the lane
    assert bool(jnp.all(jnp.isfinite(out.primal.xs[bad])))
    assert bool(out.converged[bad])


def test_f64_fallback_fresh_primal_seeds_diverged_restart():
    """The optional full-batch fresh_primal (the Controller's plan-seeded
    init — the rescue's A*-reseed analog) is what diverged lanes restart
    from. Differential probe: a NaN'd straggler given a 1-iteration f64
    budget converges iff seeded with the known solution (from the straight
    line, 1 iteration provably cannot — the lane was a 48-iteration f32
    straggler)."""
    spec, tiny, scen, r = _mixed_result()
    conv0 = np.asarray(r.converged)
    bad = int(np.nonzero(~conv0)[0][0])
    deep = SolverSettings.for_spec(spec, tol_eq=1e-3, tol_ineq=1e-3)
    init = initial_primal(spec, scen)
    duals = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (conv0.size,) + a.shape),
        init_duals(spec, deep, dtype=jnp.float32),
    )
    r_deep = jax.jit(
        jax.vmap(lambda s, i, d: solve_single(spec, deep, s, i, d))
    )(scen, init, duals)
    assert bool(r_deep.converged[bad])  # the fixture lane is feasible

    r_nan = dc.replace(
        r,
        primal=dc.replace(r.primal, xs=r.primal.xs.at[bad].set(jnp.nan)),
        eq_norm=r.eq_norm.at[bad].set(jnp.nan),
    )
    one_iter = SolverSettings.for_spec(
        spec, n_al=1, n_sqp=1, tol_eq=1e-3, tol_ineq=1e-3
    )
    fb = make_f64_fallback(spec, one_iter, slots=8)
    seeded = fb(scen, r_nan, fresh_primal=r_deep.primal)
    unseeded = fb(scen, r_nan)
    assert bool(seeded.converged[bad])
    assert not bool(unseeded.converged[bad])


def test_f64_fallback_second_attempt_restarts_trapped_sane_lanes():
    """A sane-but-trapped straggler (finite iterate, small norms —
    continuation eligible) whose continuation fails must be re-solved from
    the fresh seed (attempt 2). Probe: zero out a straggler's iterate but
    FORGE sane norms; under a 1-iteration budget continuation from zeros
    cannot converge, so only the fresh-seed second attempt (seeded here
    with the known solution) can — and must."""
    spec, tiny, scen, r = _mixed_result()
    conv0 = np.asarray(r.converged)
    bad = int(np.nonzero(~conv0)[0][0])
    deep = SolverSettings.for_spec(spec, tol_eq=1e-3, tol_ineq=1e-3)
    init = initial_primal(spec, scen)
    duals = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (conv0.size,) + a.shape),
        init_duals(spec, deep, dtype=jnp.float32),
    )
    r_deep = jax.jit(
        jax.vmap(lambda s, i, d: solve_single(spec, deep, s, i, d))
    )(scen, init, duals)
    assert bool(r_deep.converged[bad])

    r_trap = dc.replace(
        r,
        primal=dc.replace(
            r.primal, xs=r.primal.xs.at[bad].set(0.0),
            us=r.primal.us.at[bad].set(0.0),
        ),
        eq_norm=r.eq_norm.at[bad].set(0.4),   # forged: sane on paper,
        ineq_viol=r.ineq_viol.at[bad].set(0.0),  # trapped in practice
    )
    one_iter = SolverSettings.for_spec(
        spec, n_al=1, n_sqp=1, tol_eq=1e-3, tol_ineq=1e-3
    )
    fb = make_f64_fallback(spec, one_iter, slots=8)
    out = fb(scen, r_trap, fresh_primal=r_deep.primal)
    assert bool(out.converged[bad])


def test_f64_fallback_rejects_nonpositive_slots():
    spec = config3_carlike_min_time(N=8, obstacle_cap=0)
    with pytest.raises(ValueError, match="slots"):
        make_f64_fallback(spec, _deep64(spec), slots=0)


# --------------------------------------------------------------------------- #
# Controller config surface (solver.f64_fallback_slots)
# --------------------------------------------------------------------------- #

from mpc_local_planner_tpu.geometry.obstacles import ObstacleSet  # noqa: E402
from mpc_local_planner_tpu.ocp.spec import Scenario  # noqa: E402
from mpc_local_planner_tpu.planner.config import load_config  # noqa: E402
from mpc_local_planner_tpu.planner.controller import Controller  # noqa: E402

BASE = {
    "grid": {
        "grid_size_ref": 10,
        "dt_ref": 0.3,
        "xf_fixed": [True, True, True],
        "variable_grid": {"enable": True, "min_dt": 0.001, "max_dt": 0.5},
    },
    "planning": {"objective": {"type": "minimum_time"}},
    "collision": {"obstacle_capacity": 0},
    # shallow budgets so cold AND warm cycles leave stragglers for the
    # fallback to pick up
    "solver": {
        "tol_eq": 0.001,
        "tol_ineq": 0.001,
        "iterations": 3,
        "inner_iterations": 4,
        "warm_iterations": 1,
        "warm_inner_iterations": 2,
    },
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


def test_controller_f64_fallback_batched_converges_what_f32_left():
    B = 6
    cfg_plain = load_config(BASE)
    cfg_fb = load_config(
        {**BASE, "solver": {**BASE["solver"], "f64_fallback_slots": 4}}
    )
    scen = _scen(B)
    ctrl_plain, ctrl_fb = Controller(cfg_plain, batch=B), Controller(cfg_fb, batch=B)
    c_plain = np.asarray(ctrl_plain.step(scen).solve.converged)
    r_fb = ctrl_fb.step(scen)
    c_fb = np.asarray(r_fb.solve.converged)
    assert not c_plain.all()  # the shallow cold budget must leave stragglers
    # the escalation tier converges every lane of this feasible fixture and
    # never loses one the f32 path had
    assert c_fb.all(), (c_plain, c_fb)
    assert r_fb.solve.primal.xs.dtype == jnp.float32
    # and the next (warm) cycle seeds from the rescued iterates
    c_fb2 = np.asarray(ctrl_fb.step(scen).solve.converged)
    assert c_fb2.all()


def test_controller_f64_fallback_unbatched_singleton_path():
    cfg = load_config(
        {**BASE, "solver": {**BASE["solver"], "f64_fallback_slots": 2}}
    )
    ctrl = Controller(cfg)
    scen = jax.tree_util.tree_map(lambda a: a[0], _scen(1))
    r = ctrl.step(scen)
    assert r.u0.shape == (2,)
    assert bool(r.solve.converged)


def test_controller_f64_fallback_requires_al_sqp():
    cfg = load_config(
        {
            **BASE,
            "solver": {
                **BASE["solver"],
                "type": "lsq_lm",
                "f64_fallback_slots": 2,
            },
        }
    )
    with pytest.raises(ValueError, match="al_sqp"):
        Controller(cfg)
