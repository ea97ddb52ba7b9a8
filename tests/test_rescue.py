"""Straggler-rescue pass (solvers/rescue.py): compaction semantics.

Parity: the batched analog of IPOPT running each problem to ITS OWN
iteration count (cbr:optimization/solver/nlp_solver_ipopt.h ::
SolverIpopt::solve) — unconverged lanes are compacted and re-solved with a
deeper continue budget; converged lanes must come through bit-identical.
"""

import dataclasses as dc

import jax
import jax.numpy as jnp
import numpy as np

from mpc_local_planner_tpu.benchmarks import config3_carlike_min_time, random_ensemble
from mpc_local_planner_tpu.ocp.grid import initial_primal
from mpc_local_planner_tpu.solvers.al_sqp import (
    SolverSettings,
    init_duals,
    solve_single,
)
from mpc_local_planner_tpu.solvers.rescue import make_rescue


def _mixed_result(B=12, seed=2):
    """A mid-budget cold solve on near goals: deliberately leaves a mix of
    converged and unconverged lanes (cold min-time needs ~16x15 to converge
    everything; 6x8 converges about half of this fixture)."""
    spec = config3_carlike_min_time(N=8, obstacle_cap=0)
    tiny = SolverSettings.for_spec(spec, n_al=6, n_sqp=8)
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


def test_rescue_improves_stragglers_and_preserves_converged():
    spec, tiny, scen, r = _mixed_result()
    conv0 = np.asarray(r.converged)
    assert 0 < conv0.sum() < conv0.size, conv0  # fixture needs a real mix

    deeper = dc.replace(tiny, n_al=10, n_sqp=10)
    rescue = make_rescue(spec, tiny, slots=8, rescue_settings=deeper)
    out = jax.jit(rescue)(scen, r)
    conv1 = np.asarray(out.converged)

    # converged lanes are untouched — bit-identical through the scatter
    for b in np.nonzero(conv0)[0]:
        np.testing.assert_array_equal(
            np.asarray(out.primal.xs[b]), np.asarray(r.primal.xs[b])
        )
        assert conv1[b]
    # rescue never un-converges anything, and (on this easy obstacle-free
    # fixture) the deeper continue budget converges at least one straggler
    assert conv1.sum() >= conv0.sum()
    assert conv1[~conv0].sum() >= 1, (conv0, conv1)


def test_rescue_slots_bound_limits_work():
    spec, tiny, scen, r = _mixed_result()
    conv0 = np.asarray(r.converged)
    n_unc = int((~conv0).sum())
    assert n_unc >= 2
    # only ONE slot: exactly the first straggler (lane order) may change
    deeper = dc.replace(tiny, n_al=10, n_sqp=10)
    rescue = make_rescue(spec, tiny, slots=1, rescue_settings=deeper)
    out = jax.jit(rescue)(scen, r)
    first = int(np.nonzero(~conv0)[0][0])
    for b in range(conv0.size):
        if b == first:
            continue
        np.testing.assert_array_equal(
            np.asarray(out.primal.xs[b]), np.asarray(r.primal.xs[b])
        )


def test_rescue_restarts_nonfinite_lanes_fresh():
    spec, tiny, scen, r = _mixed_result()
    conv0 = np.asarray(r.converged)
    bad = int(np.nonzero(~conv0)[0][0])
    # blow up one straggler's iterate the way a diverged solve does: NaN
    # trajectory AND NaN constraint norms (NaN > thresh is False — the
    # rescue must catch it via the isfinite guard, not the threshold)
    r = dc.replace(
        r,
        primal=dc.replace(
            r.primal, xs=r.primal.xs.at[bad].set(jnp.nan)
        ),
        eq_norm=r.eq_norm.at[bad].set(jnp.nan),
    )
    deeper = dc.replace(tiny, n_al=10, n_sqp=10)
    rescue = make_rescue(spec, tiny, slots=8, rescue_settings=deeper)
    out = jax.jit(rescue)(scen, r)
    # the lane restarted from a fresh init: finite again (continuing from
    # the NaN iterate would have stayed NaN), with an honest eq_norm
    assert bool(jnp.all(jnp.isfinite(out.primal.xs[bad])))
    assert bool(jnp.isfinite(out.eq_norm[bad]))


def test_rescue_fresh_init_hook_reseeds_diverged_slots(monkeypatch):
    """fresh_init(scen_k, idx) overrides the DIVERGED-slot restart seed
    (r5: the wall-family A*-plan reseed). Pin: the hook is called with the
    compaction gather index, its seed is used for the diverged lane (probe:
    a seed the solver provably keeps — here we check the hook was invoked
    and the lane recovered), and sane continue lanes never see it."""
    spec, tiny, scen, r = _mixed_result()
    conv0 = np.asarray(r.converged)
    bad = int(np.nonzero(~conv0)[0][0])
    r = dc.replace(
        r,
        primal=dc.replace(r.primal, xs=r.primal.xs.at[bad].set(jnp.nan)),
        eq_norm=r.eq_norm.at[bad].set(jnp.nan),
    )
    calls = {}

    def fresh(scen_k, idx):
        calls["idx_shape"] = idx.shape
        # recognizable but solvable seed: the plain straight-line init
        return initial_primal(spec, scen_k)

    deeper = dc.replace(tiny, n_al=10, n_sqp=10)
    rescue = make_rescue(
        spec, tiny, slots=8, rescue_settings=deeper, fresh_init=fresh
    )
    out = jax.jit(rescue)(scen, r)
    assert calls["idx_shape"] == (8,)  # gather index reached the hook
    assert bool(jnp.all(jnp.isfinite(out.primal.xs[bad])))
    # converged lanes still bit-identical through the scatter
    for b in np.nonzero(conv0)[0]:
        np.testing.assert_array_equal(
            np.asarray(out.primal.xs[b]), np.asarray(r.primal.xs[b])
        )


def test_compaction_permutation_properties():
    """The cumsum-based compaction used by the rescue is a stable
    permutation: stragglers first (in lane order), converged lanes after
    (in lane order), bijective — for every conv-mask shape (hand-rolled,
    so property-tested against numpy argsort)."""
    rng = np.random.default_rng(0)
    for trial in range(50):
        B = int(rng.integers(1, 40))
        conv = rng.random(B) < rng.random()
        unconv = ~conv
        ui = unconv.astype(np.int32)
        n_unc = ui.sum()
        pos = np.where(unconv, np.cumsum(ui) - 1, n_unc + np.cumsum(1 - ui) - 1)
        order = np.zeros(B, np.int32)
        order[pos] = np.arange(B, dtype=np.int32)
        # bijection
        assert sorted(order.tolist()) == list(range(B))
        # equals the stable argsort of the converged flag
        ref = np.argsort(conv, kind="stable")
        np.testing.assert_array_equal(order, ref)
        # jax version agrees elementwise
        unconv_j = jnp.asarray(unconv)
        ui_j = unconv_j.astype(jnp.int32)
        pos_j = jnp.where(
            unconv_j,
            jnp.cumsum(ui_j) - 1,
            jnp.sum(ui_j) + jnp.cumsum(1 - ui_j) - 1,
        )
        order_j = jnp.zeros((B,), jnp.int32).at[pos_j].set(
            jnp.arange(B, dtype=jnp.int32)
        )
        np.testing.assert_array_equal(np.asarray(order_j), ref)
