"""JourneyStream (planner/serving.py) invariants — VERDICT r4 missing #2.

The rolling-journey serving loop was bench-only code through round 4; these
tests pin its semantics as a package API: retirement/redraw, bit-identical
pass-through of non-retired lanes on redraw cycles, chained rescue touching
only unconverged lanes, and the stuck counter's reset/abandon behavior.
"""

import dataclasses as dc

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_local_planner_tpu.benchmarks import config1_unicycle_quadratic, random_ensemble
from mpc_local_planner_tpu.planner.serving import (
    JourneyStream,
    StreamSettings,
    StreamState,
)
from mpc_local_planner_tpu.solvers.al_sqp import SolverSettings

E = 4


@pytest.fixture(scope="module")
def stream_bits():
    """A small quadratic-form stream (fast to solve; converges reliably).

    xf_fixed position: without a terminal equality, ANY goal is trivially
    feasible (convergence = feasibility) and the stuck/abandon machinery
    could never fire.
    """
    spec = dc.replace(
        config1_unicycle_quadratic(N=8), dt_ref=0.4,
        xf_fixed=(True, True, False),
    )
    warm = SolverSettings(
        n_al=2, n_sqp=4, rho0=120.0, reg0=1.0, tol_eq=1e-3, tol_ineq=1e-3,
        alphas=(1.0, 0.5, 0.22),
    )

    def redraw(key, n):
        return random_ensemble(spec, n, key, goal_radius=1.0)

    stream = JourneyStream(spec, warm, redraw_fn=redraw)
    state = stream.init(E, jax.random.PRNGKey(0))
    return spec, warm, redraw, stream, state


def _near_goal(state):
    """Move lane 0 onto its goal so the next cycle retires it.

    Also marks the lane unconverged: the warm-start policy advances a
    CONVERGED lane's x0 along its previous solution, which would overwrite
    the teleport (the continue branch keeps the measured x0).
    """
    scen = state.scen
    x0 = scen.x0.at[0].set(scen.xf[0])
    return dc.replace(
        state,
        scen=dc.replace(scen, x0=x0),
        result=dc.replace(
            state.result, converged=state.result.converged.at[0].set(False)
        ),
    )


def test_retired_lane_redraws_others_keep_journey(stream_bits):
    _, _, _, stream, state = stream_bits
    st = _near_goal(state)
    xf_before = np.asarray(st.scen.xf)
    new_state, stats = jax.jit(stream.cycle)(st)
    reached = np.asarray(stats.reached)
    assert reached[0], "lane 0 sits on its goal — must retire as reached"
    xf_after = np.asarray(new_state.scen.xf)
    # retired lane drew a fresh journey (a fresh goal), live lanes kept theirs
    assert not np.allclose(xf_after[0], xf_before[0])
    for b in range(1, E):
        if not reached[b] and not np.asarray(stats.abandoned)[b]:
            np.testing.assert_array_equal(xf_after[b], xf_before[b])
    # retired lanes' stuck counters are reset
    assert int(new_state.stuck[0]) == 0


def test_nonretired_results_survive_redraw_bit_identically(stream_bits):
    """Same compiled cycle, two states: one where lane 0 retires (the cold
    replant branch runs) and one where nothing retires (it is skipped).
    Live lanes' inputs are identical in both, and the per-lane vmapped solve
    is lane-independent — so their results must be bit-identical: the
    replant's select must return live lanes' pre-replant results exactly."""
    _, _, _, stream, state = stream_bits
    cyc = jax.jit(stream.cycle)
    st_retire = _near_goal(state)
    # control state: identical except lane 0 is NOT on its goal (and has the
    # same unconverged flag so the policy branch matches)
    st_plain = dc.replace(
        st_retire,
        scen=dc.replace(
            st_retire.scen, x0=st_retire.scen.x0.at[0].set(state.scen.x0[0])
        ),
    )
    s_a, stats_a = cyc(st_retire)
    s_b, stats_b = cyc(st_plain)
    retire_a = np.asarray(stats_a.reached) | np.asarray(stats_a.abandoned)
    retire_b = np.asarray(stats_b.reached) | np.asarray(stats_b.abandoned)
    assert retire_a[0], "lane 0 must retire in the first state"
    live = ~retire_a & ~retire_b
    live[0] = False
    assert live.any()
    for b in np.nonzero(live)[0]:
        np.testing.assert_array_equal(
            np.asarray(s_a.result.primal.xs[b]),
            np.asarray(s_b.result.primal.xs[b]),
        )
        np.testing.assert_array_equal(
            np.asarray(s_a.result.converged[b]),
            np.asarray(s_b.result.converged[b]),
        )
        np.testing.assert_array_equal(
            np.asarray(s_a.scen.xf[b]), np.asarray(s_b.scen.xf[b])
        )


def test_chained_rescue_only_touches_unconverged(stream_bits):
    spec, warm, redraw, _, state = stream_bits
    on = JourneyStream(
        spec, warm, redraw_fn=redraw,
        settings=StreamSettings(chained_rescue=True, cold_replant=False),
    )
    off = JourneyStream(
        spec, warm, redraw_fn=redraw,
        settings=StreamSettings(chained_rescue=False, cold_replant=False),
    )
    s_on, _ = jax.jit(on.cycle)(state)
    s_off, _ = jax.jit(off.cycle)(state)
    conv_first = np.asarray(s_off.result.converged)
    # lanes the first solve converged pass through the rescue untouched
    for b in np.nonzero(conv_first)[0]:
        np.testing.assert_array_equal(
            np.asarray(s_on.result.primal.xs[b]),
            np.asarray(s_off.result.primal.xs[b]),
        )


def test_stuck_counter_resets_and_abandons(stream_bits):
    spec, warm, redraw, stream, state = stream_bits
    # lane 1: teleport the goal far out of reach → never converges at the
    # warm budget (the 8-stage grid cannot span 50 m at these limits)
    scen = state.scen
    xf_bad = scen.xf.at[1, 0].set(50.0)
    st = dc.replace(
        state,
        scen=dc.replace(scen, xf=xf_bad),
        # the solver would otherwise CONTINUE from the old (now mismatched)
        # iterate; mark it unconverged so the policy treats it honestly
        result=dc.replace(
            state.result, converged=state.result.converged.at[1].set(False)
        ),
    )
    cyc = jax.jit(stream.cycle)
    st1, stats1 = cyc(st)
    assert not bool(stats1.converged[1])
    assert int(st1.stuck[1]) == 1
    st2, stats2 = cyc(st1)
    # stuck_limit=2 → retired as abandoned on the second unconverged cycle
    assert bool(stats2.abandoned[1])
    assert int(st2.stuck[1]) == 0  # reset after redraw
    # the audit record captures the journey at abandon time
    ab = np.asarray(stats2.abandoned_scen.xf)
    assert ab[1, 0] == pytest.approx(50.0)
    # non-abandoned lanes' audit rows are zeroed
    for b in np.nonzero(~np.asarray(stats2.abandoned))[0]:
        assert (np.asarray(stats2.abandoned_scen.xf[b]) == 0).all()
    # converged lanes keep stuck == 0 throughout
    for b in np.nonzero(np.asarray(stats1.converged))[0]:
        assert int(st1.stuck[b]) == 0


def test_block_fn_matches_iterated_cycles(stream_bits):
    _, _, _, stream, state = stream_bits
    run = stream.block_fn(3)
    s_block, stats = run(state)
    cyc = jax.jit(stream.cycle)
    s_iter = state
    for _ in range(3):
        s_iter, _ = cyc(s_iter)
    np.testing.assert_allclose(
        np.asarray(s_block.result.primal.xs),
        np.asarray(s_iter.result.primal.xs),
        rtol=0, atol=0,
    )
    assert stats.converged.shape == (3, E)
    assert isinstance(s_block, StreamState)
