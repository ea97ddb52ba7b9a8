"""via_points_ordered mode: monotone stage assignment vs default nearest.

Parity: optimal_control/min_time_via_points_cost.h :: MinTimeViaPointsCost,
`minimum_time_via_points.via_points_ordered` (SURVEY.md Appendix A).
"""

import dataclasses as dc

import jax
import jax.numpy as jnp
import numpy as np

from mpc_local_planner_tpu.geometry.footprints import PointFootprint
from mpc_local_planner_tpu.ocp.costs import via_stage_assignment
from mpc_local_planner_tpu.ocp.grid import initial_primal
from mpc_local_planner_tpu.ocp.spec import OcpSpec, Scenario
from mpc_local_planner_tpu.solvers.al_sqp import (
    SolverSettings,
    init_duals,
    solve_single,
)
from mpc_local_planner_tpu.systems.models import RobotLimits, UnicycleModel

LIMITS = RobotLimits(max_vel_x=0.5, max_vel_x_backwards=0.2, max_vel_theta=0.6)


def _spec(ordered: bool, via_cap: int = 2, N: int = 24) -> OcpSpec:
    return OcpSpec(
        model=UnicycleModel(), footprint=PointFootprint(), N=N,
        objective="minimum_time_via_points", variable_dt=True,
        dt_min=1e-3, dt_max=1.0, dt_ref=0.3, xf_fixed=(True, True, True),
        via_cap=via_cap, via_position_weight=120.0,
        via_points_ordered=ordered, limits=LIMITS,
    )


def test_assignment_monotone_on_crossing_sequence():
    """Via list (later-along-path point FIRST) forces the ordered cursor
    forward; unordered argmin assigns in geometric order instead."""
    # straight line x: 0 -> 3, 25 states
    xs = jnp.stack(
        [jnp.linspace(0.0, 3.0, 25), jnp.zeros(25), jnp.zeros(25)], axis=-1
    )
    vias = jnp.array([[2.0, 0.3, 0.0], [1.0, -0.3, 0.0]])  # crossing order
    mask = jnp.array([True, True])
    k_un = np.asarray(
        via_stage_assignment(_spec(False), xs, vias, mask)
    )
    k_or = np.asarray(
        via_stage_assignment(_spec(True), xs, vias, mask)
    )
    # unordered: via0 -> stage near x=2 (k=16), via1 -> near x=1 (k=8): DECREASING
    assert k_un[0] > k_un[1]
    # ordered: monotone nondecreasing, cursor starts at via0's stage
    assert k_or[1] >= k_or[0]
    assert k_or[0] == k_un[0]


def test_masked_slots_do_not_advance_cursor():
    xs = jnp.stack(
        [jnp.linspace(0.0, 3.0, 25), jnp.zeros(25), jnp.zeros(25)], axis=-1
    )
    # slot 0 active (late stage), slot 1 INACTIVE (would claim last stage),
    # slot 2 active before slot 1's position
    vias = jnp.array([[1.0, 0.0, 0.0], [3.0, 0.0, 0.0], [1.5, 0.0, 0.0]])
    mask = jnp.array([True, False, True])
    k = np.asarray(via_stage_assignment(_spec(True, via_cap=3), xs, vias, mask))
    # inactive slot 1 must not push slot 2's allowed range to the far end
    assert k[2] < 20
    assert k[2] >= k[0]


def _tour_plan():
    """Polyline 0 → via0 → via1 → goal, resampled to 40 poses (the shape a
    global plan takes when via points were extracted from it in order)."""
    way = np.array([[0, 0], [2.0, 0.45], [1.0, -0.45], [3.0, 0]])
    seg = np.diff(way, axis=0)
    L = np.linalg.norm(seg, axis=1)
    cum = np.concatenate([[0], np.cumsum(L)])
    s = np.linspace(0, cum[-1], 40)
    pts = np.stack(
        [np.interp(s, cum, way[:, 0]), np.interp(s, cum, way[:, 1])], axis=1
    )
    th = np.arctan2(np.gradient(pts[:, 1]), np.gradient(pts[:, 0]))
    return jnp.asarray(np.concatenate([pts, th[:, None]], axis=1))


def test_ordered_vs_unordered_solver_trajectories_differ():
    """Crossing via sequence (later-along-path point FIRST in the list).

    Ordered mode, seeded from the plan that traverses the vias in list order
    (the planner's real seeding path), converges to the ordered doubling-back
    tour. Unordered mode, seeded from the straight line, reassigns
    geometrically and produces the much faster S-curve. Measured on this
    fixture: T_ordered ≈ 13.7 s vs T_unordered ≈ 7.5 s, traversal stages
    (12, 18) vs (21, 9). Ref: min_time_via_points_cost.h ::
    MinTimeViaPointsCost (via_points_ordered).
    """
    from mpc_local_planner_tpu.ocp.grid import primal_from_plan

    scen = Scenario.goal_only(
        jnp.array([0.0, 0.0, 0.0]), jnp.array([3.0, 0.0, 0.0]),
        via_cap=2, dtype=jnp.float64,
    )
    scen = dc.replace(
        scen,
        via_points=jnp.array([[2.0, 0.45, 0.0], [1.0, -0.45, 0.0]]),
        via_mask=jnp.array([True, True]),
    )
    limits = RobotLimits(max_vel_x=0.5, max_vel_x_backwards=0.2, max_vel_theta=0.8)

    results = {}
    for ordered in (False, True):
        spec = dc.replace(_spec(ordered, N=30), limits=limits)
        settings = SolverSettings.for_spec(spec)
        init = (
            primal_from_plan(spec, _tour_plan(), scen.x0)
            if ordered
            else initial_primal(spec, scen)
        )
        duals = init_duals(spec, settings, dtype=jnp.float64)
        r = jax.jit(lambda s, i, d, spec=spec, settings=settings:
                    solve_single(spec, settings, s, i, d))(scen, init, duals)
        assert bool(r.converged), f"ordered={ordered} failed to converge"
        xs = np.asarray(r.primal.xs)
        for vp in np.asarray(scen.via_points):
            dmin = float(np.min(np.linalg.norm(xs[:, :2] - vp[:2], axis=1)))
            assert dmin < 0.1, (ordered, vp, dmin)
        # stage at which each via point is (locally) reached
        k_hit = [
            int(np.argmin(np.linalg.norm(xs[:, :2] - vp[:2], axis=1)))
            for vp in np.asarray(scen.via_points)
        ]
        results[ordered] = (k_hit, float(r.primal.dt) * spec.N)

    k_un, T_un = results[False]
    k_or, T_or = results[True]
    # unordered: via1 (x=1.0) reached before via0 (x=2.0) — geometric order
    assert k_un[1] < k_un[0], k_un
    # ordered: list order respected -> via0 reached strictly before via1
    assert k_or[0] < k_or[1], k_or
    # the doubling-back ordered tour is strictly slower (T* sanity)
    assert T_or > T_un + 1.0, (T_or, T_un)
