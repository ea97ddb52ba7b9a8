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


def test_classify_feasibility_oracle():
    """The float64 golden feasibility oracle labels a solvable ensemble
    feasible and a goal-buried-in-obstacle instance unknown (VERDICT r2 #3:
    separates 'solver failed' from 'instance infeasible' in converged_frac)."""
    import dataclasses as dc

    import jax
    import jax.numpy as jnp

    from mpc_local_planner_tpu.benchmarks import (
        classify_feasibility,
        config3_carlike_min_time,
        random_ensemble,
    )

    # goal_radius must respect reachability: N*dt_max*v_max = 1.6 m at N=8
    # (the default 3 m ensemble is provably infeasible at this horizon — the
    # oracle itself flagged that when this test was first written)
    spec = config3_carlike_min_time(N=8, obstacle_cap=2)
    scen = random_ensemble(spec, 4, jax.random.PRNGKey(3), goal_radius=1.1)
    labels, info = classify_feasibility(spec, scen, max_instances=4, maxiter=300)
    assert len(labels) == 4 and info["n"] == 4
    assert labels.count("feasible") >= 3  # the generator keeps goals clear
    assert info["max_viol_on_feasible"] <= 1e-5

    # bury the (fixed) goal inside an obstacle: no feasible point exists
    obs = scen.obstacles
    bad = dc.replace(
        scen,
        obstacles=dc.replace(
            obs,
            circles=jnp.broadcast_to(scen.xf[:, None, :2], obs.circles.shape),
            circle_radii=jnp.full_like(obs.circle_radii, 0.6),
            circle_mask=jnp.ones_like(obs.circle_mask),
        ),
    )
    labels_bad, _ = classify_feasibility(spec, bad, max_instances=2, maxiter=300)
    assert labels_bad.count("unknown") >= 1


def test_lines_astar_plans_route_around_walls():
    """Per-lane A* global-plan builder for the wall family (r4): plans are
    returned for (almost) every lane, start/end anchor correctly, and
    planned paths clear the active walls by the planning radius."""
    import jax
    import numpy as np

    from mpc_local_planner_tpu.benchmarks import (
        family_ensemble,
        family_spec,
        lines_astar_plans,
    )

    spec = family_spec("converter_lines", N=12)
    B = 12
    scen = family_ensemble("converter_lines", spec, B, jax.random.PRNGKey(5))
    plans, ok = lines_astar_plans(scen)
    assert plans.shape == (B, 16, 3)
    assert ok.sum() >= B - 2  # nearly all lanes plannable
    x0 = np.asarray(scen.x0[:, :2])
    xf = np.asarray(scen.xf[:, :2])
    p = np.asarray(plans)
    np.testing.assert_allclose(p[:, 0, :2], x0, atol=1e-5)
    np.testing.assert_allclose(p[:, -1, :2], xf, atol=1e-5)
    # planned waypoints keep clearance from active wall segments
    lines = np.asarray(scen.obstacles.lines)
    mask = np.asarray(scen.obstacles.line_mask)

    def seg_dist(q, a, b):
        ab = b - a
        t = np.clip(np.dot(q - a, ab) / max(np.dot(ab, ab), 1e-12), 0, 1)
        return np.linalg.norm(q - (a + t * ab))

    for b in range(B):
        if not ok[b]:
            continue
        for k in range(1, 15):  # interior waypoints
            for j in range(lines.shape[1]):
                if mask[b, j]:
                    d = seg_dist(p[b, k, :2], lines[b, j, 0], lines[b, j, 1])
                    assert d > 0.12, (b, k, j, d)
