"""Canonical benchmark problem definitions (BASELINE.json configs #1–#5).

Parity: the role of `mpc_local_planner_examples/cfg/**` — the de-facto
reference configurations (SURVEY.md §3.1) — plus scenario-ensemble
generators for the batched TPU workload that BASELINE.json defines.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from mpc_local_planner_tpu.geometry.footprints import CircularFootprint, PointFootprint
from mpc_local_planner_tpu.geometry.obstacles import ObstacleSet
from mpc_local_planner_tpu.ocp.spec import OcpSpec, Scenario
from mpc_local_planner_tpu.systems.models import (
    RobotLimits,
    SimpleCarModel,
    UnicycleModel,
)

DIFF_DRIVE_LIMITS = RobotLimits(
    max_vel_x=0.4, max_vel_x_backwards=0.2, max_vel_theta=0.3,
    acc_lim_x=0.5, acc_lim_theta=0.5,
)
CARLIKE_LIMITS = RobotLimits(
    max_vel_x=0.4, max_vel_x_backwards=0.2, max_steering_angle=1.0,
    acc_lim_x=0.5,
)


def config1_unicycle_quadratic(N: int = 20) -> OcpSpec:
    """BASELINE config #1: unicycle, quadratic form, no obstacles."""
    return OcpSpec(
        model=UnicycleModel(), footprint=PointFootprint(), N=N,
        objective="quadratic_form", q_diag=(2.0, 2.0, 2.0), r_diag=(1.0, 1.0),
        qf_diag=(10.0, 10.0, 10.0), dt_ref=0.3, limits=DIFF_DRIVE_LIMITS,
    )


def config2_diffdrive_obstacles(N: int = 30, obstacle_cap: int = 10) -> OcpSpec:
    """BASELINE config #2: diff-drive, 10 circular obstacles, terminal ball."""
    return OcpSpec(
        model=UnicycleModel(), footprint=CircularFootprint(radius=0.2), N=N,
        objective="quadratic_form", q_diag=(2.0, 2.0, 2.0), r_diag=(1.0, 1.0),
        qf_diag=(20.0, 20.0, 20.0), ball_weights=(1.0, 1.0, 0.0),
        ball_radius=0.2, dt_ref=0.3, min_obstacle_dist=0.1,
        obstacle_cap=obstacle_cap, limits=DIFF_DRIVE_LIMITS,
    )


def config3_carlike_min_time(N: int = 50, obstacle_cap: int = 10) -> OcpSpec:
    """BASELINE config #3: car-like (Ackermann) time-optimal with obstacles."""
    return OcpSpec(
        model=SimpleCarModel(wheelbase=0.5), footprint=CircularFootprint(radius=0.2),
        N=N, objective="minimum_time", variable_dt=True, dt_min=1e-3, dt_max=0.5,
        dt_ref=0.3, xf_fixed=(True, True, True), min_obstacle_dist=0.1,
        obstacle_cap=obstacle_cap, limits=CARLIKE_LIMITS,
    )


def random_ensemble(
    spec: OcpSpec,
    batch: int,
    key: jax.Array,
    dtype=jnp.float32,
    goal_radius: float = 3.0,
    n_obstacles: Optional[int] = None,
) -> Scenario:
    """Random (start pose × goal × obstacle field) scenario ensemble.

    Obstacles are circles sampled between start and goal, kept clear of both
    endpoints so every instance is feasible.
    """
    kg, ko, kr, kh = jax.random.split(key, 4)
    x0 = jnp.zeros((batch, 3), dtype=dtype)
    ang = jax.random.uniform(kg, (batch,), minval=-0.8, maxval=0.8)
    dist = jax.random.uniform(kh, (batch,), minval=0.6 * goal_radius, maxval=goal_radius)
    xf = jnp.stack(
        [dist * jnp.cos(ang), dist * jnp.sin(ang), ang], axis=-1
    ).astype(dtype)

    M = spec.obstacle_cap
    if M == 0:
        return Scenario.goal_only(x0, xf, nu=spec.nu, dtype=dtype)

    n_act = M if n_obstacles is None else min(n_obstacles, M)
    frac = jax.random.uniform(ko, (batch, M), minval=0.25, maxval=0.75)
    lateral = jax.random.uniform(kr, (batch, M), minval=-1.0, maxval=1.0)
    heading = jnp.stack([jnp.cos(ang), jnp.sin(ang)], axis=-1)
    normal = jnp.stack([-jnp.sin(ang), jnp.cos(ang)], axis=-1)
    centers = (
        frac[..., None] * dist[:, None, None] * heading[:, None, :]
        + lateral[..., None] * normal[:, None, :]
    ).astype(dtype)
    radii = jnp.full((batch, M), 0.25, dtype=dtype)
    mask = (jnp.arange(M) < n_act)[None, :] & (jnp.abs(lateral) > 0.45)

    obstacles = ObstacleSet(
        points=jnp.zeros((batch, 0, 2), dtype), point_vels=jnp.zeros((batch, 0, 2), dtype),
        point_mask=jnp.zeros((batch, 0), bool),
        circles=centers, circle_radii=radii,
        circle_vels=jnp.zeros((batch, M, 2), dtype), circle_mask=mask,
        lines=jnp.zeros((batch, 0, 2, 2), dtype), line_vels=jnp.zeros((batch, 0, 2), dtype),
        line_mask=jnp.zeros((batch, 0), bool),
        polygons=jnp.zeros((batch, 0, 3, 2), dtype), polygon_nv=jnp.zeros((batch, 0), jnp.int32),
        polygon_vels=jnp.zeros((batch, 0, 2), dtype), polygon_mask=jnp.zeros((batch, 0), bool),
    )
    return Scenario(
        x0=x0, xf=xf, obstacles=obstacles,
        via_points=jnp.zeros((batch, spec.via_cap, 3), dtype),
        via_mask=jnp.zeros((batch, spec.via_cap), bool),
        u_prev=jnp.zeros((batch, spec.nu), dtype),
    )


def family_spec(name: str, N: int = 30) -> OcpSpec:
    """Widened-family variants of the flagship carlike min-time config.

    Parity anchors: ``canonical_carlike`` is the reference's own flagship
    (examples/cfg/carlike_minimum_time.yaml — two_circles footprint,
    `teb_local_planner/robot_footprint_model.h :: TwoCirclesRobotFootprint`);
    ``converter_lines`` models costmap_converter `CostmapToLinesDBSRANSAC`
    output (line obstacle slots); ``via_points`` is
    `min_time_via_points_cost.h :: MinTimeViaPointsCost`; ``nonuniform`` is
    the non-uniform variable grid. Used by bench.py's families mode for the
    per-family oracle decomposition (round 4).
    """
    import dataclasses as _dc

    from mpc_local_planner_tpu.geometry.footprints import (
        PolygonFootprint,
        TwoCirclesFootprint,
    )

    base = config3_carlike_min_time(N=N, obstacle_cap=8)
    if name == "flagship":
        return base
    if name == "canonical_carlike":
        return _dc.replace(
            base,
            footprint=TwoCirclesFootprint(
                front_offset=0.15, front_radius=0.2,
                rear_offset=-0.15, rear_radius=0.2,
            ),
        )
    if name == "converter_lines":
        return _dc.replace(base, obstacle_cap=6)  # slots filled with lines
    if name == "via_points":
        return _dc.replace(
            base, objective="minimum_time_via_points", via_cap=4,
            via_position_weight=2.0,
        )
    if name == "polygon_footprint":
        return _dc.replace(
            base,
            footprint=PolygonFootprint(
                vertices=jnp.asarray(
                    [[0.25, 0.15], [-0.25, 0.15], [-0.25, -0.15], [0.25, -0.15]]
                )
            ),
        )
    if name == "nonuniform":
        return _dc.replace(base, nonuniform_dt=True)
    raise ValueError(f"unknown family {name!r}")


def family_ensemble(name: str, spec: OcpSpec, batch: int, key: jax.Array,
                    dtype=jnp.float32) -> Scenario:
    """Scenario ensemble for a widened family.

    ``converter_lines`` replaces the circle slots with wall segments
    (endpoints along the corridor, kept clear of start/goal like the circle
    sampler). ``via_points`` adds corridor via points: points ON the path
    corridor with a small lateral offset — the reference extracts its via
    points from the global plan every `global_plan_viapoint_sep` meters
    (`updateViaPointsContainer`), so corridor points are the faithful
    semantics (round 3 used adversarial random vias that fight the fixed
    terminal state; those measure robustness, not the reference workload).
    """
    import dataclasses as _dc

    scen = random_ensemble(spec, batch, key, dtype=dtype)
    if name == "converter_lines":
        M = spec.obstacle_cap
        kf, kl, ka, kh = jax.random.split(jax.random.fold_in(key, 1), 4)
        ang = jnp.arctan2(
            scen.xf[:, 1] - scen.x0[:, 1], scen.xf[:, 0] - scen.x0[:, 0]
        )
        dist = jnp.linalg.norm(scen.xf[:, :2] - scen.x0[:, :2], axis=-1)
        heading = jnp.stack([jnp.cos(ang), jnp.sin(ang)], axis=-1)
        normal = jnp.stack([-jnp.sin(ang), jnp.cos(ang)], axis=-1)
        frac = jax.random.uniform(kf, (batch, M), minval=0.25, maxval=0.75)
        lateral = jax.random.uniform(kl, (batch, M), minval=-1.0, maxval=1.0)
        wall_ang = jax.random.uniform(ka, (batch, M), minval=-0.5, maxval=0.5)
        half = 0.4
        mid = (
            frac[..., None] * dist[:, None, None] * heading[:, None, :]
            + lateral[..., None] * normal[:, None, :]
        )
        wdir = (
            jnp.cos(wall_ang)[..., None] * normal[:, None, :]
            + jnp.sin(wall_ang)[..., None] * heading[:, None, :]
        )
        ends = jnp.stack([mid - half * wdir, mid + half * wdir], axis=-2)
        mask = jnp.abs(lateral) > 0.45
        obstacles = _dc.replace(
            scen.obstacles,
            circles=jnp.zeros((batch, 0, 2), dtype),
            circle_radii=jnp.zeros((batch, 0), dtype),
            circle_vels=jnp.zeros((batch, 0, 2), dtype),
            circle_mask=jnp.zeros((batch, 0), bool),
            lines=ends.astype(dtype),
            line_vels=jnp.zeros((batch, M, 2), dtype),
            line_mask=mask,
        )
        scen = _dc.replace(scen, obstacles=obstacles)
    if name == "via_points" and spec.via_cap:
        V = spec.via_cap
        kv, kw = jax.random.split(jax.random.fold_in(key, 2))
        ang = jnp.arctan2(
            scen.xf[:, 1] - scen.x0[:, 1], scen.xf[:, 0] - scen.x0[:, 0]
        )
        dist = jnp.linalg.norm(scen.xf[:, :2] - scen.x0[:, :2], axis=-1)
        heading = jnp.stack([jnp.cos(ang), jnp.sin(ang)], axis=-1)
        normal = jnp.stack([-jnp.sin(ang), jnp.cos(ang)], axis=-1)
        frac = jnp.linspace(0.2, 0.8, V)[None, :]  # ordered along the plan
        lateral = jax.random.uniform(kw, (batch, V), minval=-0.3, maxval=0.3)
        pts = (
            frac[..., None] * dist[:, None, None] * heading[:, None, :]
            + lateral[..., None] * normal[:, None, :]
        )
        via = jnp.concatenate(
            [pts, jnp.broadcast_to(ang[:, None, None], (batch, V, 1))], axis=-1
        )
        scen = _dc.replace(
            scen,
            via_points=via.astype(dtype),
            via_mask=jnp.ones((batch, V), bool),
        )
    return scen


FAMILY_NAMES = (
    "flagship", "canonical_carlike", "converter_lines", "via_points",
    "polygon_footprint", "nonuniform",
)


def lines_astar_plans(
    scenario,
    n_points: int = 16,
    resolution: float = 0.1,
    robot_radius: float = 0.25,
    margin: float = 1.8,
):
    """Per-lane A* global plans around the wall fields (host-side).

    The move_base global-planner role for the converter-lines ensemble:
    each lane's active wall segments are rasterized into an occupancy grid
    and 8-connected A* routes start→goal; paths are arc-resampled to
    ``n_points`` poses. Lanes where A* fails (start/goal enclosed) fall
    back to the straight line — those are the genuinely infeasible draws.
    Returns (plans (B, n_points, 3) float32, ok (B,) bool). Host-side and
    O(B · grid) slow; build once per ensemble, feed `primal_from_plan`.
    """
    import numpy as np

    from mpc_local_planner_tpu.planner.local_planner import Costmap
    from mpc_local_planner_tpu.utils.worlds import astar_plan

    x0 = np.asarray(scenario.x0[..., :2], np.float64)
    xf = np.asarray(scenario.xf[..., :2], np.float64)
    lines = np.asarray(scenario.obstacles.lines, np.float64)   # (B, M, 2, 2)
    mask = np.asarray(scenario.obstacles.line_mask)
    B = x0.shape[0]
    plans = np.zeros((B, n_points, 3), np.float64)
    ok = np.zeros(B, bool)
    for b in range(B):
        lo = np.minimum(x0[b], xf[b]) - margin
        hi = np.maximum(x0[b], xf[b]) + margin
        W = int(np.ceil((hi[0] - lo[0]) / resolution)) + 1
        H = int(np.ceil((hi[1] - lo[1]) / resolution)) + 1
        data = np.zeros((H, W), np.uint8)
        for j in range(lines.shape[1]):
            if not mask[b, j]:
                continue
            a, c = lines[b, j, 0], lines[b, j, 1]
            n = max(2, int(np.linalg.norm(c - a) / (0.5 * resolution)))
            for t in np.linspace(0.0, 1.0, n):
                p = a + t * (c - a)
                cx = int(round((p[0] - lo[0]) / resolution))
                cy = int(round((p[1] - lo[1]) / resolution))
                if 0 <= cy < H and 0 <= cx < W:
                    data[cy, cx] = 254
        cm = Costmap(data=data, origin=(float(lo[0]), float(lo[1])),
                     resolution=resolution)
        try:
            path = astar_plan(cm, x0[b], xf[b], robot_radius=robot_radius)
        except ValueError:
            path = None
        if path is None or path.shape[0] < 2:
            d = xf[b] - x0[b]
            th = np.arctan2(d[1], d[0])
            fr = np.linspace(0.0, 1.0, n_points)[:, None]
            plans[b, :, :2] = x0[b] + fr * d
            plans[b, :, 2] = th
            continue
        # de-snap the endpoints (A* returns cell centers; the true start
        # and goal anchor the seed — primal_from_plan re-pins x_0 anyway
        # but the terminal pose must be the actual goal)
        path = np.array(path, np.float64)
        path[0, :2] = x0[b]
        path[-1, :2] = xf[b]
        seg = np.diff(path[:, :2], axis=0)
        arc = np.concatenate([[0.0], np.cumsum(np.linalg.norm(seg, axis=1))])
        s = np.linspace(0.0, arc[-1], n_points)
        plans[b, :, 0] = np.interp(s, arc, path[:, 0])
        plans[b, :, 1] = np.interp(s, arc, path[:, 1])
        d = np.diff(plans[b, :, :2], axis=0)
        th = np.arctan2(d[:, 1], d[:, 0])
        plans[b, :-1, 2] = th
        plans[b, -1, 2] = th[-1]
        ok[b] = True
    return jnp.asarray(plans, jnp.float32), ok


def lines_detour_plan(scenario) -> jax.Array:
    """A 3-point global-plan analog routed around the wall field.

    Parity role: in the reference the LOCAL planner never faces walls from
    a straight-line seed — move_base's global planner hands it a plan
    routed around them, and `Controller::generateInitialStateTrajectory`
    seeds from that plan. This builds the batched equivalent for the
    converter-lines ensemble: start → mid-path waypoint displaced to the
    emptier side of the wall field → goal. jit-safe (pure jnp); feed to
    `ocp.grid.primal_from_plan`.
    """
    x0, xf = scenario.x0[..., :2], scenario.xf[..., :2]
    d = xf - x0
    dist = jnp.linalg.norm(d, axis=-1, keepdims=True)
    hn = d / jnp.maximum(dist, 1e-6)
    normal = jnp.stack([-hn[..., 1], hn[..., 0]], axis=-1)
    mids = jnp.mean(scenario.obstacles.lines, axis=-2)  # (..., M, 2)
    rel = mids - x0[..., None, :]
    lat = jnp.sum(rel * normal[..., None, :], axis=-1)  # (..., M)
    m = scenario.obstacles.line_mask.astype(lat.dtype)
    mean_lat = jnp.sum(lat * m, axis=-1) / jnp.maximum(jnp.sum(m, axis=-1), 1.0)
    side = -jnp.sign(mean_lat + 1e-6)
    way = 0.5 * (x0 + xf) + side[..., None] * 1.2 * normal
    th = jnp.arctan2(d[..., 1], d[..., 0])[..., None]
    mk = lambda p: jnp.concatenate([p, th], axis=-1)  # noqa: E731
    return jnp.stack([mk(x0), mk(way), mk(xf)], axis=-2)


def classify_feasibility(
    spec,
    scenario,
    max_instances: int = 64,
    tol: float = 1e-5,
    maxiter: int = 600,
    seed_primal=None,
):
    """Ensemble feasibility oracle: classify instances with the float64
    golden solver at a generous budget (SURVEY.md §6 failure-detection row —
    the batched analog of IPOPT's per-solve ``optimal_solution_found``).

    For each of the first ``max_instances`` scenarios: (1) a generous
    float64 AL-SQP cold solve finds a candidate point, (2) the scipy-SLSQP
    golden solver (solvers/golden.py — the independent correctness anchor)
    polishes from it (SLSQP cannot navigate from the infeasible straight-
    line init on obstacle problems — same protocol as the golden tests),
    (3) the instance is classified by the max equality/inequality violation
    at the better of the two points:

      "feasible"  — a point within ``tol`` was certified
      "unknown"   — none found; the instance is infeasible OR merely beyond
                    both budgets (SLSQP cannot certify infeasibility)

    Host-only and slow (one SLSQP run per instance); used offline to
    calibrate the cheap cold-budget oracle reported by bench.py
    (``feasible_frac_cold_oracle``), not on the TPU path. Returns
    (labels list, details dict).
    """
    import numpy as np

    from mpc_local_planner_tpu.ocp.grid import initial_primal
    from mpc_local_planner_tpu.ocp.problem import make_ocp_functions
    from mpc_local_planner_tpu.solvers.al_sqp import (
        SolverSettings,
        init_duals,
        solve_single,
    )
    from mpc_local_planner_tpu.solvers.golden import solve_golden

    if not jax.config.jax_enable_x64:
        raise RuntimeError(
            "classify_feasibility needs float64 (jax_enable_x64) — without "
            "it the 'golden' classification silently runs at the same f32 "
            "precision as the solver under test"
        )
    funcs = make_ocp_functions(spec)
    B = int(scenario.x0.shape[0])
    n = min(B, max_instances)
    take = jax.tree_util.tree_map
    scen64 = take(
        lambda a: jnp.asarray(a[:n], jnp.float64)
        if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating)
        else a[:n],
        scenario,
    )
    cold = SolverSettings.for_spec(spec)
    if seed_primal is None:
        init = initial_primal(spec, scen64)
    else:
        # caller-provided seed (e.g. A*-plan-seeded primals for wall
        # worlds — r5: the straight-line-seeded f64 pipeline failed to
        # certify 15/128 instances the plan-seeded oracle provably solves
        # at 1e-3; the classifier must be seeded at least as well as the
        # solver under test or its denominator undercounts)
        init = take(
            lambda a: jnp.asarray(a[:n], jnp.float64)
            if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating)
            else a[:n],
            seed_primal,
        )
    duals = take(
        lambda a: jnp.broadcast_to(a, (n,) + a.shape),
        init_duals(spec, cold, dtype=jnp.float64),
    )
    r = jax.jit(jax.vmap(lambda s, i, d: solve_single(spec, cold, s, i, d)))(
        scen64, init, duals
    )

    def viol_at(primal, scen_b):
        eq = float(jnp.max(jnp.abs(funcs.eq(primal, scen_b))))
        ineq = float(jnp.max(funcs.ineq(primal, scen_b)))
        return max(eq, max(ineq, 0.0))

    labels = []
    viols = []
    per_instance = []
    for b in range(n):
        scen_b = take(lambda a: a[b], scen64)
        primal_b = take(lambda a: a[b], r.primal)
        al_viol = viol_at(primal_b, scen_b)
        viol = al_viol
        used_slsqp = False
        if viol > tol:
            # polish with the independent golden solver from the AL iterate
            try:
                sol_g, _res = solve_golden(
                    spec, scen_b, init=primal_b, tol=1e-10, maxiter=maxiter
                )
                pv = viol_at(sol_g, scen_b)
                used_slsqp = pv < viol
                viol = min(viol, pv)
            except Exception:  # noqa: BLE001 — SLSQP failures count as unknown
                pass
        viols.append(viol)
        labels.append("feasible" if viol <= tol else "unknown")
        # which pipeline stage certified (lane-level diagnosis, r5): an
        # instance only SLSQP could certify is beyond any fixed-budget f32
        # path; one the f64 AL certified directly is budget/precision-hard
        per_instance.append(
            {
                "al_viol": float(al_viol),
                "viol": float(viol),
                "certified_by": (
                    "al64" if al_viol <= tol
                    else ("slsqp" if viol <= tol else "none")
                ),
                "used_slsqp": used_slsqp,
            }
        )
    feas = labels.count("feasible")
    return labels, {
        "n": n,
        "feasible_frac": feas / max(n, 1),
        "max_viol_on_feasible": float(
            np.max([v for v, l in zip(viols, labels) if l == "feasible"], initial=0.0)
        ),
        "per_instance": per_instance,
    }
