"""Fused whole-solve Pallas kernel vs the XLA AL-SQP path.

The kernel (ops/fused_al_sqp_pallas) re-implements solvers/al_sqp's exact
iteration with hand-derived closed-form derivatives, so equivalence is
checked END TO END: same primal, duals, constraint norms, and convergence
flags after a full multi-phase solve, in Pallas interpret mode on CPU
(the TPU dispatch path is exercised by bench.py on hardware).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_local_planner_tpu.benchmarks import config3_carlike_min_time, random_ensemble
from mpc_local_planner_tpu.ocp.grid import initial_primal
from mpc_local_planner_tpu.ops.fused_al_sqp_pallas import (
    fused_obstacles_supported,
    fused_solve,
    fused_supported,
)
from mpc_local_planner_tpu.solvers.al_sqp import (
    SolverSettings,
    init_duals,
    solve_single,
)

WARM = SolverSettings(
    n_al=2, n_sqp=3, rho0=120.0, reg0=1.0, tol_eq=1e-3, tol_ineq=1e-3,
    alphas=(1.0, 0.7, 0.5, 0.35, 0.22, 0.14, 0.08, 0.03),
)


def _setup(N=8, M=4, batch=16, key=0):
    spec = config3_carlike_min_time(N=N, obstacle_cap=M)
    scen = random_ensemble(spec, batch, jax.random.PRNGKey(key))
    scen = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32) if a.dtype == jnp.float64 else a, scen
    )
    init = initial_primal(spec, scen)
    duals = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (batch,) + a.shape),
        init_duals(spec, WARM, dtype=jnp.float32),
    )
    return spec, scen, init, duals


def test_flagship_spec_in_scope():
    spec, scen, _, _ = _setup()
    assert fused_supported(spec)
    assert fused_obstacles_supported(scen)


def test_out_of_scope_specs_rejected():
    spec = config3_carlike_min_time(N=8, obstacle_cap=4)
    # the non-uniform per-stage-dt grid joined kernel scope late round 3
    assert fused_supported(dataclasses.replace(spec, nonuniform_dt=True))
    # all three FD collocation rules AND bounded shooting grids are in scope
    assert fused_supported(
        dataclasses.replace(spec, collocation="midpoint_differences")
    )
    assert fused_supported(
        dataclasses.replace(spec, collocation="crank_nicolson_differences")
    )
    assert fused_supported(dataclasses.replace(spec, collocation="shooting_rk4"))
    assert not fused_supported(
        dataclasses.replace(spec, collocation="shooting_rk4_8")  # substep cap
    )
    # rk6 (7 stages) fits the 28-eval chain bound up to 4 substeps; rk7
    # (11 stages after the dead-stage truncation) only up to 2 (r4)
    assert fused_supported(dataclasses.replace(spec, collocation="shooting_rk6"))
    assert fused_supported(dataclasses.replace(spec, collocation="shooting_rk7_2"))
    assert not fused_supported(
        dataclasses.replace(spec, collocation="shooting_rk7_3")
    )
    # the substep cap still applies independently of the eval bound (a
    # low-stage integrator at high substeps is outside the tested envelope)
    assert not fused_supported(
        dataclasses.replace(spec, collocation="shooting_explicit_euler_20")
    )
    assert not fused_supported(
        dataclasses.replace(spec, collocation="shooting_rk2_heun_8")
    )
    # quadratic form, via points, terminal ball, and dynamic obstacles ARE
    # in scope (via points joined late round 3)
    assert fused_supported(
        dataclasses.replace(spec, objective="minimum_time_via_points", via_cap=4)
    )
    assert fused_supported(dataclasses.replace(spec, objective="quadratic_form"))
    assert fused_supported(dataclasses.replace(spec, ball_radius=0.5))
    assert fused_supported(
        dataclasses.replace(spec, enable_dynamic_obstacles=True)
    )


def test_fused_matches_xla_end_to_end():
    """Full 2x3 warm solve: primal/duals/flags equal at f32 tolerance."""
    spec, scen, init, duals = _setup()
    ref = jax.jit(
        jax.vmap(lambda s, i, d: solve_single(spec, WARM, s, i, d))
    )(scen, init, duals)
    out = fused_solve(spec, WARM, scen, init, duals, interpret=True)

    np.testing.assert_allclose(
        np.asarray(out.primal.xs), np.asarray(ref.primal.xs), atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.primal.us), np.asarray(ref.primal.us), atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.primal.dt), np.asarray(ref.primal.dt), atol=5e-6
    )
    for name in ("lam_def", "lam_term", "mu_obs", "mu_rate", "mu_box",
                 "mu_dt", "rho"):
        a = np.asarray(getattr(out.duals, name))
        b = np.asarray(getattr(ref.duals, name))
        np.testing.assert_allclose(a, b, atol=5e-3, rtol=1e-3)
    assert np.array_equal(
        np.asarray(out.converged), np.asarray(ref.converged)
    )
    np.testing.assert_allclose(
        np.asarray(out.eq_norm), np.asarray(ref.eq_norm), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.cost), np.asarray(ref.cost), atol=1e-5
    )


def test_fused_dynamic_obstacles_match_xla():
    """Dynamic-obstacle prediction (center + v * i * dt0, per-cycle stage
    data) must agree with al_sqp._stage_obstacles through the whole solve."""
    spec, scen, init, duals = _setup(N=8, M=4, batch=16, key=5)
    spec = dataclasses.replace(spec, enable_dynamic_obstacles=True)
    # give every point slot a velocity crossing the corridor
    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    obs = scen.obstacles
    obs = dataclasses.replace(
        obs,
        point_vels=jax.random.uniform(
            k1, obs.point_vels.shape, jnp.float32, -0.6, 0.6
        ),
        circle_vels=jax.random.uniform(
            k2, obs.circle_vels.shape, jnp.float32, -0.6, 0.6
        ),
    )
    scen = dataclasses.replace(scen, obstacles=obs)
    assert fused_supported(spec) and fused_obstacles_supported(scen)
    ref = jax.jit(
        jax.vmap(lambda s, i, d: solve_single(spec, WARM, s, i, d))
    )(scen, init, duals)
    out = fused_solve(spec, WARM, scen, init, duals, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out.primal.xs), np.asarray(ref.primal.xs), atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.primal.dt), np.asarray(ref.primal.dt), atol=5e-6
    )
    assert np.array_equal(np.asarray(out.converged), np.asarray(ref.converged))
    np.testing.assert_allclose(
        np.asarray(out.ineq_viol), np.asarray(ref.ineq_viol), atol=1e-5
    )
    # the dynamic path must actually differ from the static interpretation
    static = fused_solve(
        dataclasses.replace(spec, enable_dynamic_obstacles=False),
        WARM, scen, init, duals, interpret=True,
    )
    assert not np.allclose(
        np.asarray(out.primal.xs), np.asarray(static.primal.xs), atol=1e-4
    )


def test_fused_unicycle_and_fixed_dt():
    """Unicycle model + fixed-dt (quadratic-free min-time degenerate) paths."""
    from mpc_local_planner_tpu.geometry.footprints import PointFootprint
    from mpc_local_planner_tpu.systems.models import RobotLimits, UnicycleModel
    from mpc_local_planner_tpu.ocp.spec import OcpSpec

    spec = OcpSpec(
        model=UnicycleModel(), footprint=PointFootprint(), N=6,
        objective="minimum_time", variable_dt=True, dt_min=1e-3, dt_max=0.5,
        dt_ref=0.3, xf_fixed=(True, True, True), min_obstacle_dist=0.1,
        obstacle_cap=2,
        limits=RobotLimits(max_vel_x=0.4, max_vel_x_backwards=0.2,
                           max_vel_theta=0.3, acc_lim_x=0.5),
    )
    assert fused_supported(spec)
    scen = random_ensemble(spec, 8, jax.random.PRNGKey(2))
    init = initial_primal(spec, scen)
    duals = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (8,) + a.shape),
        init_duals(spec, WARM, dtype=jnp.float32),
    )
    ref = jax.jit(
        jax.vmap(lambda s, i, d: solve_single(spec, WARM, s, i, d))
    )(scen, init, duals)
    out = fused_solve(spec, WARM, scen, init, duals, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out.primal.xs), np.asarray(ref.primal.xs), atol=5e-5
    )
    assert np.array_equal(np.asarray(out.converged), np.asarray(ref.converged))


def test_auto_wrapper_falls_back_on_cpu():
    """solve_single_auto under vmap on CPU must take the XLA path and agree."""
    from mpc_local_planner_tpu.solvers.al_sqp import solve_single_auto

    spec, scen, init, duals = _setup(N=6, M=2, batch=4)
    auto = jax.jit(jax.vmap(solve_single_auto(spec, WARM)))
    ref = jax.jit(
        jax.vmap(lambda s, i, d: solve_single(spec, WARM, s, i, d))
    )(scen, init, duals)
    out = auto(scen, init, duals)
    np.testing.assert_allclose(
        np.asarray(out.primal.xs), np.asarray(ref.primal.xs), atol=1e-6
    )
    assert np.array_equal(np.asarray(out.converged), np.asarray(ref.converged))


def test_warm_cycle_through_fused_matches_policy():
    """A warm-start MPC cycle built on the fused result behaves like the XLA
    one (the SolveResult contract is complete: duals shift, primal advances)."""
    from mpc_local_planner_tpu.ocp.grid import warm_start_resample
    from mpc_local_planner_tpu.solvers.al_sqp import shift_duals

    spec, scen, init, duals = _setup(N=6, M=2, batch=4)
    out = fused_solve(spec, WARM, scen, init, duals, interpret=True)
    x0n = jnp.where(out.converged[:, None], out.primal.xs[:, 1, :], scen.x0)
    initn = warm_start_resample(out.primal, x0n, steps=1, spec=spec)
    dn = jax.vmap(lambda d: shift_duals(d, WARM, steps=1))(out.duals)
    scen2 = dataclasses.replace(scen, x0=x0n)
    out2 = fused_solve(spec, WARM, scen2, initn, dn, interpret=True)
    assert np.all(np.isfinite(np.asarray(out2.primal.xs)))
    assert np.asarray(out2.eq_norm).shape == (4,)


# --------------------------------------------------------------------------- #
# round-2 scope widening: quadratic-form objective, terminal ball, all models
# --------------------------------------------------------------------------- #
def _assert_solve_match(spec, scen, init, duals, atol=5e-5, dual_atol=5e-3,
                        dual_rtol=1e-3):
    ref = jax.jit(
        jax.vmap(lambda s, i, d: solve_single(spec, WARM, s, i, d))
    )(scen, init, duals)
    out = fused_solve(spec, WARM, scen, init, duals, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out.primal.xs), np.asarray(ref.primal.xs), atol=atol
    )
    np.testing.assert_allclose(
        np.asarray(out.primal.us), np.asarray(ref.primal.us), atol=atol
    )
    np.testing.assert_allclose(
        np.asarray(out.primal.dt), np.asarray(ref.primal.dt), atol=atol / 5
    )
    for name in ("lam_def", "lam_term", "mu_obs", "mu_rate", "mu_box",
                 "mu_dt", "mu_ball", "rho"):
        a = np.asarray(getattr(out.duals, name))
        b = np.asarray(getattr(ref.duals, name))
        np.testing.assert_allclose(a, b, atol=dual_atol, rtol=dual_rtol, err_msg=name)
    assert np.array_equal(np.asarray(out.converged), np.asarray(ref.converged))
    np.testing.assert_allclose(
        np.asarray(out.cost), np.asarray(ref.cost), atol=1e-4, rtol=1e-5
    )
    return out, ref


def _setup_for(spec, batch=12, key=3):
    scen = random_ensemble(spec, batch, jax.random.PRNGKey(key))
    init = initial_primal(spec, scen)
    duals = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (batch,) + a.shape),
        init_duals(spec, WARM, dtype=jnp.float32),
    )
    return scen, init, duals


def test_fused_quadratic_form_with_ball_matches_xla():
    """BASELINE config #2 family: quadratic form + terminal quadratic cost +
    terminal ball + circular footprint obstacles (fixed dt)."""
    from mpc_local_planner_tpu.benchmarks import config2_diffdrive_obstacles

    spec = config2_diffdrive_obstacles(N=8, obstacle_cap=4)
    assert fused_supported(spec)
    scen, init, duals = _setup_for(spec)
    out, _ = _assert_solve_match(spec, scen, init, duals)
    # the ball multiplier must actually engage somewhere in the ensemble
    assert np.asarray(out.duals.mu_ball).max() > 0.0


def test_fused_quadratic_integral_trapezoidal_hybrid_variable_dt():
    """Integral-form trapezoidal quadratic cost + hybrid min-time weight on a
    variable-dt grid: exercises every dtau coupling row of the closed-form
    stage/terminal derivatives."""
    from mpc_local_planner_tpu.benchmarks import config2_diffdrive_obstacles

    spec = dataclasses.replace(
        config2_diffdrive_obstacles(N=8, obstacle_cap=4),
        integral_form=True,
        cost_integration="trapezoidal",
        hybrid_time_weight=0.5,
        variable_dt=True,
        dt_min=1e-3,
        dt_max=0.5,
    )
    assert fused_supported(spec)
    scen, init, duals = _setup_for(spec, key=9)
    _assert_solve_match(spec, scen, init, duals)


def test_fused_quadratic_integral_left_sum():
    from mpc_local_planner_tpu.benchmarks import config1_unicycle_quadratic

    spec = dataclasses.replace(
        config1_unicycle_quadratic(N=8), integral_form=True, obstacle_cap=0
    )
    assert fused_supported(spec)
    scen, init, duals = _setup_for(spec, key=11)
    _assert_solve_match(spec, scen, init, duals)


@pytest.mark.parametrize("model_name", ["front_wheel", "bicycle"])
def test_fused_models_match_xla(model_name):
    """Front-wheel-drive car and kinematic bicycle closed-form Jacobians vs
    the AD defect linearization, end to end through the min-time solve."""
    from mpc_local_planner_tpu.systems.models import (
        KinematicBicycleModelVelocityInput,
        SimpleCarFrontWheelDrivingModel,
    )

    model = (
        SimpleCarFrontWheelDrivingModel(wheelbase=0.5)
        if model_name == "front_wheel"
        else KinematicBicycleModelVelocityInput(lf=0.3, lr=0.2)
    )
    spec = dataclasses.replace(
        config3_carlike_min_time(N=8, obstacle_cap=4), model=model
    )
    assert fused_supported(spec)
    scen, init, duals = _setup_for(spec, key=13)
    _assert_solve_match(spec, scen, init, duals)


# --------------------------------------------------------------------------- #
# round-3 scope widening: two_circles/line footprints, line/polygon slots
# --------------------------------------------------------------------------- #
def _mixed_obstacles(batch, key, mp=0, mc=0, ml=0, mg=0, V=4, dyn=False,
                     vary_nv=False):
    """Random batched ObstacleSet with every requested slot family."""
    from mpc_local_planner_tpu.geometry.obstacles import ObstacleSet

    ks = jax.random.split(key, 12)
    f32 = jnp.float32
    U = lambda k, shape, lo, hi: jax.random.uniform(k, shape, f32, lo, hi)  # noqa: E731
    vel = lambda k, shape: (  # noqa: E731
        U(k, shape, -0.4, 0.4) if dyn else jnp.zeros(shape, f32)
    )
    mask = lambda k, shape: U(k, shape, 0.0, 1.0) > 0.25  # noqa: E731

    line_a = U(ks[3], (batch, ml, 2), 0.3, 2.2)
    lines = jnp.stack([line_a, line_a + U(ks[4], (batch, ml, 2), -0.7, 0.7)], axis=-2)
    centers = U(ks[5], (batch, mg, 2), 0.5, 2.0)
    ang = jnp.sort(U(ks[6], (batch, mg, V), 0.0, 2.0 * np.pi), axis=-1)
    rad = U(ks[7], (batch, mg, V), 0.15, 0.4)
    polys = centers[..., None, :] + jnp.stack(
        [rad * jnp.cos(ang), rad * jnp.sin(ang)], axis=-1
    )
    if vary_nv and V > 3:
        nv = 3 + (jax.random.randint(ks[8], (batch, mg), 0, V - 2))
    else:
        nv = jnp.full((batch, mg), V, jnp.int32)
    return ObstacleSet(
        points=U(ks[0], (batch, mp, 2), 0.3, 2.2),
        point_vels=vel(ks[9], (batch, mp, 2)),
        point_mask=mask(ks[0], (batch, mp)),
        circles=U(ks[1], (batch, mc, 2), 0.3, 2.2),
        circle_radii=U(ks[2], (batch, mc), 0.1, 0.3),
        circle_vels=vel(ks[10], (batch, mc, 2)),
        circle_mask=mask(ks[1], (batch, mc)),
        lines=lines,
        line_vels=vel(ks[11], (batch, ml, 2)),
        line_mask=mask(ks[3], (batch, ml)),
        polygons=polys,
        polygon_nv=nv,
        polygon_vels=vel(ks[5], (batch, mg, 2)),
        polygon_mask=mask(ks[6], (batch, mg)),
    )


# The widened-family tests allow a slightly looser trajectory tolerance than
# the flagship 5e-5: the min-combining geometry (two-disc footprints, segment
# clamps, polygon edge argmins) flips discrete branches at f32-noise-level
# value ties, and a single flipped branch perturbs the 6-iteration solve by
# O(1e-4) in a few lanes. The underlying chains are exact: at a 1x1 budget the
# fused and XLA paths agree to 2.4e-7 (f32 eps) on the same ensembles, growing
# ~3x per iteration through the near-bang-bang min-time landscape (measured
# measured ladder on the dynamic line-obstacle ensemble: 1x1 2.4e-7,
# 1x3 1.4e-6, 2x3 4.1e-3 — the jump happens across the AL phase boundary,
# where the dual update multiplies iterate noise by rho ~ 120 into the
# multipliers that shape phase 2; a bit-level change anywhere — e.g. the
# round-3 terminal-residual fix — re-rolls which lanes land near the
# envelope). 6e-3 bounds the measured envelope with margin; conv-flag
# EQUALITY stays exact and is the semantic anchor. The flagship kernel
# meets 1.5e-3 against XLA on real hardware (BENCH_NOTES r2).
WIDE_ATOL = 6e-3


def _widened_setup(footprint, key=21, batch=12, N=8, dyn=False, **fam):
    spec = dataclasses.replace(
        config3_carlike_min_time(
            N=N, obstacle_cap=sum(fam.get(k, 0) for k in ("mp", "mc", "ml", "mg"))
        ),
        footprint=footprint,
        enable_dynamic_obstacles=dyn,
    )
    scen = random_ensemble(
        dataclasses.replace(spec, obstacle_cap=0), batch, jax.random.PRNGKey(key)
    )
    obs = _mixed_obstacles(batch, jax.random.PRNGKey(key + 1), dyn=dyn, **fam)
    scen = dataclasses.replace(scen, obstacles=obs)
    init = initial_primal(spec, scen)
    duals = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (batch,) + a.shape),
        init_duals(spec, WARM, dtype=jnp.float32),
    )
    return spec, scen, init, duals


def test_widened_footprints_in_scope():
    from mpc_local_planner_tpu.geometry.footprints import (
        LineFootprint,
        PolygonFootprint,
        TwoCirclesFootprint,
    )

    spec = config3_carlike_min_time(N=8, obstacle_cap=4)
    assert fused_supported(
        dataclasses.replace(spec, footprint=TwoCirclesFootprint())
    )
    assert fused_supported(
        dataclasses.replace(
            spec, footprint=LineFootprint(line_start=(-0.1, 0.0), line_end=(0.3, 0.0))
        )
    )
    # polygon footprints are in scope up to 8 vertices (late round 3)
    assert fused_supported(
        dataclasses.replace(
            spec,
            footprint=PolygonFootprint(
                vertices=((-0.2, -0.2), (0.2, -0.2), (0.2, 0.2), (-0.2, 0.2))
            ),
        )
    )
    import numpy as _np

    ang = _np.linspace(0, 2 * _np.pi, 10, endpoint=False)
    assert not fused_supported(
        dataclasses.replace(
            spec,
            footprint=PolygonFootprint(
                vertices=tuple(
                    (float(0.3 * _np.cos(a)), float(0.3 * _np.sin(a))) for a in ang
                )
            ),
        )
    )


def test_fused_two_circles_footprint_matches_xla():
    """The canonical carlike footprint (two_circles) through the kernel:
    θ-dependent disc centers exercise the 3x3 pose GN block."""
    from mpc_local_planner_tpu.geometry.footprints import TwoCirclesFootprint

    fp = TwoCirclesFootprint(
        front_offset=0.15, front_radius=0.2, rear_offset=-0.15, rear_radius=0.18
    )
    spec, scen, init, duals = _widened_setup(fp, key=31, mp=1, mc=3)
    assert fused_supported(spec) and fused_obstacles_supported(scen)
    _assert_solve_match(spec, scen, init, duals, atol=WIDE_ATOL,
                        dual_atol=0.1, dual_rtol=0.08)


def test_fused_line_obstacles_match_xla():
    """Line obstacle slots (converter `lines` mode / wall worlds) against the
    XLA point_to_segment chain, mixed with circles, incl. dynamic motion."""
    from mpc_local_planner_tpu.geometry.footprints import CircularFootprint

    spec, scen, init, duals = _widened_setup(
        CircularFootprint(radius=0.2), key=33, mc=2, ml=3, dyn=True
    )
    assert fused_supported(spec) and fused_obstacles_supported(scen)
    _assert_solve_match(spec, scen, init, duals, atol=WIDE_ATOL,
                        dual_atol=0.1, dual_rtol=0.08)


def test_fused_polygon_obstacles_match_xla():
    """Polygon obstacle slots: per-edge distances, equal tie-split minimum,
    even-odd inside sign, per-lane active vertex counts."""
    from mpc_local_planner_tpu.geometry.footprints import CircularFootprint

    spec, scen, init, duals = _widened_setup(
        CircularFootprint(radius=0.15), key=35, mc=1, mg=2, V=5, vary_nv=True
    )
    assert fused_supported(spec) and fused_obstacles_supported(scen)
    _assert_solve_match(spec, scen, init, duals, atol=WIDE_ATOL,
                        dual_atol=0.1, dual_rtol=0.08)


def test_fused_line_footprint_matches_xla():
    """Line footprint (pose-dependent segment) vs point/circle/line slots:
    exercises the moving-segment AD chain incl. the θ rows."""
    from mpc_local_planner_tpu.geometry.footprints import LineFootprint

    fp = LineFootprint(line_start=(-0.1, 0.0), line_end=(0.35, 0.0))
    spec, scen, init, duals = _widened_setup(fp, key=37, mp=1, mc=2, ml=2)
    assert fused_supported(spec) and fused_obstacles_supported(scen)
    _assert_solve_match(spec, scen, init, duals, atol=WIDE_ATOL,
                        dual_atol=0.1, dual_rtol=0.08)


def test_fused_mixed_slots_canonical_carlike():
    """All four slot families at once under the canonical carlike two_circles
    footprint, dynamic obstacles on — the widest in-scope configuration."""
    from mpc_local_planner_tpu.geometry.footprints import TwoCirclesFootprint

    fp = TwoCirclesFootprint(
        front_offset=0.15, front_radius=0.2, rear_offset=-0.15, rear_radius=0.2
    )
    spec, scen, init, duals = _widened_setup(
        fp, key=39, batch=10, mp=1, mc=2, ml=2, mg=1, V=4, dyn=True
    )
    assert fused_supported(spec) and fused_obstacles_supported(scen)
    _assert_solve_match(spec, scen, init, duals, atol=WIDE_ATOL,
                        dual_atol=0.1, dual_rtol=0.08)


@pytest.mark.parametrize(
    "method", ["midpoint_differences", "crank_nicolson_differences"]
)
def test_fused_collocation_rules_match_xla(method):
    """Midpoint and Crank-Nicolson collocation through the kernel: the
    structured −E⁻¹ fold (E = −I + (dt/2)Jx has only a θ column for every
    model) against the XLA path's inv3(E) linearization."""
    spec, scen, init, duals = _setup(N=8, M=4, batch=12, key=41)
    spec = dataclasses.replace(spec, collocation=method)
    assert fused_supported(spec)
    _assert_solve_match(spec, scen, init, duals, atol=WIDE_ATOL,
                        dual_atol=0.1, dual_rtol=0.08)


@pytest.mark.parametrize("ordered", [False, True])
def test_fused_via_points_match_xla(ordered):
    """minimum_time_via_points through the kernel: per-iteration stage
    assignment (first-min argmin; ordered cumulative cursor), candidate-local
    assignment in the line-search merit, exact quadratic via rows in the
    stage/terminal derivatives."""
    spec, scen, init, duals = _setup(N=8, M=2, batch=12, key=47)
    spec = dataclasses.replace(
        spec,
        objective="minimum_time_via_points",
        via_cap=3,
        via_position_weight=2.0,
        via_orientation_weight=0.5,
        via_points_ordered=ordered,
    )
    k1, k2 = jax.random.split(jax.random.PRNGKey(48))
    vp = jax.random.uniform(k1, (12, 3, 3), jnp.float32, 0.2, 2.0)
    vmask = jax.random.uniform(k2, (12, 3), jnp.float32) > 0.3
    scen = dataclasses.replace(scen, via_points=vp, via_mask=vmask)
    assert fused_supported(spec)
    out, ref = _assert_solve_match(spec, scen, init, duals, atol=WIDE_ATOL,
                                   dual_atol=0.1, dual_rtol=0.08)
    # the via attraction must actually bend the solution: compare against
    # the same solve with all via slots masked off
    scen_off = dataclasses.replace(scen, via_mask=jnp.zeros_like(vmask))
    off = fused_solve(spec, WARM, scen_off, init, duals, interpret=True)
    assert not np.allclose(
        np.asarray(out.primal.xs), np.asarray(off.primal.xs), atol=1e-3
    )


def test_fused_polygon_footprint_matches_xla():
    """Polygon footprint (the last footprint family) through the kernel:
    moving-polygon signed distances against every obstacle slot family."""
    from mpc_local_planner_tpu.geometry.footprints import PolygonFootprint

    fp = PolygonFootprint(
        vertices=((-0.15, -0.1), (0.25, -0.1), (0.25, 0.1), (-0.15, 0.1))
    )
    spec, scen, init, duals = _widened_setup(
        fp, key=53, batch=10, mp=1, mc=1, ml=1, mg=1, V=4
    )
    assert fused_supported(spec) and fused_obstacles_supported(scen)
    _assert_solve_match(spec, scen, init, duals, atol=WIDE_ATOL,
                        dual_atol=0.1, dual_rtol=0.08)


@pytest.mark.parametrize(
    "method", ["shooting_rk4", "shooting_rk2_heun", "shooting_rk5",
               "shooting_rk4_2", "shooting_rk6"]
)
def test_fused_shooting_matches_xla(method):
    """Multiple-shooting transcription through the kernel: the generic
    tableau-walking forward-mode (value + 3x6 tangent) against the XLA
    path's jacfwd through numerics/integrators.py."""
    spec, scen, init, duals = _setup(N=8, M=2, batch=10, key=59)
    spec = dataclasses.replace(spec, collocation=method)
    assert fused_supported(spec)
    _assert_solve_match(spec, scen, init, duals, atol=WIDE_ATOL,
                        dual_atol=0.1, dual_rtol=0.08)


@pytest.mark.parametrize("seed", [101, 202, 303])
def test_fused_random_inscope_spec_fuzz(seed):
    """Cross-feature interaction fuzz: a random in-scope spec (model x
    footprint x objective x collocation x flags x slot mix) must match the
    XLA path end to end — features are exercised TOGETHER, not per-family.
    Small shapes + 1x2 budget keep interpret mode fast."""
    import random

    from mpc_local_planner_tpu.geometry.footprints import (
        CircularFootprint, LineFootprint, PointFootprint, PolygonFootprint,
        TwoCirclesFootprint,
    )
    from mpc_local_planner_tpu.systems.models import (
        KinematicBicycleModelVelocityInput, SimpleCarFrontWheelDrivingModel,
        SimpleCarModel, UnicycleModel,
    )

    rng = random.Random(seed)
    model = rng.choice([
        UnicycleModel(), SimpleCarModel(wheelbase=0.5),
        SimpleCarFrontWheelDrivingModel(wheelbase=0.5),
        KinematicBicycleModelVelocityInput(lf=0.3, lr=0.2),
    ])
    footprint = rng.choice([
        PointFootprint(), CircularFootprint(radius=0.15),
        TwoCirclesFootprint(0.12, 0.15, -0.12, 0.15),
        LineFootprint(line_start=(-0.1, 0.0), line_end=(0.25, 0.0)),
        PolygonFootprint(vertices=((-0.1, -0.08), (0.2, -0.08), (0.2, 0.08),
                                   (-0.1, 0.08))),
    ])
    objective = rng.choice(["minimum_time", "quadratic_form",
                            "minimum_time_via_points"])
    colloc = rng.choice(["forward_differences", "midpoint_differences",
                         "crank_nicolson_differences", "shooting_rk4",
                         "shooting_rk2_heun"])
    fam = {"mp": rng.randint(0, 1), "mc": rng.randint(0, 2),
           "ml": rng.randint(0, 1), "mg": rng.randint(0, 1)}
    if sum(fam.values()) == 0:
        fam["mc"] = 1
    spec = dataclasses.replace(
        config3_carlike_min_time(N=6, obstacle_cap=sum(fam.values())),
        model=model, footprint=footprint, objective=objective,
        collocation=colloc,
        enable_dynamic_obstacles=rng.random() < 0.5,
        ball_radius=0.4 if rng.random() < 0.4 else 0.0,
        qf_diag=(5.0, 5.0, 2.0) if rng.random() < 0.4 else None,
        variable_dt=rng.random() < 0.7,
        integral_form=rng.random() < 0.5,
        cost_integration=rng.choice(["left_sum", "trapezoidal"]),
        hybrid_time_weight=0.3 if rng.random() < 0.3 else 0.0,
        via_cap=2 if objective == "minimum_time_via_points" else 0,
        via_points_ordered=rng.random() < 0.5,
        via_orientation_weight=0.3 if rng.random() < 0.5 else 0.0,
    )
    if spec.objective == "quadratic_form" and not spec.variable_dt:
        pass  # fixed-dt quadratic: fine
    assert fused_supported(spec), spec
    batch = 8
    scen = random_ensemble(
        dataclasses.replace(spec, obstacle_cap=0, via_cap=0),
        batch, jax.random.PRNGKey(seed), goal_radius=1.6,
    )
    obs = _mixed_obstacles(batch, jax.random.PRNGKey(seed + 1),
                           dyn=spec.enable_dynamic_obstacles, V=4, **fam)
    scen = dataclasses.replace(scen, obstacles=obs)
    if spec.via_cap:
        k1, k2 = jax.random.split(jax.random.PRNGKey(seed + 2))
        scen = dataclasses.replace(
            scen,
            via_points=jax.random.uniform(k1, (batch, 2, 3), jnp.float32, 0.2, 1.5),
            via_mask=jax.random.uniform(k2, (batch, 2), jnp.float32) > 0.3,
        )
    init = initial_primal(spec, scen)
    duals = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (batch,) + a.shape),
        init_duals(spec, WARM, dtype=jnp.float32),
    )
    S = dataclasses.replace(WARM, n_al=1, n_sqp=2)
    ref = jax.jit(
        jax.vmap(lambda s, i, d: solve_single(spec, S, s, i, d))
    )(scen, init, duals)
    out = fused_solve(spec, S, scen, init, duals, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out.primal.xs), np.asarray(ref.primal.xs), atol=2e-4,
        err_msg=f"spec={spec}",
    )
    assert np.array_equal(np.asarray(out.converged), np.asarray(ref.converged))


def test_fused_nonuniform_dt_matches_xla():
    """Non-uniform per-stage-dt grid through the kernel: ddt_k as a third
    control column (3x3 Quu inverse), per-interval dt boxes as stage
    inequalities, cumulative obstacle prediction times, per-stage trust
    caps — the last transcription family to join kernel scope."""
    spec, scen, init, duals = _setup(N=8, M=3, batch=12, key=61)
    spec = dataclasses.replace(spec, nonuniform_dt=True)
    assert fused_supported(spec)
    init = initial_primal(spec, scen)
    # seed a genuinely non-uniform grid so every per-stage-dt code path
    # (cumulative prediction times, per-stage trust caps, stage dt boxes)
    # carries distinct values
    init = dataclasses.replace(
        init,
        dt=jnp.broadcast_to(
            jnp.linspace(0.22, 0.38, spec.N, dtype=jnp.float32), (12, spec.N)
        ),
    )
    duals = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (12,) + a.shape),
        init_duals(spec, WARM, dtype=jnp.float32),
    )
    out, ref = _assert_solve_match(spec, scen, init, duals, atol=WIDE_ATOL,
                                   dual_atol=0.1, dual_rtol=0.08)
    assert out.primal.dt.shape == (12, spec.N)
    # the per-stage dt must actually vary across stages
    spread = np.asarray(out.primal.dt).max(axis=-1) - np.asarray(out.primal.dt).min(axis=-1)
    assert spread.max() > 1e-3


def test_fused_nonuniform_trapezoidal_quadratic_matches_xla():
    """Non-uniform grid + trapezoidal integral quadratic objective: the
    ½(dt_{k-1}+dt_k)·lx_k stage carries the ddt_prev coupling row."""
    from mpc_local_planner_tpu.benchmarks import config2_diffdrive_obstacles

    spec = dataclasses.replace(
        config2_diffdrive_obstacles(N=8, obstacle_cap=3),
        integral_form=True,
        cost_integration="trapezoidal",
        hybrid_time_weight=0.4,
        variable_dt=True,
        nonuniform_dt=True,
        dt_min=1e-3,
        dt_max=0.5,
    )
    assert fused_supported(spec)
    scen, init, duals = _setup_for(spec, batch=10, key=63)
    _assert_solve_match(spec, scen, init, duals, atol=WIDE_ATOL,
                        dual_atol=0.1, dual_rtol=0.08)


def test_fused_far_goal_terminal_residual_not_wrapped():
    """Round-3 review fix: the terminal residual must wrap ONLY θ
    (se2_boxminus). Wrapping x/y folded a >π-meter goal error toward zero,
    falsely reporting terminal feasibility. Solve with a far goal (x error
    > π possible mid-solve) and require kernel/XLA agreement plus an honest
    eq_norm."""
    spec, scen, init, duals = _setup(N=8, M=0, batch=6, key=71)
    # warm state aims at the ORIGINAL goal; the goal then jumps 5 m away, so
    # x_N sits > pi meters from the new goal — the old wrap folded that
    # terminal error to |5 - 2pi| ~ 1.28 instead of ~5
    init = initial_primal(spec, scen)
    scen = dataclasses.replace(
        scen, xf=scen.xf.at[:, 0].set(scen.xf[:, 0] + 5.0)
    )
    S = dataclasses.replace(WARM, n_al=1, n_sqp=1)
    ref = jax.jit(
        jax.vmap(lambda s, i, d: solve_single(spec, S, s, i, d))
    )(scen, init, duals)
    out = fused_solve(spec, S, scen, init, duals, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out.eq_norm), np.asarray(ref.eq_norm), atol=1e-4, rtol=1e-4
    )
    assert np.array_equal(np.asarray(out.converged), np.asarray(ref.converged))
    # the terminal x-error is ~4-5 m after one step; wrapped it would be ~1.3
    assert np.asarray(out.eq_norm).min() > 3.0


def test_fused_sublane8_tile_geometry_smoke():
    """The SHIPPING tile geometry (SUBLANES=8) in interpret mode.

    conftest pins MPC_FUSED_SUBLANES=2 for cheap interpret tests, so the
    8-sublane layout that actually ships was previously guarded only by the
    loose hardware gate (VERDICT r3 weak #6) — a tile-geometry-dependent
    indexing bug below those tolerances would have passed both. SUBLANES is
    bound at module import, so this runs an equivalence check in a
    subprocess with MPC_FUSED_SUBLANES=8 (small N/budget to keep the padded
    1024-lane interpret cost sane).
    """
    import os
    import subprocess
    import sys

    script = r"""
import os
import jax
jax.config.update("jax_platforms", "cpu")
import dataclasses
import jax.numpy as jnp
import numpy as np
from mpc_local_planner_tpu.benchmarks import config3_carlike_min_time, random_ensemble
from mpc_local_planner_tpu.ocp.grid import initial_primal
from mpc_local_planner_tpu.ops.fused_al_sqp_pallas import SUBLANES, fused_solve
from mpc_local_planner_tpu.solvers.al_sqp import SolverSettings, init_duals, solve_single

assert SUBLANES == 8, SUBLANES
S = SolverSettings(n_al=1, n_sqp=2, rho0=120.0, reg0=1.0, tol_eq=1e-3,
                   tol_ineq=1e-3, alphas=(1.0, 0.5, 0.22, 0.03))
spec = config3_carlike_min_time(N=6, obstacle_cap=2)
batch = 20
scen = random_ensemble(spec, batch, jax.random.PRNGKey(3))
scen = jax.tree_util.tree_map(
    lambda a: a.astype(jnp.float32) if a.dtype == jnp.float64 else a, scen)
init = initial_primal(spec, scen)
duals = jax.tree_util.tree_map(
    lambda a: jnp.broadcast_to(a, (batch,) + a.shape),
    init_duals(spec, S, dtype=jnp.float32))
ref = jax.jit(jax.vmap(lambda s, i, d: solve_single(spec, S, s, i, d)))(scen, init, duals)
out = fused_solve(spec, S, scen, init, duals, interpret=True)
np.testing.assert_allclose(np.asarray(out.primal.xs), np.asarray(ref.primal.xs), atol=5e-5)
np.testing.assert_allclose(np.asarray(out.primal.us), np.asarray(ref.primal.us), atol=5e-5)
np.testing.assert_allclose(np.asarray(out.primal.dt), np.asarray(ref.primal.dt), atol=5e-6)
np.testing.assert_allclose(np.asarray(out.eq_norm), np.asarray(ref.eq_norm), atol=1e-5)
assert np.array_equal(np.asarray(out.converged), np.asarray(ref.converged))
print("SUBLANE8_OK")
"""
    env = dict(os.environ)
    env["MPC_FUSED_SUBLANES"] = "8"
    env.pop("JAX_PLATFORMS", None)
    p = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True, text=True, timeout=540, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert p.returncode == 0 and "SUBLANE8_OK" in p.stdout, (
        p.stdout[-2000:], p.stderr[-2000:]
    )
