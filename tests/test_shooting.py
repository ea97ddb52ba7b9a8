"""Multiple-shooting transcription (parity: cbr multiple_shooting_grid).

Mirrors the reference's grid tests: shooting defects vanish on an exactly
integrated trajectory, and the shooting OCP solves to the same optimum as
collocation at fine discretization.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mpc_local_planner_tpu.geometry.footprints import PointFootprint
from mpc_local_planner_tpu.numerics.integrators import rollout
from mpc_local_planner_tpu.ocp.collocation import collocation_defects
from mpc_local_planner_tpu.ocp.grid import initial_primal
from mpc_local_planner_tpu.ocp.spec import OcpSpec, Scenario
from mpc_local_planner_tpu.solvers.al_sqp import (
    SolverSettings,
    init_duals,
    solve_single,
)
from mpc_local_planner_tpu.systems.models import RobotLimits, UnicycleModel

LIMITS = RobotLimits(max_vel_x=0.4, max_vel_x_backwards=0.2, max_vel_theta=0.3)


def test_shooting_defect_zero_on_integrated_trajectory():
    model = UnicycleModel()
    us = jnp.array([[0.4, 0.2], [0.3, -0.1], [0.2, 0.3]])
    xs = rollout(model.f, jnp.zeros(3), us, 0.25, method="rk4", substeps=2)
    d = collocation_defects(model, "shooting_rk4_2", xs, us, 0.25)
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-10)
    # a different integrator leaves nonzero defects on the same trajectory
    d2 = collocation_defects(model, "shooting_explicit_euler", xs, us, 0.25)
    assert float(jnp.max(jnp.abs(d2))) > 1e-4


def test_shooting_rk6_rk7_defect_zero_and_golden_solve():
    """shooting_rk6/rk7 grids (parity: cbr IntegratorExplicitRungeKutta{6,7}
    under multiple_shooting_grid): defects vanish on an exactly integrated
    trajectory, and the rk6 shooting OCP solves to the rk4-shooting golden
    within the (tiny) high-order discretization gap."""
    model = UnicycleModel()
    us = jnp.array([[0.4, 0.2], [0.3, -0.1], [0.2, 0.3]])
    for method in ("rk6", "rk7"):
        xs = rollout(model.f, jnp.zeros(3), us, 0.25, method=method)
        d = collocation_defects(model, f"shooting_{method}", xs, us, 0.25)
        np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-10)
    mk = lambda colloc: OcpSpec(  # noqa: E731
        model=UnicycleModel(), footprint=PointFootprint(), N=10,
        collocation=colloc, objective="quadratic_form",
        q_diag=(2.0, 2.0, 2.0), r_diag=(1.0, 1.0), qf_diag=(10.0, 10.0, 10.0),
        dt_ref=0.3, limits=LIMITS,
    )
    scen = Scenario.goal_only(
        x0=jnp.array([0.0, 0.0, 0.0]), xf=jnp.array([1.2, 0.6, 0.0]),
        dtype=jnp.float64,
    )
    settings = SolverSettings(n_al=8, n_sqp=10)
    results = {}
    for colloc in ("shooting_rk6", "shooting_rk4"):
        spec = mk(colloc)
        init = initial_primal(spec, scen)
        duals = init_duals(spec, settings, dtype=jnp.float64)
        r = jax.jit(lambda s, i, d, spec=spec: solve_single(spec, settings, s, i, d))(
            scen, init, duals
        )
        assert bool(r.converged), colloc
        results[colloc] = r
    # both integrators are >=4th order at dt=0.3: optima nearly coincide
    du = np.max(
        np.abs(
            np.asarray(results["shooting_rk6"].primal.us)
            - np.asarray(results["shooting_rk4"].primal.us)
        )
    )
    assert du < 1e-3, du


def test_shooting_ocp_solves_and_matches_collocation():
    mk = lambda colloc: OcpSpec(  # noqa: E731
        model=UnicycleModel(), footprint=PointFootprint(), N=20,
        collocation=colloc, objective="quadratic_form",
        q_diag=(2.0, 2.0, 2.0), r_diag=(1.0, 1.0), qf_diag=(10.0, 10.0, 10.0),
        dt_ref=0.3, limits=LIMITS,
    )
    scen = Scenario.goal_only(
        x0=jnp.array([0.0, 0.0, 0.0]), xf=jnp.array([2.0, 1.0, 0.0]),
        dtype=jnp.float64,
    )
    settings = SolverSettings(n_al=8, n_sqp=10)
    results = {}
    for colloc in ("shooting_rk4", "forward_differences"):
        spec = mk(colloc)
        init = initial_primal(spec, scen)
        duals = init_duals(spec, settings, dtype=jnp.float64)
        r = jax.jit(lambda s, i, d, spec=spec: solve_single(spec, settings, s, i, d))(
            scen, init, duals
        )
        assert bool(r.converged), colloc
        results[colloc] = r
    # same problem family, different transcription: solutions agree to the
    # discretization error of forward Euler vs RK4 at dt=0.3 (~1e-2)
    du = np.max(
        np.abs(
            np.asarray(results["shooting_rk4"].primal.us)
            - np.asarray(results["forward_differences"].primal.us)
        )
    )
    assert du < 0.1, du


def test_shooting_variable_dt_min_time():
    """Variable-dt multiple shooting (parity: cbr
    multiple_shooting_variable_grid): dt is a decision variable on a
    shooting transcription; the min-time optimum matches the FD-collocation
    min-time T* to discretization error."""
    mk = lambda colloc: OcpSpec(  # noqa: E731
        model=UnicycleModel(), footprint=PointFootprint(), N=20,
        collocation=colloc, objective="minimum_time",
        q_diag=(0.0, 0.0, 0.0), r_diag=(0.0, 0.0), qf_diag=(0.0, 0.0, 0.0),
        dt_ref=0.3, dt_min=0.01, dt_max=1.0, variable_dt=True,
        xf_fixed=(True, True, True), limits=LIMITS,
    )
    scen = Scenario.goal_only(
        x0=jnp.array([0.0, 0.0, 0.0]), xf=jnp.array([2.0, 0.0, 0.0]),
        dtype=jnp.float64,
    )
    settings = SolverSettings.for_spec(mk("shooting_rk4"))
    T = {}
    for colloc in ("shooting_rk4", "forward_differences"):
        spec = mk(colloc)
        init = initial_primal(spec, scen)
        duals = init_duals(spec, settings, dtype=jnp.float64)
        r = jax.jit(lambda s, i, d, spec=spec: solve_single(spec, settings, s, i, d))(
            scen, init, duals
        )
        assert bool(r.converged), colloc
        T[colloc] = float(r.primal.dt) * spec.N
    # straight-line 2 m at v_max 0.4 → T* = 5 s
    assert abs(T["shooting_rk4"] - 5.0) < 0.15, T
    assert abs(T["shooting_rk4"] - T["forward_differences"]) < 0.15, T
