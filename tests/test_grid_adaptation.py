"""Grid adaptation (variable horizon N).

Parity: mpc_local_planner/optimal_control/finite_differences_variable_grid_se2.h
:: FiniteDifferencesVariableGridSE2 — time-based single-step grid adaptation
(grow/shrink N by one stage when the optimized dt leaves the hysteresis band
around dt_ref, bounded by min/max_grid_size), with the warm start carried onto
the resized grid.

TPU-first validation: each N is its own compiled fixed-shape program; the
Controller hops between them host-side while SE(2)-resampling primal+duals.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from mpc_local_planner_tpu.geometry.obstacles import ObstacleSet
from mpc_local_planner_tpu.ocp.grid import (
    Primal,
    adapt_grid_size,
    resize_duals,
    resize_primal,
)
from mpc_local_planner_tpu.ocp.spec import Scenario
from mpc_local_planner_tpu.planner.config import load_config
from mpc_local_planner_tpu.planner.controller import Controller
from mpc_local_planner_tpu.solvers.al_sqp import SolverSettings, init_duals

MIN_TIME_ADAPT_YAML = """
controller:
  xy_goal_tolerance: 0.15
  yaw_goal_tolerance: 0.25
robot:
  type: unicycle
  unicycle:
    max_vel_x: 0.4
    max_vel_x_backwards: 0.2
    max_vel_theta: 0.6
grid:
  grid_size_ref: 20
  dt_ref: 0.3
  xf_fixed: [true, true, true]
  collocation_method: forward_differences
  variable_grid:
    enable: true
    min_dt: 0.001
    max_dt: 10.0
    grid_adaptation:
      enable: true
      max_grid_size: 30
      min_grid_size: 5
      dt_hyst_ratio: 0.1
planning:
  objective:
    type: minimum_time
collision:
  min_obstacle_dist: 0.2
  obstacle_capacity: 0
solver:
  iterations: 8
  inner_iterations: 10
footprint_model:
  type: circular
  radius: 0.2
"""


# --------------------------------------------------------------------------- #
# decision rule
# --------------------------------------------------------------------------- #
def test_adapt_decision_hysteresis_and_bounds():
    kw = dict(dt_ref=0.3, dt_hyst_ratio=0.1, min_grid_size=5, max_grid_size=30)
    # inside the band: no change
    assert adapt_grid_size(0.30, 20, **kw) == 20
    assert adapt_grid_size(0.32, 20, **kw) == 20
    assert adapt_grid_size(0.28, 20, **kw) == 20
    # above band: grow; below band: shrink — single step only
    assert adapt_grid_size(0.40, 20, **kw) == 21
    assert adapt_grid_size(0.20, 20, **kw) == 19
    assert adapt_grid_size(5.00, 20, **kw) == 21
    # saturates at the bounds
    assert adapt_grid_size(0.40, 30, **kw) == 30
    assert adapt_grid_size(0.20, 5, **kw) == 5


# --------------------------------------------------------------------------- #
# primal/dual resampling
# --------------------------------------------------------------------------- #
def _line_primal(N, dt=0.4):
    """Straight-line SE(2) path with a linear angle ramp."""
    t = jnp.linspace(0.0, 1.0, N + 1)
    xs = jnp.stack([2.0 * t, -1.0 * t, 0.5 * t], axis=-1)
    us = jnp.stack([jnp.full((N,), 0.3), jnp.linspace(0.0, 0.2, N)], axis=-1)
    return Primal(xs=xs, us=us, dt=jnp.asarray(dt))


def test_resize_primal_preserves_time_and_endpoints():
    for new_N in (13, 27):
        p = _line_primal(20)
        q = resize_primal(p, new_N)
        assert q.xs.shape == (new_N + 1, 3) and q.us.shape == (new_N, 2)
        # total horizon time preserved: N*dt invariant
        np.testing.assert_allclose(float(q.dt * new_N), float(p.dt * 20), rtol=1e-6)
        # endpoints exact
        np.testing.assert_allclose(np.asarray(q.xs[0]), np.asarray(p.xs[0]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(q.xs[-1]), np.asarray(p.xs[-1]), atol=1e-6)
        # interior: linear path resamples exactly onto the linear ramp
        t = np.linspace(0.0, 1.0, new_N + 1)
        expect = np.stack([2.0 * t, -1.0 * t, 0.5 * t], axis=-1)
        np.testing.assert_allclose(np.asarray(q.xs), expect, atol=1e-5)


def test_resize_primal_wraps_angles_shortest_arc():
    # path crossing the ±π seam: interpolation must go the short way
    N = 4
    th = jnp.array([3.0, 3.1, -3.1, -3.0, -2.9])  # continuous modulo 2π
    xs = jnp.stack([jnp.zeros(N + 1), jnp.zeros(N + 1), th], axis=-1)
    us = jnp.zeros((N, 2))
    q = resize_primal(Primal(xs=xs, us=us, dt=jnp.asarray(0.3)), 8)
    dth = np.diff(np.unwrap(np.asarray(q.xs[:, 2])))
    # monotone increase through the seam, no 2π jumps
    assert np.all(dth > 0.0) and np.all(dth < 0.5)


def test_resize_duals_shapes_and_carryover():
    from mpc_local_planner_tpu.benchmarks import config3_carlike_min_time

    spec = config3_carlike_min_time(N=10, obstacle_cap=3)
    st = SolverSettings()
    d = init_duals(spec, st)
    d = dataclasses.replace(d, lam_term=jnp.array([1.0, 2.0, 3.0]))
    r = resize_duals(d, 7)
    assert r.lam_def.shape == (7, 3)
    assert r.mu_obs.shape == (7, 3)
    assert r.mu_rate.shape == (7, 2 * spec.nu)
    assert r.mu_box.shape == (7, 2 * spec.nu)
    # scalars / terminal multipliers carry over untouched
    np.testing.assert_allclose(np.asarray(r.lam_term), [1.0, 2.0, 3.0])
    assert float(r.rho) == float(d.rho)


# --------------------------------------------------------------------------- #
# controller integration
# --------------------------------------------------------------------------- #
def test_config_validation_rejects_bad_combinations():
    import pytest

    cfg = load_config(MIN_TIME_ADAPT_YAML)
    with pytest.raises(ValueError, match="single-robot"):
        Controller(cfg, batch=4)
    bad = MIN_TIME_ADAPT_YAML.replace("enable: true\n    min_dt", "enable: false\n    min_dt")
    with pytest.raises(ValueError, match="variable_grid"):
        Controller(load_config(bad))
    bad2 = MIN_TIME_ADAPT_YAML.replace("max_grid_size: 30", "max_grid_size: 10")
    with pytest.raises(ValueError, match="outside grid_adaptation bounds"):
        Controller(load_config(bad2))


def test_closed_loop_horizon_shrinks_toward_goal():
    """As the min-time robot closes on the goal, T* shrinks; adaptation sheds
    stages to keep dt near dt_ref instead of letting dt collapse (the
    reference's shrinking-horizon behavior)."""
    cfg = load_config(MIN_TIME_ADAPT_YAML)
    ctrl = Controller(cfg, dtype=jnp.float32)
    spec = ctrl.spec
    x = jnp.array([0.0, 0.0, 0.0], dtype=jnp.float32)
    goal = jnp.array([1.5, 0.0, 0.0], dtype=jnp.float32)
    sim_dt = 0.3
    ns = [ctrl._spec.N]
    dts = []
    reached = False
    for _cycle in range(60):
        scen = Scenario.goal_only(x, goal, nu=spec.nu, via_cap=0, dtype=jnp.float32)
        scen = dataclasses.replace(
            scen, obstacles=ObstacleSet.empty(0, 0, 0, 0, dtype=jnp.float32)
        )
        res = ctrl.step(scen)
        ns.append(ctrl._spec.N)
        dts.append(float(res.solve.primal.dt))
        x = x + sim_dt * spec.model.f(x, res.u0)
        if ctrl.is_goal_reached(x, goal):
            reached = True
            break
    assert reached, np.asarray(x)
    # the horizon visibly stepped down from grid_size_ref toward min_grid_size
    assert min(ns) <= 10, ns
    assert ns == sorted(ns, reverse=True), ns  # shrinking-horizon run: N never grows
    # decision-rule fidelity in closed loop: every shrink step was triggered
    # by the previous cycle's dt* being below the hysteresis band (and the
    # single-step rule never sheds more than one stage per cycle)
    g = cfg.grid
    lo = g.dt_ref * (1.0 - g.grid_adaptation_dt_hyst_ratio)
    for k in range(1, len(ns) - 1):
        step = ns[k] - ns[k + 1]
        assert step in (0, 1), ns
        if step == 1:
            assert dts[k - 1] < lo, (k, dts, ns)


def test_adapt_decision_aggressive_estimate():
    kw = dict(dt_ref=0.3, dt_hyst_ratio=0.1, min_grid_size=5, max_grid_size=30,
              mode="time_based_aggressive_estimate")
    # inside the band: no change
    assert adapt_grid_size(0.31, 20, **kw) == 20
    # outside: jump straight to N* = round(N·dt/dt_ref), clamped
    assert adapt_grid_size(0.60, 20, **kw) == 30  # N* = 40 → clamp 30
    assert adapt_grid_size(0.45, 20, **kw) == 30
    assert adapt_grid_size(0.15, 20, **kw) == 10
    assert adapt_grid_size(0.015, 20, **kw) == 5  # N* = 1 → clamp 5


def test_adapt_nonuniform_merge_and_split():
    """RedundantControls edits (parity: cbr non_uniform_finite_differences_
    variable_grid.h): a redundant interval merges, a control jump splits."""
    from mpc_local_planner_tpu.ocp.grid import adapt_grid_nonuniform

    box = ((-0.2, -0.6), (0.4, 0.6))
    N = 6
    xs = jnp.stack(
        [jnp.linspace(0.0, 1.8, N + 1), jnp.zeros(N + 1), jnp.zeros(N + 1)], axis=-1
    )

    def duals_for(n):
        from mpc_local_planner_tpu.benchmarks import config3_carlike_min_time

        return init_duals(config3_carlike_min_time(N=n, obstacle_cap=3),
                          SolverSettings())

    # controls identical across interval 2-3 → merge stage 3 away
    us = jnp.array([[0.4, 0.1], [0.3, -0.1], [0.2, 0.0], [0.2, 0.0],
                    [0.1, 0.2], [0.0, 0.3]])
    dt = jnp.full((N,), 0.3)
    p, d, n2 = adapt_grid_nonuniform(
        Primal(xs=xs, us=us, dt=dt), duals_for(N), control_box=box,
        epsilon=0.05, dt_max=10.0, min_grid_size=2, max_grid_size=10,
    )
    assert n2 == N - 1
    assert p.xs.shape == (N, 3) and p.us.shape == (N - 1, 2) and p.dt.shape == (N - 1,)
    np.testing.assert_allclose(float(jnp.sum(p.dt)), float(jnp.sum(dt)), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(p.dt[2]), 0.6, rtol=1e-6)  # merged pair
    assert d.lam_def.shape == (N - 1, 3)

    # all controls far apart except a big jump at interval 0 → split it
    us2 = jnp.array([[0.4, 0.5], [-0.2, -0.5], [0.0, 0.0], [0.2, 0.25],
                     [0.4, 0.5], [0.2, 0.25]])
    p2, d2, n3 = adapt_grid_nonuniform(
        Primal(xs=xs, us=us2, dt=dt), duals_for(N), control_box=box,
        epsilon=0.05, dt_max=10.0, min_grid_size=2, max_grid_size=10,
    )
    assert n3 == N + 1
    assert p2.xs.shape == (N + 2, 3) and p2.dt.shape == (N + 1,)
    np.testing.assert_allclose(float(jnp.sum(p2.dt)), float(jnp.sum(dt)), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(p2.dt[:2]), [0.15, 0.15], rtol=1e-6)
    # the inserted state bisects, the inserted control duplicates u_0
    np.testing.assert_allclose(np.asarray(p2.xs[1]), [0.15, 0.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(p2.us[1]), np.asarray(us2[0]), atol=1e-6)
    # no edit when min interval change exceeds eps and max below 2*eps
    _, _, n4 = adapt_grid_nonuniform(
        Primal(xs=xs, us=us2, dt=dt), duals_for(N), control_box=box,
        epsilon=0.9, dt_max=10.0, min_grid_size=6, max_grid_size=6,
    )
    assert n4 == N


def test_mode_validation_rejects_bad_combinations():
    import pytest

    bad = MIN_TIME_ADAPT_YAML.replace(
        "dt_hyst_ratio: 0.1", "dt_hyst_ratio: 0.1\n      mode: redundant_controls"
    )
    with pytest.raises(ValueError, match="non_uniform_fd_grid"):
        Controller(load_config(bad))
    with pytest.raises(ValueError, match="unknown grid_adaptation_mode"):
        load_config(MIN_TIME_ADAPT_YAML.replace(
            "dt_hyst_ratio: 0.1", "dt_hyst_ratio: 0.1\n      mode: nope"
        ))


def test_closed_loop_nonuniform_redundant_controls():
    """Non-uniform grid + redundant_controls adaptation drives a min-time
    closed loop: the grid sheds redundant stages (N shrinks from
    grid_size_ref) while the robot still reaches the goal."""
    yaml = MIN_TIME_ADAPT_YAML.replace(
        "grid:\n  grid_size_ref: 20",
        "grid:\n  type: non_uniform_fd_grid\n  grid_size_ref: 12",
    ).replace(
        "dt_hyst_ratio: 0.1",
        "dt_hyst_ratio: 0.1\n      mode: redundant_controls\n"
        "      redundant_controls_epsilon: 0.05",
    ).replace(
        "solver:\n  iterations: 8",
        "solver:\n  type: lsq_lm\n  iterations: 8",
    )
    cfg = load_config(yaml)
    assert cfg.grid.grid_adaptation_mode == "redundant_controls"
    ctrl = Controller(cfg, dtype=jnp.float32)
    spec = ctrl.spec
    assert spec.nonuniform_dt
    x = jnp.array([0.0, 0.0, 0.0], dtype=jnp.float32)
    goal = jnp.array([1.2, 0.0, 0.0], dtype=jnp.float32)
    ns = [ctrl._spec.N]
    reached = False
    for _cycle in range(50):
        scen = Scenario.goal_only(x, goal, nu=spec.nu, via_cap=0, dtype=jnp.float32)
        scen = dataclasses.replace(
            scen, obstacles=ObstacleSet.empty(0, 0, 0, 0, dtype=jnp.float32)
        )
        res = ctrl.step(scen)
        ns.append(ctrl._spec.N)
        x = x + 0.3 * spec.model.f(x, res.u0)
        if ctrl.is_goal_reached(x, goal):
            reached = True
            break
    assert reached, np.asarray(x)
    # a straight-line cruise is mostly redundant controls: stages were shed
    assert min(ns) < 12, ns
    # structural edits are single-step
    assert all(abs(a - b) <= 1 for a, b in zip(ns, ns[1:])), ns


def test_precompile_ladder_populates_program_cache():
    """precompile() builds every N's (cold + warm) program up front; the
    closed loop then never triggers a mid-run compile (cache keys stable)."""
    yaml = MIN_TIME_ADAPT_YAML.replace("max_grid_size: 30", "max_grid_size: 22")\
                              .replace("min_grid_size: 5", "min_grid_size: 18")
    cfg = load_config(yaml)
    ctrl = Controller(cfg, dtype=jnp.float32)
    scen = Scenario.goal_only(
        jnp.zeros(3, jnp.float32), jnp.array([1.0, 0.0, 0.0], jnp.float32),
        nu=ctrl.spec.nu, via_cap=0, dtype=jnp.float32,
    )
    scen = dataclasses.replace(
        scen, obstacles=ObstacleSet.empty(0, 0, 0, 0, dtype=jnp.float32)
    )
    n_programs = ctrl.precompile(scen)
    assert n_programs == (22 - 18 + 1) * 2  # cold + warm per N
    keys = set(ctrl._cache.keys())
    assert (20, False) in keys and (20, True) in keys
    # precompile must not leave warm-start state behind
    assert ctrl._primal is None
    # a real cycle at the reference N reuses the cache (no new keys)
    ctrl.step(scen)
    assert set(ctrl._cache.keys()) == keys


def test_closed_loop_horizon_grows_when_goal_recedes():
    """A goal far beyond what N·dt_max covers forces dt above the band; the
    controller grows N (bounded by max_grid_size)."""
    yaml = MIN_TIME_ADAPT_YAML.replace("grid_size_ref: 20", "grid_size_ref: 6")
    cfg = load_config(yaml)
    ctrl = Controller(cfg, dtype=jnp.float32)
    spec = ctrl.spec
    x = jnp.array([0.0, 0.0, 0.0], dtype=jnp.float32)
    goal = jnp.array([2.5, 0.0, 0.0], dtype=jnp.float32)
    for _cycle in range(6):
        scen = Scenario.goal_only(x, goal, nu=spec.nu, via_cap=0, dtype=jnp.float32)
        scen = dataclasses.replace(
            scen, obstacles=ObstacleSet.empty(0, 0, 0, 0, dtype=jnp.float32)
        )
        res = ctrl.step(scen)
        x = x + 0.3 * spec.model.f(x, res.u0)
    # min-time to 2.5m at 0.4 m/s is ~6.25s → dt* ≈ 1s on a 6-stage grid,
    # far above dt_ref·1.1 → N must have grown
    assert ctrl._spec.N > 6, ctrl._spec.N
