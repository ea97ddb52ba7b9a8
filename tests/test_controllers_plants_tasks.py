"""Controllers / plants / closed-loop tasks (corbo framework parity).

Mirrors the reference's controller/plant test pattern: controller tested
against an integrated model instead of hardware (SURVEY.md §5).
"""

import jax
import jax.numpy as jnp
import numpy as np

from mpc_local_planner_tpu.controllers import (
    DualModeController,
    LqrController,
    PidController,
    SimpleStateController,
)
from mpc_local_planner_tpu.core.signals import SignalRecorder
from mpc_local_planner_tpu.msgs import OptimalControlResult
from mpc_local_planner_tpu.plants.simulated_plant import SimulatedPlant
from mpc_local_planner_tpu.systems.models import UnicycleModel
from mpc_local_planner_tpu.tasks.closed_loop import (
    ClosedLoopControlTask,
    run_feedback_loop,
)


class _DoubleIntegrator:
    """ẋ = (v, u): minimal linear model implementing the dynamics protocol."""

    control_dim = 1
    state_dim = 2

    def f(self, x, u):
        return jnp.stack([x[..., 1], u[..., 0]], axis=-1)

    def linearize(self, x, u):
        return jax.jacfwd(self.f, argnums=0)(x, u), jax.jacfwd(self.f, argnums=1)(x, u)


def test_lqr_regulates_double_integrator():
    model = _DoubleIntegrator()
    xref = jnp.array([0.5, 0.0])
    ctrl = LqrController.make(
        model, xref, jnp.zeros(1), q_diag=(5.0, 1.0), r_diag=(0.5,),
        dt=0.1, se2_state=False,
    )
    plant = SimulatedPlant(model=model, method="rk4")
    x0 = jnp.array([-0.5, 0.3])
    xs, _us = run_feedback_loop(ctrl.control, plant, x0, dt=0.1, n_cycles=120)
    np.testing.assert_allclose(np.asarray(xs[-1]), np.asarray(xref), atol=1e-3)


def test_lqr_continuous_gain_regulates():
    model = _DoubleIntegrator()
    xref = jnp.zeros(2)
    ctrl = LqrController.make(
        model, xref, jnp.zeros(1), q_diag=(2.0, 1.0), r_diag=(1.0,),
        dt=None, se2_state=False,
    )
    plant = SimulatedPlant(model=model, method="rk4")
    xs, _ = run_feedback_loop(ctrl.control, plant, jnp.array([1.0, 0.0]), dt=0.05, n_cycles=300)
    np.testing.assert_allclose(np.asarray(xs[-1]), 0.0, atol=1e-3)


def test_pid_drives_first_order_system():
    pid = PidController.make(kp=2.0, ki=1.0, dim=1)
    state = pid.init_state()
    x = jnp.array([0.0])
    target = jnp.array([1.0])
    dt = 0.05
    for _ in range(200):
        state, u = pid.step(state, target - x, dt)
        x = x + dt * (-x + u)  # ẋ = −x + u
    np.testing.assert_allclose(np.asarray(x), 1.0, atol=1e-2)


def test_simple_state_controller_matches_lqr_form():
    K = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.5]])
    c = SimpleStateController(
        K=K, xref=jnp.zeros(3), uref=jnp.array([0.1, 0.0]), se2_state=True
    )
    u = c.control(jnp.array([0.2, -0.1, 0.3]))
    np.testing.assert_allclose(
        np.asarray(u), [0.1 - 0.2, -(-0.1) - 0.5 * 0.3], atol=1e-6
    )


def test_dual_mode_switches_inside_ball():
    model = UnicycleModel()
    xref = jnp.array([0.0, 0.0, 0.0])
    lqr = LqrController.make(model, xref, jnp.array([0.1, 0.0]), dt=0.1)
    dm = DualModeController(
        lqr=lqr, ball_weights=jnp.ones(3), ball_radius=0.5
    )
    x_in = jnp.array([0.1, 0.1, 0.0])
    x_out = jnp.array([2.0, 0.0, 0.0])
    u_mpc = jnp.array([9.0, 9.0])
    u1, inside1 = dm.select(x_in, u_mpc)
    u2, inside2 = dm.select(x_out, u_mpc)
    assert bool(inside1) and not bool(inside2)
    assert not np.allclose(np.asarray(u1), np.asarray(u_mpc))
    np.testing.assert_allclose(np.asarray(u2), np.asarray(u_mpc))


def test_plant_dead_time_delays_input():
    model = UnicycleModel()
    plant = SimulatedPlant(model=model, dead_time_steps=2, method="explicit_euler")
    s = plant.init_state(jnp.zeros(3))
    u = jnp.array([1.0, 0.0])
    # first two steps apply the zero-initialized buffer → no motion
    s = plant.step(s, u, 0.1)
    s = plant.step(s, u, 0.1)
    np.testing.assert_allclose(np.asarray(s.x), 0.0, atol=1e-12)
    s = plant.step(s, u, 0.1)
    assert float(s.x[0]) > 0.0


def test_closed_loop_task_mpc_reaches_goal_and_records():
    from mpc_local_planner_tpu.planner.config import load_config
    from mpc_local_planner_tpu.planner.controller import Controller

    cfg = load_config(
        {
            "grid": {"grid_size_ref": 10, "dt_ref": 0.3},
            "planning": {
                "objective_type": "quadratic_form",
                "terminal_cost_type": "quadratic",
                "final_state_weights": [10.0, 10.0, 10.0],
            },
            "collision": {"obstacle_capacity": 0},
            "solver": {"iterations": 5, "inner_iterations": 6},
        }
    )
    ctrl = Controller(cfg)
    plant = SimulatedPlant(model=ctrl.spec.model, method="rk4")
    task = ClosedLoopControlTask(ctrl, plant, sim_dt=cfg.grid.dt_ref)
    goal = np.array([1.0, 0.5, float(np.arctan2(0.5, 1.0))])
    log = task.perform(np.zeros(3), goal, n_cycles=50)
    assert log.goal_reached
    assert log.states.values.shape[0] == log.controls.values.shape[0] + 1
    assert log.solve_ms.shape[0] == log.controls.values.shape[0]


def test_signal_recorder_and_ocr_msg_roundtrip():
    rec = SignalRecorder()
    for t in range(5):
        rec.send_measurement("eq_norm", 0.1 * t, t * 1.0)
    ts = rec.series("eq_norm")
    assert ts.values.shape == (5, 1)
    assert rec.names() == ["eq_norm"]

    # OptimalControlResult flat layout round-trip
    class _Res:
        pass

    from mpc_local_planner_tpu.core.time_series import TimeSeries, TimeSeriesSE2

    r = _Res()
    xs = jnp.arange(12.0).reshape(4, 3)
    us = jnp.arange(6.0).reshape(3, 2)
    r.x_seq = TimeSeriesSE2(times=jnp.arange(4.0), values=xs)
    r.u_seq = TimeSeries(times=jnp.arange(3.0), values=us)

    class _S:
        converged = jnp.asarray(True)

    r.solve = _S()
    msg = OptimalControlResult.from_control_result(r, cpu_time=0.01)
    xs2, us2 = msg.unflatten()
    np.testing.assert_allclose(xs2, np.asarray(xs))
    np.testing.assert_allclose(us2, np.asarray(us))
    assert msg.optimal_solution_found
