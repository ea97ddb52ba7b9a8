"""Closed-loop control task: plant + controller simulation with recording.

Parity: cbr:tasks/closed_loop_control_task.h ::
ClosedLoopControlTask::performTask — loop { plant.output → controller.step →
plant.control } while recording x/u TimeSeries signals and timing stats
(SURVEY.md §4.5). This is the framework's benchmark/simulation harness, the
"fake backend" analog for controller testing (SURVEY.md §5).

TPU-first: the whole closed loop over T cycles runs host-side around the
jitted controller (the controller keeps device state); the generic
functional variant ``run_feedback_loop`` scans a pure controller law over
the horizon fully on device.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mpc_local_planner_tpu.core.time_series import TimeSeries, TimeSeriesSE2
from mpc_local_planner_tpu.plants.simulated_plant import SimulatedPlant


@dataclasses.dataclass
class ClosedLoopLog:
    """Recorded signals (parity: corbo TimeSeries signals + cpu_time stats)."""

    states: TimeSeriesSE2
    controls: TimeSeries
    solve_ms: np.ndarray
    goal_reached: bool


class ClosedLoopControlTask:
    """MPC controller + simulated plant closed loop."""

    def __init__(self, controller, plant: SimulatedPlant, sim_dt: float):
        self.controller = controller
        self.plant = plant
        self.sim_dt = sim_dt

    def perform(
        self,
        x0,
        goal,
        n_cycles: int = 60,
        key: Optional[jax.Array] = None,
        scenario_fn: Optional[Callable] = None,
    ) -> ClosedLoopLog:
        """Run until the goal test passes or n_cycles elapse."""
        from mpc_local_planner_tpu.geometry.obstacles import ObstacleSet
        from mpc_local_planner_tpu.ocp.spec import Scenario

        spec = self.controller.spec
        state = self.plant.init_state(jnp.asarray(x0, dtype=jnp.float32))
        goal = jnp.asarray(goal, dtype=jnp.float32)
        xs, us, times_ms = [np.asarray(state.x)], [], []
        reached = False
        for cycle in range(n_cycles):
            y = self.plant.output(state)
            if scenario_fn is not None:
                scen = scenario_fn(y, goal)
            else:
                scen = Scenario(
                    x0=y,
                    xf=goal,
                    obstacles=ObstacleSet.empty(
                        spec.obstacle_cap, 0, 0, 0, dtype=jnp.float32
                    ),
                    via_points=jnp.zeros((spec.via_cap, 3), jnp.float32),
                    via_mask=jnp.zeros((spec.via_cap,), bool),
                    u_prev=jnp.asarray(us[-1], dtype=jnp.float32)
                    if us
                    else jnp.zeros((spec.nu,), jnp.float32),
                )
            t0 = time.perf_counter()
            res = self.controller.step(scen)
            u0 = np.asarray(res.u0)  # host fetch = solve complete
            times_ms.append((time.perf_counter() - t0) * 1e3)
            sk = None if key is None else jax.random.fold_in(key, cycle)
            state = self.plant.step(state, jnp.asarray(u0), self.sim_dt, key=sk)
            xs.append(np.asarray(state.x))
            us.append(u0)
            if self.controller.is_goal_reached(state.x, goal):
                reached = True
                break
        t = np.arange(len(xs)) * self.sim_dt
        return ClosedLoopLog(
            states=TimeSeriesSE2(times=jnp.asarray(t), values=jnp.asarray(np.stack(xs))),
            controls=TimeSeries(
                times=jnp.asarray(t[:-1]), values=jnp.asarray(np.stack(us))
            )
            if us
            else TimeSeries(times=jnp.zeros((0,)), values=jnp.zeros((0, spec.nu))),
            solve_ms=np.asarray(times_ms),
            goal_reached=reached,
        )


def run_feedback_loop(control_law, plant: SimulatedPlant, x0, dt, n_cycles: int):
    """Fully-on-device closed loop for pure control laws (LQR/PID/state fb).

    control_law: x → u. Returns (xs (T+1, nx), us (T, nu)); jit/vmap-safe —
    a batch of loops is one vmap over x0.
    """
    state0 = plant.init_state(jnp.asarray(x0))

    def body(state, _):
        u = control_law(plant.output(state))
        new = plant.step(state, u, dt)
        return new, (new.x, u)

    _, (xs, us) = jax.lax.scan(body, state0, None, length=n_cycles)
    xs = jnp.concatenate([state0.x[None], xs], axis=0)
    return xs, us
