"""Simulated plant: the closed-loop testing target.

Parity: cbr:plants/simulated_plant.h :: SimulatedPlant — integrates the
system dynamics with a selectable integrator, optional input dead time
(cbr:systems/time_value_buffer.h :: TimeValueBuffer), additive state/output
disturbances, and measurement noise. Functional: ``step(state, u, dt, key)``
returns the new pytree state; a fleet of plants is one vmap.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from mpc_local_planner_tpu.numerics.integrators import integrate


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PlantState:
    x: jax.Array            # (nx,) true state
    u_buffer: jax.Array     # (D, nu) dead-time FIFO (D = dead-time steps)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SimulatedPlant:
    model: object           # dynamics (BaseRobotSE2 or any f(x, u))
    method: str = dataclasses.field(default="rk4", metadata=dict(static=True))
    substeps: int = dataclasses.field(default=1, metadata=dict(static=True))
    dead_time_steps: int = dataclasses.field(default=0, metadata=dict(static=True))
    process_noise_std: float = 0.0
    measurement_noise_std: float = 0.0

    def init_state(self, x0) -> PlantState:
        x0 = jnp.asarray(x0)
        nu = self.model.control_dim
        return PlantState(
            x=x0,
            u_buffer=jnp.zeros(x0.shape[:-1] + (max(self.dead_time_steps, 1), nu), x0.dtype),
        )

    def step(self, state: PlantState, u, dt, key: Optional[jax.Array] = None) -> PlantState:
        """Advance one control interval (parity: SimulatedPlant::control)."""
        if self.dead_time_steps > 0:
            # FIFO: the applied control is the oldest buffered one
            u_eff = state.u_buffer[..., 0, :]
            buf = jnp.concatenate(
                [state.u_buffer[..., 1:, :], u[..., None, :]], axis=-2
            )
        else:
            u_eff = u
            buf = state.u_buffer
        x_new = integrate(
            self.model.f, state.x, u_eff, dt, method=self.method, substeps=self.substeps
        )
        if self.process_noise_std > 0.0 and key is not None:
            x_new = x_new + self.process_noise_std * jax.random.normal(
                key, x_new.shape, x_new.dtype
            )
        return PlantState(x=x_new, u_buffer=buf)

    def output(self, state: PlantState, key: Optional[jax.Array] = None):
        """Measured state (parity: SimulatedPlant::output; full-state output)."""
        y = state.x
        if self.measurement_noise_std > 0.0 and key is not None:
            y = y + self.measurement_noise_std * jax.random.normal(key, y.shape, y.dtype)
        return y
