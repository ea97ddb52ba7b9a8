"""PID controller.

Parity: cbr:controllers/pid_controller.h :: PidController — independent
P/I/D gains per channel on the (reference − state) error; anti-windup by
integral clamping. Functional: state is an explicit pytree threaded through
``step`` (jit/vmap/scan-safe, a batch of PID loops is one vmap).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PidState:
    integral: jax.Array
    prev_error: jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PidController:
    kp: jax.Array
    ki: jax.Array
    kd: jax.Array
    integral_limit: float = 1.0e6

    @staticmethod
    def make(kp, ki=0.0, kd=0.0, dim: int = 1, integral_limit: float = 1.0e6):
        full = lambda v: jnp.full((dim,), float(v)) if jnp.ndim(v) == 0 else jnp.asarray(v)  # noqa: E731
        return PidController(kp=full(kp), ki=full(ki), kd=full(kd), integral_limit=integral_limit)

    def init_state(self, dim: int = None) -> PidState:
        d = self.kp.shape[-1] if dim is None else dim
        return PidState(integral=jnp.zeros((d,)), prev_error=jnp.zeros((d,)))

    def step(self, state: PidState, error, dt) -> Tuple[PidState, jax.Array]:
        integral = jnp.clip(
            state.integral + error * dt, -self.integral_limit, self.integral_limit
        )
        deriv = (error - state.prev_error) / dt
        u = self.kp * error + self.ki * integral + self.kd * deriv
        return PidState(integral=integral, prev_error=error), u
