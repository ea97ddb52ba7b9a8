"""Static state-feedback controller.

Parity: cbr:controllers/simple_state_controller.h :: SimpleStateController —
u = uref − K (x − xref) with a user-provided constant gain matrix (the
reference's building block for hand-tuned feedback).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from mpc_local_planner_tpu.core.so2 import se2_boxminus


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SimpleStateController:
    K: jax.Array
    xref: jax.Array
    uref: jax.Array
    se2_state: bool = dataclasses.field(default=False, metadata=dict(static=True))

    def control(self, x):
        dx = se2_boxminus(x, self.xref) if self.se2_state else x - self.xref
        return self.uref - jnp.einsum("ij,...j->...i", self.K, dx)
