"""Dual-mode controller: MPC far from the target, local LQR inside a
terminal region.

Parity: cbr:controllers/dual_mode_controller.h :: DualModeController — the
classic dual-mode MPC scheme (predictive controller outside the terminal
set, linear feedback inside it). The switch is a weighted-norm ball test on
(x ⊖ xref), evaluated per scenario so a batch mixes modes freely.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from mpc_local_planner_tpu.core.so2 import se2_boxminus


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DualModeController:
    """Combine a predictive control result with a terminal LQR law."""

    lqr: object                  # LqrController (shares xref)
    ball_weights: jax.Array      # (nx,)
    ball_radius: float

    def in_terminal_region(self, x):
        dx = se2_boxminus(x, self.lqr.xref)
        return jnp.sum(dx * dx * self.ball_weights, axis=-1) <= self.ball_radius**2

    def select(self, x, u_mpc):
        """Choose LQR control inside the terminal ball, MPC control outside."""
        u_lqr = self.lqr.control(x)
        inside = self.in_terminal_region(x)
        return jnp.where(inside[..., None], u_lqr, u_mpc), inside
