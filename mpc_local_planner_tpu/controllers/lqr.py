"""LQR state-feedback controller.

Parity: cbr:controllers/lqr_controller.h :: LqrController — linearizes the
system at the reference, solves the (discrete or continuous) algebraic
Riccati equation, applies u = uref − K (x ⊖ xref). The gain is recomputed on
``configure`` (fixed linearization, like the reference's default) and the
Riccati solves are the jit-safe doubling/sign methods from numerics/.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from mpc_local_planner_tpu.core.so2 import se2_boxminus
from mpc_local_planner_tpu.numerics.control_theory import (
    lqr_gain_continuous,
    lqr_gain_discrete,
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LqrController:
    """u = uref − K·(x ⊖ xref). Build with ``make`` (solves the ARE)."""

    K: jax.Array        # (nu, nx)
    xref: jax.Array     # (nx,)
    uref: jax.Array     # (nu,)
    se2_state: bool = dataclasses.field(default=False, metadata=dict(static=True))

    @staticmethod
    def make(
        model,
        xref,
        uref: Optional[jax.Array] = None,
        q_diag: Tuple[float, ...] = (1.0, 1.0, 1.0),
        r_diag: Tuple[float, ...] = (1.0, 1.0),
        dt: Optional[float] = None,
        se2_state: bool = True,
    ) -> "LqrController":
        """Linearize ``model`` at (xref, uref) and solve the ARE.

        dt=None → continuous-time CARE (the reference models are continuous);
        dt given → discretize A, B (Euler) and solve the DARE.
        """
        xref = jnp.asarray(xref, dtype=jnp.float64)
        if uref is None:
            uref = jnp.zeros((model.control_dim,), dtype=xref.dtype)
        uref = jnp.asarray(uref, dtype=xref.dtype)
        A, B = model.linearize(xref, uref)
        Q = jnp.diag(jnp.asarray(q_diag, dtype=xref.dtype))
        R = jnp.diag(jnp.asarray(r_diag, dtype=xref.dtype))
        if dt is None:
            K = lqr_gain_continuous(A, B, Q, R)
        else:
            n = A.shape[-1]
            Ad = jnp.eye(n, dtype=A.dtype) + dt * A
            Bd = dt * B
            K = lqr_gain_discrete(Ad, Bd, Q, R)
        return LqrController(K=K, xref=xref, uref=uref, se2_state=se2_state)

    def control(self, x):
        dx = se2_boxminus(x, self.xref) if self.se2_state else x - self.xref
        return self.uref - jnp.einsum("ij,...j->...i", self.K, dx)
