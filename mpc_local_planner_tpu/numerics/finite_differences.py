"""Finite-difference derivatives.

Parity: cbr:numerics/finite_differences.h — ForwardDifferences /
CentralDifferences, the reference's *sole* derivative engine (every Jacobian
and Hessian in its whole stack is numeric FD; SURVEY.md §3.2).

In this framework AD (jacfwd/jacrev) is the production derivative path; this
module exists for capability parity and as an independent cross-check of the
AD derivatives in tests (the role reversal of the reference, which had no AD
to check its FD against). jit/vmap-safe, no Python loops over dimensions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def forward_jacobian(f, x, eps: float = 1e-6):
    """J[i, j] = (f(x + eps e_j) − f(x)) / eps via one vmapped sweep."""
    x = jnp.asarray(x)
    f0 = f(x)
    basis = jnp.eye(x.shape[-1], dtype=x.dtype)

    def col(e):
        return (f(x + eps * e) - f0) / eps

    return jnp.moveaxis(jax.vmap(col)(basis), 0, -1)


def central_jacobian(f, x, eps: float = 1e-6):
    """J[i, j] = (f(x + eps e_j) − f(x − eps e_j)) / (2 eps)."""
    x = jnp.asarray(x)
    basis = jnp.eye(x.shape[-1], dtype=x.dtype)

    def col(e):
        return (f(x + eps * e) - f(x - eps * e)) / (2.0 * eps)

    return jnp.moveaxis(jax.vmap(col)(basis), 0, -1)


def central_hessian(f, x, eps: float = 1e-4):
    """Hessian of a scalar f by nested central differences."""
    return central_jacobian(lambda y: central_jacobian(f, y, eps), x, eps)
