"""Approximate-value comparison helpers.

Parity: cbr:core/value_comparison.h — approx equality/zero tests with
absolute and relative tolerances, used throughout the reference's tests and
guards. Shape-polymorphic jnp implementations.
"""

from __future__ import annotations

import jax.numpy as jnp


def approx_equal(a, b, atol: float = 1e-6, rtol: float = 0.0):
    """|a − b| ≤ atol + rtol·|b| elementwise (parity: approx_equal)."""
    return jnp.abs(a - b) <= atol + rtol * jnp.abs(b)


def approx_zero(a, atol: float = 1e-6):
    return jnp.abs(a) <= atol


def essentially_equal(a, b, rtol: float = 1e-6):
    """Knuth-style relative comparison (parity: essentially_equal)."""
    a, b = jnp.asarray(a), jnp.asarray(b)
    return jnp.abs(a - b) <= rtol * jnp.minimum(jnp.abs(a), jnp.abs(b))


def all_close(tree_a, tree_b, atol: float = 1e-6) -> bool:
    """Pytree-wide closeness (host-side convenience)."""
    import jax

    leaves = jax.tree_util.tree_map(
        lambda x, y: bool(jnp.all(approx_equal(x, y, atol))), tree_a, tree_b
    )
    return all(jax.tree_util.tree_leaves(leaves))
