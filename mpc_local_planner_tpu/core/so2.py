"""SO(2)/SE(2) math helpers.

Parity: mpc_local_planner ``utils/math_utils.h`` (normalize_theta,
interpolate_angle, average_angles, distance_points2d) and the SE(2)-aware
vertex arithmetic of ``optimal_control/full_discretization_grid_base_se2.h``
(theta-wrapped plus/difference). Everything here is a pure, shape-polymorphic
jnp function: it vectorizes over arbitrary leading batch dimensions and is
safe under jit/vmap/grad (no data-dependent control flow).
"""

from __future__ import annotations

import jax.numpy as jnp

_TWO_PI = 2.0 * jnp.pi


def normalize_angle(theta):
    """Wrap angle(s) to [-pi, pi).

    Uses the mod form rather than atan2(sin, cos): one transcendental-free op,
    derivative exactly 1 away from the wrap point (AD-safe for collocation
    residuals on theta differences).
    """
    return jnp.mod(theta + jnp.pi, _TWO_PI) - jnp.pi


def angle_diff(a, b):
    """Smallest signed difference a - b on SO(2), in [-pi, pi)."""
    return normalize_angle(a - b)


def interpolate_angle(a, b, t):
    """Interpolate from angle a to b along the shortest arc; t in [0, 1]."""
    return normalize_angle(a + t * angle_diff(b, a))


def average_angles(angles, axis=None, weights=None):
    """Circular mean of angles (parity: math_utils.h::average_angles)."""
    s = jnp.sin(angles)
    c = jnp.cos(angles)
    if weights is not None:
        s = s * weights
        c = c * weights
    return jnp.arctan2(jnp.sum(s, axis=axis), jnp.sum(c, axis=axis))


def distance_points2d(p1, p2):
    """Euclidean distance between 2D points (last dim = 2)."""
    return jnp.linalg.norm(p1 - p2, axis=-1)


def rot2d(theta):
    """2x2 rotation matrix(es); theta (...,) -> (..., 2, 2)."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.stack(
        [jnp.stack([c, -s], axis=-1), jnp.stack([s, c], axis=-1)], axis=-2
    )


def se2_boxminus(xa, xb):
    """SE(2)-aware difference xa ⊖ xb for states (..., 3) = (px, py, theta).

    Translation part subtracts; angle part wraps. This is the `plus`/difference
    the reference's SE(2) grid uses for collocation residuals and quadratic
    costs (full_discretization_grid_base_se2.h).
    """
    d = xa - xb
    return _wrap_theta(d)


def _wrap_theta(x):
    """Wrap component 2 of (..., 3) states without a scatter.

    ``x.at[..., 2].set(...)`` lowers to a padded scatter on TPU (the 3-wide
    minor dim tiles to a full 128-lane tile per update); the concatenate form
    is a single fused elementwise pass. Hot: called per line-search candidate.
    """
    return jnp.concatenate(
        [x[..., :2], normalize_angle(x[..., 2:3])], axis=-1
    )


def se2_boxplus(x, delta):
    """SE(2)-aware increment x ⊞ delta with angle wrap on component 2."""
    return _wrap_theta(x + delta)


def se2_interpolate(xa, xb, t):
    """Linear interpolation of SE(2) states with shortest-arc angle blending."""
    t = jnp.asarray(t)[..., None] if jnp.ndim(t) == jnp.ndim(xa) - 1 else t
    d = se2_boxminus(xb, xa)
    return _wrap_theta(xa + t * d)
