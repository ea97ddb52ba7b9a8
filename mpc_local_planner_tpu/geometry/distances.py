"""Batched 2D distance primitives.

Parity: the distance kernels behind teb_local_planner ``obstacles.h``
(Obstacle::getMinimumDistance for point/line/polygon) and
``robot_footprint_model.h`` (calculateDistance), which the reference's
``StageInequalitySE2`` evaluates O(N stages x M obstacles) times per solver
iteration — the #2 hot spot (SURVEY.md §4.2).

TPU-first: every primitive is shape-polymorphic over leading batch dims and
AD-safe. Hard min/clip give valid subgradients for the SQP's Gauss-Newton
step; a ``softmin`` helper provides optional smoothing (the reference's
distances are non-smooth; softmin trades exactness for C^1 continuity).
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12


def _safe_norm(d):
    """‖d‖ with a bounded gradient at 0 (plain norm AD yields NaN there —
    and trajectory inits routinely pass exactly through obstacle centers)."""
    return jnp.sqrt(jnp.sum(d * d, axis=-1) + _EPS)


def point_to_point(p, q):
    """|p - q| with batch broadcasting; last dim = 2."""
    return _safe_norm(p - q)


def point_to_segment(p, a, b):
    """Distance from point(s) p to segment(s) [a, b]; all (..., 2)."""
    ab = b - a
    denom = jnp.maximum(jnp.sum(ab * ab, axis=-1), _EPS)
    t = jnp.clip(jnp.sum((p - a) * ab, axis=-1) / denom, 0.0, 1.0)
    closest = a + t[..., None] * ab
    return _safe_norm(p - closest)


def _orient(a, b, c):
    """Signed area orientation of triangle (a, b, c)."""
    return (b[..., 0] - a[..., 0]) * (c[..., 1] - a[..., 1]) - (
        b[..., 1] - a[..., 1]
    ) * (c[..., 0] - a[..., 0])


def segments_intersect(p1, p2, q1, q2):
    """Proper-intersection test for segments [p1,p2] and [q1,q2] (bool)."""
    d1 = _orient(q1, q2, p1)
    d2 = _orient(q1, q2, p2)
    d3 = _orient(p1, p2, q1)
    d4 = _orient(p1, p2, q2)
    return jnp.logical_and(d1 * d2 < 0, d3 * d4 < 0)


def segment_to_segment(p1, p2, q1, q2):
    """Distance between two segments; 0 if they intersect."""
    d = jnp.minimum(
        jnp.minimum(point_to_segment(p1, q1, q2), point_to_segment(p2, q1, q2)),
        jnp.minimum(point_to_segment(q1, p1, p2), point_to_segment(q2, p1, p2)),
    )
    return jnp.where(segments_intersect(p1, p2, q1, q2), 0.0, d)


def _polygon_edges(verts, nv):
    """Edge endpoints (a_i, b_i) of a padded closed polygon.

    verts: (..., V, 2); nv: (...,) active vertex count (>= 3 when active).
    Edge i connects vertex i to vertex (i+1) mod nv; edges i >= nv are padding.
    Returns a: (..., V, 2), b: (..., V, 2), mask: (..., V) bool.
    """
    V = verts.shape[-2]
    idx = jnp.arange(V)
    nv_ = jnp.maximum(nv, 1)
    nxt = jnp.mod(idx + 1, nv_[..., None])
    b = jnp.take_along_axis(verts, nxt[..., None].astype(jnp.int32), axis=-2)
    mask = idx < nv[..., None]
    return verts, b, mask


def point_to_polygon_signed(p, verts, nv):
    """Signed distance from point(s) to a closed polygon boundary.

    Negative inside (even-odd rule), positive outside. p: (..., 2),
    verts: (..., V, 2), nv: (...,). Batch dims broadcast.
    """
    a, b, mask = _polygon_edges(verts, nv)
    d_edges = point_to_segment(p[..., None, :], a, b)  # (..., V)
    d = jnp.min(jnp.where(mask, d_edges, jnp.inf), axis=-1)

    # even-odd crossing count for the inside test
    px, py = p[..., 0], p[..., 1]
    ax, ay = a[..., 0], a[..., 1]
    bx, by = b[..., 0], b[..., 1]
    cond = (ay > py[..., None]) != (by > py[..., None])
    dy = jnp.where(jnp.abs(by - ay) < _EPS, _EPS, by - ay)
    x_int = ax + (py[..., None] - ay) * (bx - ax) / dy
    crossing = jnp.logical_and(jnp.logical_and(cond, px[..., None] < x_int), mask)
    inside = jnp.mod(jnp.sum(crossing.astype(jnp.int32), axis=-1), 2) == 1
    return jnp.where(inside, -d, d)


def segment_to_polygon(p1, p2, verts, nv):
    """Distance from segment [p1,p2] to a closed polygon boundary (0 on contact)."""
    a, b, mask = _polygon_edges(verts, nv)
    d_edges = segment_to_segment(p1[..., None, :], p2[..., None, :], a, b)
    d = jnp.min(jnp.where(mask, d_edges, jnp.inf), axis=-1)
    # segment fully inside the polygon touches nothing above; treat inside as 0
    inside = point_to_polygon_signed(p1, verts, nv) < 0
    return jnp.where(inside, 0.0, d)


def polygon_to_polygon(verts_a, nv_a, verts_b, nv_b):
    """Distance between two closed polygon boundaries (0 on contact/overlap).

    Min over (edges of A) x (edges of B) segment distances; if either contains
    the other's first vertex, returns 0. Exact for boundary distance of
    non-intersecting polygons.
    """
    a1, a2, mask_a = _polygon_edges(verts_a, nv_a)
    b1, b2, mask_b = _polygon_edges(verts_b, nv_b)
    d = segment_to_segment(
        a1[..., :, None, :], a2[..., :, None, :], b1[..., None, :, :], b2[..., None, :, :]
    )  # (..., Va, Vb)
    m = jnp.logical_and(mask_a[..., :, None], mask_b[..., None, :])
    dmin = jnp.min(jnp.where(m, d, jnp.inf), axis=(-2, -1))
    a_in_b = point_to_polygon_signed(verts_a[..., 0, :], verts_b, nv_b) < 0
    b_in_a = point_to_polygon_signed(verts_b[..., 0, :], verts_a, nv_a) < 0
    return jnp.where(jnp.logical_or(a_in_b, b_in_a), 0.0, dmin)


def softmin(values, mask, tau: float):
    """Smooth masked minimum: -tau * logsumexp(-v / tau). tau -> 0 gives min."""
    v = jnp.where(mask, values, jnp.inf)
    vmin = jnp.min(v, axis=-1, keepdims=True)
    w = jnp.where(mask, jnp.exp(-(values - vmin) / tau), 0.0)
    return (vmin[..., 0] - tau * jnp.log(jnp.maximum(jnp.sum(w, axis=-1), _EPS)))
