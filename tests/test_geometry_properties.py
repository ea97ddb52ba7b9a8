"""Randomized property checks for the SE(2) algebra and distance kernels.

(Poor-man's property-based testing — fixed seeds, many samples — per the
verification roadmap; no hypothesis dependency in this image.)
"""

import jax
import jax.numpy as jnp
import numpy as np

from mpc_local_planner_tpu.core.so2 import (
    angle_diff,
    normalize_angle,
    se2_boxminus,
    se2_boxplus,
)
from mpc_local_planner_tpu.geometry.distances import (
    point_to_polygon_signed,
    point_to_segment,
    segment_to_segment,
)

RNG = np.random.default_rng(42)


def test_boxplus_boxminus_inverse_property():
    x = jnp.asarray(RNG.normal(size=(256, 3)) * 3)
    d = jnp.asarray(RNG.normal(size=(256, 3)))
    # (x ⊞ d) ⊖ x == wrapped d
    r = se2_boxminus(se2_boxplus(x, d), x)
    expect = d.at[..., 2].set(normalize_angle(d[..., 2]))
    np.testing.assert_allclose(np.asarray(r), np.asarray(expect), atol=1e-9)


def test_angle_diff_antisymmetry_and_range():
    a = jnp.asarray(RNG.uniform(-10, 10, size=512))
    b = jnp.asarray(RNG.uniform(-10, 10, size=512))
    d1 = np.asarray(angle_diff(a, b))
    d2 = np.asarray(angle_diff(b, a))
    assert np.all(d1 >= -np.pi) and np.all(d1 < np.pi)
    # antisymmetric up to the ±π seam
    wrap = np.isclose(np.abs(d1), np.pi, atol=1e-9)
    np.testing.assert_allclose(d1[~wrap], -d2[~wrap], atol=1e-9)


def test_point_to_segment_brute_force():
    p = RNG.normal(size=(128, 2))
    a = RNG.normal(size=(128, 2))
    b = RNG.normal(size=(128, 2))
    d = np.asarray(point_to_segment(jnp.asarray(p), jnp.asarray(a), jnp.asarray(b)))
    # brute force via dense sampling of the segment
    ts = np.linspace(0, 1, 2001)[None, :, None]
    pts = a[:, None, :] * (1 - ts) + b[:, None, :] * ts
    d_brute = np.min(np.linalg.norm(pts - p[:, None, :], axis=2), axis=1)
    np.testing.assert_allclose(d, d_brute, atol=2e-3)


def test_segment_to_segment_symmetry_and_zero_on_crossing():
    p1 = RNG.normal(size=(128, 2))
    p2 = RNG.normal(size=(128, 2))
    q1 = RNG.normal(size=(128, 2))
    q2 = RNG.normal(size=(128, 2))
    d_ab = np.asarray(segment_to_segment(*map(jnp.asarray, (p1, p2, q1, q2))))
    d_ba = np.asarray(segment_to_segment(*map(jnp.asarray, (q1, q2, p1, p2))))
    np.testing.assert_allclose(d_ab, d_ba, atol=1e-9)
    # explicit crossing → 0
    z = segment_to_segment(
        jnp.array([-1.0, 0.0]), jnp.array([1.0, 0.0]),
        jnp.array([0.0, -1.0]), jnp.array([0.0, 1.0]),
    )
    assert float(z) == 0.0


def test_polygon_signed_distance_sign_and_magnitude():
    # regular polygon; inside points negative, outside positive, |d| matches
    # distance to the nearest edge sampled densely
    n = 7
    ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
    verts = np.stack([np.cos(ang), np.sin(ang)], axis=1)
    vj = jnp.asarray(verts)
    nv = jnp.asarray(n, jnp.int32)
    pts = RNG.uniform(-2, 2, size=(256, 2))
    d = np.asarray(
        jax.vmap(lambda p: point_to_polygon_signed(p, vj, nv))(jnp.asarray(pts))
    )
    # brute force: sample all edges densely
    ts = np.linspace(0, 1, 801)
    edges = [(verts[i], verts[(i + 1) % n]) for i in range(n)]
    samp = np.concatenate([a[None] * (1 - ts[:, None]) + b[None] * ts[:, None] for a, b in edges])
    d_brute = np.min(np.linalg.norm(samp[None] - pts[:, None], axis=2), axis=1)
    # inside test via matplotlib-free winding (regular polygon → radius test
    # is not exact; use ray casting from numpy for verification)
    from matplotlib.path import Path

    inside = Path(verts).contains_points(pts)
    np.testing.assert_allclose(np.abs(d), d_brute, atol=3e-3)
    assert np.all((d < 0) == inside)
