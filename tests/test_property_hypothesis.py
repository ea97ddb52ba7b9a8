"""Property-based tests (hypothesis) for the SE(2) algebra, distance
kernels, footprint models, and the YAML config loader.

Parity rationale: the reference computes these quantities with exact
branchy C++ (teb_local_planner distance kernels, mpc_local_planner
math_utils.h); our kernels are branch-free/AD-safe JAX, so we pin the
algebraic invariants the reference relies on implicitly — rigid-motion
invariance, metric bounds, wrap semantics — over randomized inputs instead
of porting its case analysis.
"""

import numpy as np
import jax
import jax.numpy as jnp
from hypothesis import given, settings, strategies as st

from mpc_local_planner_tpu.core.so2 import (
    angle_diff,
    normalize_angle,
    se2_boxminus,
    se2_boxplus,
    se2_interpolate,
)
from mpc_local_planner_tpu.geometry.distances import (
    point_to_polygon_signed,
    point_to_segment,
    segment_to_segment,
)
from mpc_local_planner_tpu.geometry.footprints import make_footprint
from mpc_local_planner_tpu.geometry.obstacles import ObstacleSet
from mpc_local_planner_tpu.planner.config import load_config

finite = st.floats(-50.0, 50.0, allow_nan=False, allow_infinity=False)
angle = st.floats(-12.0, 12.0, allow_nan=False, allow_infinity=False)
pt = st.tuples(finite, finite)

COMMON = dict(deadline=None, max_examples=40)


@settings(**COMMON)
@given(theta=angle, k=st.integers(-3, 3))
def test_normalize_angle_range_idempotence_periodicity(theta, k):
    w = float(normalize_angle(jnp.float64(theta)))
    assert -np.pi <= w <= np.pi
    assert abs(float(normalize_angle(jnp.float64(w))) - w) < 1e-12
    wk = float(normalize_angle(jnp.float64(theta + 2 * np.pi * k)))
    # equal up to the ±π seam
    assert min(abs(wk - w), abs(abs(wk - w) - 2 * np.pi)) < 1e-9


@settings(**COMMON)
@given(
    x=st.tuples(finite, finite, angle),
    d=st.tuples(finite, finite, angle),
)
def test_se2_boxplus_boxminus_roundtrip(x, d):
    xa = jnp.asarray(x, jnp.float64)
    da = jnp.asarray(d, jnp.float64)
    r = np.asarray(se2_boxminus(se2_boxplus(xa, da), xa))
    expect = np.array(da)
    expect[2] = float(normalize_angle(da[2]))
    err = np.abs(r - expect)
    err[2] = min(err[2], abs(err[2] - 2 * np.pi))  # ±π seam
    assert np.all(err < 1e-9)
    # x ⊖ x = 0
    assert np.allclose(np.asarray(se2_boxminus(xa, xa)), 0.0, atol=1e-12)


@settings(**COMMON)
@given(x=st.tuples(finite, finite, angle), y=st.tuples(finite, finite, angle))
def test_se2_interpolate_endpoints_and_geodesic_midpoint(x, y):
    xa = jnp.asarray(x, jnp.float64)
    xb = jnp.asarray(y, jnp.float64)
    p0 = np.asarray(se2_interpolate(xa, xb, 0.0))
    p1 = np.asarray(se2_interpolate(xa, xb, 1.0))
    assert np.allclose(p0[:2], np.asarray(xa)[:2], atol=1e-12)
    assert abs(float(angle_diff(p0[2], xa[2]))) < 1e-9
    assert np.allclose(p1[:2], np.asarray(xb)[:2], atol=1e-12)
    assert abs(float(angle_diff(p1[2], xb[2]))) < 1e-9
    # midpoint angle is the same wrapped distance from both ends
    pm = np.asarray(se2_interpolate(xa, xb, 0.5))
    da = abs(float(angle_diff(pm[2], xa[2])))
    db = abs(float(angle_diff(pm[2], xb[2])))
    assert abs(da - db) < 1e-9


def _rigid(theta, t):
    c, s = np.cos(theta), np.sin(theta)
    R = np.array([[c, -s], [s, c]])
    return lambda p: (R @ np.asarray(p, np.float64)) + np.asarray(t, np.float64)


@settings(**COMMON)
@given(p=pt, a=pt, b=pt, theta=angle, t=pt)
def test_point_to_segment_bounds_and_rigid_invariance(p, a, b, theta, t):
    d = float(point_to_segment(*map(lambda v: jnp.asarray(v, jnp.float64), (p, a, b))))
    # metric bounds: below min endpoint distance, nonnegative
    pe = np.asarray(p, np.float64)
    d_end = min(np.linalg.norm(pe - np.asarray(a)), np.linalg.norm(pe - np.asarray(b)))
    # the kernels use an AD-safe norm with a 1e-6 floor (gradient bounded at
    # 0), so allow that much slack above the exact bound
    assert -1e-12 <= d <= d_end + 1.1e-6
    # rigid-motion invariance
    g = _rigid(theta, t)
    d2 = float(
        point_to_segment(*map(lambda v: jnp.asarray(g(v), jnp.float64), (p, a, b)))
    )
    assert abs(d - d2) < 1e-8 * (1.0 + abs(d))


@settings(**COMMON)
@given(p1=pt, p2=pt, q1=pt, q2=pt)
def test_segment_to_segment_symmetry_and_upper_bound(p1, p2, q1, q2):
    args = [jnp.asarray(v, jnp.float64) for v in (p1, p2, q1, q2)]
    d = float(segment_to_segment(*args))
    d_sym = float(segment_to_segment(args[2], args[3], args[0], args[1]))
    assert abs(d - d_sym) < 1e-10
    # bounded above by every endpoint-to-other-segment distance
    ub = min(
        float(point_to_segment(args[0], args[2], args[3])),
        float(point_to_segment(args[1], args[2], args[3])),
        float(point_to_segment(args[2], args[0], args[1])),
        float(point_to_segment(args[3], args[0], args[1])),
    )
    assert d <= ub + 1e-9


@settings(**COMMON)
@given(
    p=pt,
    theta=angle,
    t=pt,
    nv=st.integers(3, 6),
    seed=st.integers(0, 2**31 - 1),
)
def test_polygon_signed_distance_rigid_invariance(p, theta, t, nv, seed):
    rng = np.random.default_rng(seed)
    ang = np.sort(rng.uniform(0, 2 * np.pi, size=nv))
    rad = rng.uniform(0.3, 3.0, size=nv)
    verts = np.stack([rad * np.cos(ang), rad * np.sin(ang)], axis=1)  # star-convex
    d = float(
        point_to_polygon_signed(
            jnp.asarray(p, jnp.float64), jnp.asarray(verts), jnp.asarray(nv, jnp.int32)
        )
    )
    g = _rigid(theta, t)
    verts_g = np.stack([g(v) for v in verts])
    d2 = float(
        point_to_polygon_signed(
            jnp.asarray(g(p), jnp.float64),
            jnp.asarray(verts_g),
            jnp.asarray(nv, jnp.int32),
        )
    )
    assert abs(d - d2) < 1e-8 * (1.0 + abs(d))


FOOTPRINTS = {
    "point": {},
    "circular": {"radius": 0.3},
    "line": {"line_start": (-0.2, 0.0), "line_end": (0.3, 0.0)},
    "two_circles": {
        "front_offset": 0.2,
        "front_radius": 0.25,
        "rear_offset": -0.2,
        "rear_radius": 0.25,
    },
    "polygon": {"vertices": [(-0.3, -0.2), (0.4, -0.2), (0.4, 0.2), (-0.3, 0.2)]},
}


@settings(deadline=None, max_examples=15)
@given(
    ftype=st.sampled_from(sorted(FOOTPRINTS)),
    pose=st.tuples(finite, finite, angle),
    ox=finite,
    oy=finite,
    orad=st.floats(0.05, 1.0),
    theta=angle,
    t=pt,
)
def test_footprint_distance_se2_equivariance(ftype, pose, ox, oy, orad, theta, t):
    """Moving the robot pose AND the obstacle field by the same rigid motion
    leaves every footprint-obstacle distance unchanged — the invariance the
    reference's calculateDistance(PoseSE2, Obstacle) relies on."""
    fp = make_footprint(ftype, **FOOTPRINTS[ftype])
    obs = ObstacleSet.from_lists(
        points=[(ox, oy)], circles=[(oy, ox, orad)], dtype=jnp.float64
    )
    d0 = np.asarray(fp.distances(jnp.asarray(pose, jnp.float64), obs))
    g = _rigid(theta, t)
    pose_g = (*g(pose[:2]), pose[2] + theta)
    obs_g = ObstacleSet.from_lists(
        points=[tuple(g((ox, oy)))],
        circles=[(*g((oy, ox)), orad)],
        dtype=jnp.float64,
    )
    d1 = np.asarray(fp.distances(jnp.asarray(pose_g, jnp.float64), obs_g))
    np.testing.assert_allclose(d0, d1, atol=1e-7, rtol=1e-7)


BASE_CFG = {
    "robot": {"type": "unicycle", "unicycle": {"max_vel_x": 0.4, "max_vel_theta": 0.3}},
    "grid": {"grid_size_ref": 15, "dt_ref": 0.3},
    "planning": {
        "objective": {
            "type": "quadratic_form",
            "quadratic_form": {
                "state_weights": [2.0, 2.0, 2.0],
                "control_weights": [1.0, 1.0],
            },
        }
    },
    "collision": {"min_obstacle_dist": 0.2, "obstacle_capacity": 4},
    "footprint_model": {"type": "circular", "radius": 0.2},
}


def _numeric_leaves(d, prefix=()):
    for k, v in d.items():
        if isinstance(v, dict):
            yield from _numeric_leaves(v, prefix + (k,))
        elif isinstance(v, (int, float)) and not isinstance(v, bool):
            yield prefix + (k,)


def _set_leaf(d, path, value):
    import copy

    d = copy.deepcopy(d)
    node = d
    for k in path[:-1]:
        node = node[k]
    node[path[-1]] = value
    return d


LEAVES = sorted(_numeric_leaves(BASE_CFG))


@settings(deadline=None, max_examples=30)
@given(
    idx=st.integers(0, len(LEAVES) - 1),
    scale=st.floats(0.25, 4.0, allow_nan=False),
)
def test_config_loader_fuzz_numeric_jitter(idx, scale):
    """Jittering any numeric leaf of a canonical config still loads and
    round-trips through transcription (no silent corruption, no crash on
    reasonable values)."""
    path = LEAVES[idx]
    base = dict(BASE_CFG)
    node = BASE_CFG
    for k in path:
        node = node[k]
    value = node * scale
    if path[-1] in ("grid_size_ref", "obstacle_capacity"):
        value = max(2, int(value))
    cfg = load_config(_set_leaf(base, path, value))
    cfg.to_ocp_spec()


@settings(deadline=None, max_examples=30)
@given(
    idx=st.integers(0, len(LEAVES) - 1),
    name=st.sampled_from(["bogus_key", "typo_parm", "not_a_field", "xyzzy"]),
)
def test_config_loader_rejects_unknown_keys_anywhere(idx, name):
    """An unknown key at ANY nesting level raises (the reference's rosparam
    loader would silently ignore it; ours must not — VERDICT round-1 dead-
    parameter finding)."""
    import pytest

    path = LEAVES[idx][:-1] + (name,)
    bad = _set_leaf(dict(BASE_CFG), path, 1.0)
    with pytest.raises((KeyError, ValueError, TypeError)):
        load_config(bad)
