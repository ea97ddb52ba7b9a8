"""Footprint x obstacle-type distance matrix vs a brute-force sampler.

Covers all 5 footprint models (teb_local_planner robot_footprint_model.h ::
{Point,Circular,Line,TwoCircles,Polygon}RobotFootprint.calculateDistance)
against all 4 obstacle types, checking sign AND magnitude. This closes the
test hole behind the round-1 PolygonFootprint sign-inversion bug.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_local_planner_tpu.geometry.footprints import (
    CircularFootprint,
    LineFootprint,
    PointFootprint,
    PolygonFootprint,
    TwoCirclesFootprint,
)
from mpc_local_planner_tpu.geometry.obstacles import ObstacleSet

RNG = np.random.default_rng(7)

# one obstacle of each type, all well clear of the origin-centred robot
OBS = ObstacleSet.from_lists(
    points=[(2.0, 0.5)],
    circles=[(-2.0, 1.0, 0.3)],
    lines=[((0.5, -2.0), (1.5, -2.5))],
    polygons=[[(-1.5, -1.5), (-0.9, -1.5), (-0.9, -0.9), (-1.5, -0.9)]],
    dtype=jnp.float64,
)

FOOTPRINTS = {
    "point": PointFootprint(),
    "circular": CircularFootprint(radius=0.25),
    "line": LineFootprint(
        line_start=jnp.array([-0.3, 0.0]), line_end=jnp.array([0.4, 0.0])
    ),
    "two_circles": TwoCirclesFootprint(
        front_offset=0.25, front_radius=0.2, rear_offset=-0.25, rear_radius=0.15
    ),
    "polygon": PolygonFootprint(
        vertices=jnp.array(
            [[0.4, -0.25], [0.4, 0.25], [-0.35, 0.25], [-0.35, -0.25]]
        )
    ),
}


def _sample_segment(a, b, n=400):
    t = np.linspace(0.0, 1.0, n)[:, None]
    return np.asarray(a)[None] * (1 - t) + np.asarray(b)[None] * t


def _footprint_samples(name, pose):
    """Dense world-frame point samples of the footprint's occupied set
    boundary, plus the per-sample 'radius' to subtract (for disc shapes)."""
    px, py, th = (float(v) for v in pose)
    c, s = np.cos(th), np.sin(th)
    R = np.array([[c, -s], [s, c]])
    p = np.array([px, py])
    if name == "point":
        return p[None, :], np.zeros(1)
    if name == "circular":
        return p[None, :], np.array([0.25])
    if name == "line":
        a = p + R @ np.array([-0.3, 0.0])
        b = p + R @ np.array([0.4, 0.0])
        return _sample_segment(a, b), np.zeros(400)
    if name == "two_circles":
        front = p + R @ np.array([0.25, 0.0])
        rear = p + R @ np.array([-0.25, 0.0])
        return np.stack([front, rear]), np.array([0.2, 0.15])
    if name == "polygon":
        v = np.array([[0.4, -0.25], [0.4, 0.25], [-0.35, 0.25], [-0.35, -0.25]])
        vw = (R @ v.T).T + p
        segs = [
            _sample_segment(vw[i], vw[(i + 1) % 4]) for i in range(4)
        ]
        pts = np.concatenate(segs)
        return pts, np.zeros(pts.shape[0])
    raise AssertionError(name)


def _obstacle_samples():
    """Dense boundary samples per obstacle slot, with per-sample radius."""
    out = []
    out.append((np.array([[2.0, 0.5]]), np.zeros(1)))  # point
    ang = np.linspace(0, 2 * np.pi, 720, endpoint=False)
    out.append(
        (
            np.array([-2.0, 1.0])[None]
            + 0.3 * np.stack([np.cos(ang), np.sin(ang)], axis=1),
            np.zeros(720),
        )
    )  # circle boundary
    out.append((_sample_segment((0.5, -2.0), (1.5, -2.5), 600), np.zeros(600)))
    poly = np.array([[-1.5, -1.5], [-0.9, -1.5], [-0.9, -0.9], [-1.5, -0.9]])
    segs = [_sample_segment(poly[i], poly[(i + 1) % 4], 200) for i in range(4)]
    out.append((np.concatenate(segs), np.zeros(800)))
    return out


@pytest.mark.parametrize("name", sorted(FOOTPRINTS))
def test_distance_matrix_matches_brute_force(name):
    fp = FOOTPRINTS[name]
    poses = RNG.uniform(-0.4, 0.4, size=(8, 3))
    poses[:, 2] = RNG.uniform(-np.pi, np.pi, size=8)
    d = np.asarray(
        jax.vmap(lambda q: fp.distances(q, OBS))(jnp.asarray(poses))
    )  # (8, 4)
    assert d.shape == (8, 4)
    obs_samps = _obstacle_samples()
    for k, pose in enumerate(poses):
        fpts, frad = _footprint_samples(name, pose)
        for j, (opts, orad) in enumerate(obs_samps):
            dd = np.linalg.norm(
                fpts[:, None, :] - opts[None, :, :], axis=2
            ) - frad[:, None] - orad[None, :]
            d_brute = float(np.min(dd))
            # every shape here is non-penetrating so brute boundary sampling
            # is exact up to the sampling density
            assert d_brute > 0.1, "test geometry should be separated"
            np.testing.assert_allclose(d[k, j], d_brute, atol=8e-3,
                                       err_msg=f"{name} vs obstacle {j}")


@pytest.mark.parametrize(
    "name", ["circular", "two_circles", "polygon"]
)
def test_penetration_is_negative(name):
    """A point obstacle inside an area-footprint must report NEGATIVE
    distance (penetration), a circle overlapping likewise."""
    fp = FOOTPRINTS[name]
    obs = ObstacleSet.from_lists(
        points=[(0.15, 0.0)],           # strictly inside every footprint above
        circles=[(0.0, 0.1, 0.3)],      # overlapping circle
        dtype=jnp.float64,
    )
    pose = jnp.zeros(3, dtype=jnp.float64)
    d = np.asarray(fp.distances(pose, obs))
    assert d[0] < 0.0, f"{name}: interior point obstacle must be negative"
    assert d[1] < 0.0, f"{name}: overlapping circle must be negative"


def test_polygon_footprint_far_point_positive():
    """Regression for the round-1 sign inversion: a point obstacle 2.5 m
    from a unit-square robot must report ~+2.0 m (edge distance), never
    negative."""
    fp = PolygonFootprint(
        vertices=jnp.array([[0.5, -0.5], [0.5, 0.5], [-0.5, 0.5], [-0.5, -0.5]])
    )
    obs = ObstacleSet.from_lists(points=[(2.5, 0.0)], dtype=jnp.float64)
    d = float(fp.distances(jnp.zeros(3, dtype=jnp.float64), obs)[0])
    np.testing.assert_allclose(d, 2.0, atol=1e-6)


def test_polygon_footprint_solver_avoidance():
    """Solver-level: a polygon-footprint robot clears a point-obstacle field
    (parity check of the full StageInequalitySE2 path with a polygon
    footprint, which round 1 never exercised)."""
    from mpc_local_planner_tpu.ocp.grid import initial_primal
    from mpc_local_planner_tpu.ocp.spec import OcpSpec, Scenario
    from mpc_local_planner_tpu.solvers.al_sqp import (
        SolverSettings,
        init_duals,
        solve_single,
    )
    from mpc_local_planner_tpu.systems.models import RobotLimits, UnicycleModel

    fp = FOOTPRINTS["polygon"]
    obs = ObstacleSet.from_lists(
        points=[(1.2, 0.1), (1.8, 0.15)], dtype=jnp.float64
    )
    spec = OcpSpec(
        model=UnicycleModel(), footprint=fp, N=25,
        objective="quadratic_form", q_diag=(2.0, 2.0, 1.0), r_diag=(1.0, 1.0),
        qf_diag=(20.0, 20.0, 5.0), dt_ref=0.3, min_obstacle_dist=0.1,
        obstacle_cap=obs.total_capacity,
        limits=RobotLimits(max_vel_x=0.4, max_vel_x_backwards=0.2, max_vel_theta=0.4),
    )
    scen = Scenario.goal_only(
        jnp.array([0.0, 0.0, 0.0]), jnp.array([3.0, 0.0, 0.0]),
        obstacle_set=obs, dtype=jnp.float64,
    )
    settings = SolverSettings(n_al=15, n_sqp=15, rho0=10.0)
    r = jax.jit(
        lambda s, i, d: solve_single(spec, settings, s, i, d)
    )(scen, initial_primal(spec, scen), init_duals(spec, settings, dtype=jnp.float64))
    assert bool(r.converged)
    d = spec.footprint.distances(r.primal.xs[1:], scen.obstacles)
    assert float(jnp.min(d)) > spec.min_obstacle_dist - 1e-3
    np.testing.assert_allclose(
        np.asarray(r.primal.xs[-1, :2]), np.asarray(scen.xf[:2]), atol=0.1
    )
