"""Robot footprint models.

Parity: teb_local_planner ``robot_footprint_model.h`` — PointRobotFootprint,
CircularRobotFootprint, LineRobotFootprint, TwoCirclesRobotFootprint,
PolygonRobotFootprint, each with ``calculateDistance(PoseSE2, Obstacle)``;
selected by the reference's ``footprint_model/type`` param
(mpc_local_planner_ros.cpp :: getRobotFootprintFromParamServer).

TPU-first: ``distances(pose, obs)`` returns the *per-obstacle* distance
vector for a whole padded ObstacleSet at once (fixed shape, batch dims on
pose broadcast through), rather than one virtual call per obstacle. Inactive
obstacle slots report BIG_DISTANCE so downstream constraint residuals are
trivially inactive with zero gradient.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from mpc_local_planner_tpu.geometry.distances import (
    point_to_point,
    point_to_polygon_signed,
    point_to_segment,
    polygon_to_polygon,
    segment_to_polygon,
    segment_to_segment,
)
from mpc_local_planner_tpu.geometry.obstacles import BIG_DISTANCE, ObstacleSet
from mpc_local_planner_tpu.core.so2 import rot2d


def _mask(d, mask):
    return jnp.where(mask, d, BIG_DISTANCE)


def _point_distances(p, obs: ObstacleSet):
    """Distances from a world point (..., 2) to every obstacle slot (..., M)."""
    d_pts = point_to_point(p[..., None, :], obs.points)
    d_circ = point_to_point(p[..., None, :], obs.circles) - obs.circle_radii
    d_line = point_to_segment(p[..., None, :], obs.lines[..., 0, :], obs.lines[..., 1, :])
    d_poly = point_to_polygon_signed(p[..., None, :], obs.polygons, obs.polygon_nv)
    return jnp.concatenate(
        [
            _mask(d_pts, obs.point_mask),
            _mask(d_circ, obs.circle_mask),
            _mask(d_line, obs.line_mask),
            _mask(d_poly, obs.polygon_mask),
        ],
        axis=-1,
    )


def _segment_distances(a, b, obs: ObstacleSet):
    """Distances from world segment [a, b] to every obstacle slot."""
    d_pts = point_to_segment(obs.points, a[..., None, :], b[..., None, :])
    d_circ = (
        point_to_segment(obs.circles, a[..., None, :], b[..., None, :])
        - obs.circle_radii
    )
    d_line = segment_to_segment(
        a[..., None, :], b[..., None, :], obs.lines[..., 0, :], obs.lines[..., 1, :]
    )
    d_poly = segment_to_polygon(a[..., None, :], b[..., None, :], obs.polygons, obs.polygon_nv)
    return jnp.concatenate(
        [
            _mask(d_pts, obs.point_mask),
            _mask(d_circ, obs.circle_mask),
            _mask(d_line, obs.line_mask),
            _mask(d_poly, obs.polygon_mask),
        ],
        axis=-1,
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PointFootprint:
    """Robot = a point at the pose position (parity: PointRobotFootprint)."""

    def distances(self, pose, obs: ObstacleSet):
        return _point_distances(pose[..., :2], obs)

    @property
    def inscribed_radius(self):
        return 0.0


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CircularFootprint:
    """Disc of given radius (parity: CircularRobotFootprint)."""

    radius: float = 0.3

    def distances(self, pose, obs: ObstacleSet):
        return _point_distances(pose[..., :2], obs) - self.radius

    @property
    def inscribed_radius(self):
        return self.radius


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LineFootprint:
    """Body-frame segment (parity: LineRobotFootprint; line_start/line_end)."""

    line_start: jax.Array  # (2,)
    line_end: jax.Array    # (2,)

    def distances(self, pose, obs: ObstacleSet):
        R = rot2d(pose[..., 2])
        p = pose[..., :2]
        # cast to the pose dtype: body-frame endpoints may be python tuples
        # (hashable static specs) and must not promote an f32 solve to f64
        ls = jnp.asarray(self.line_start, dtype=pose.dtype)
        le = jnp.asarray(self.line_end, dtype=pose.dtype)
        a = p + jnp.einsum("...ij,j->...i", R, ls)
        b = p + jnp.einsum("...ij,j->...i", R, le)
        return _segment_distances(a, b, obs)

    @property
    def inscribed_radius(self):
        return 0.0


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TwoCirclesFootprint:
    """Two discs on the body x-axis (parity: TwoCirclesRobotFootprint;
    front_offset/front_radius/rear_offset/rear_radius)."""

    front_offset: float = 0.2
    front_radius: float = 0.2
    rear_offset: float = -0.2
    rear_radius: float = 0.2

    def distances(self, pose, obs: ObstacleSet):
        th = pose[..., 2]
        heading = jnp.stack([jnp.cos(th), jnp.sin(th)], axis=-1)
        p = pose[..., :2]
        front = _point_distances(p + self.front_offset * heading, obs) - self.front_radius
        rear = _point_distances(p + self.rear_offset * heading, obs) - self.rear_radius
        return jnp.minimum(front, rear)

    @property
    def inscribed_radius(self):
        return min(self.front_radius, self.rear_radius)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PolygonFootprint:
    """Closed body-frame polygon (parity: PolygonRobotFootprint; vertices)."""

    vertices: jax.Array  # (Vf, 2) body frame, closed implicitly

    def distances(self, pose, obs: ObstacleSet):
        R = rot2d(pose[..., 2])
        verts = pose[..., None, :2] + jnp.einsum(
            "...ij,vj->...vi", R, jnp.asarray(self.vertices, dtype=pose.dtype)
        )
        nv = jnp.asarray(verts.shape[-2], dtype=jnp.int32)
        nv_b = jnp.broadcast_to(nv, verts.shape[:-2])

        # point_to_polygon_signed is negative when the obstacle point lies
        # INSIDE the robot polygon (penetration) and positive outside — the
        # exact footprint-distance convention; no sign flip.
        d_pts = point_to_polygon_signed(obs.points, verts[..., None, :, :], nv_b[..., None])
        d_circ = (
            point_to_polygon_signed(obs.circles, verts[..., None, :, :], nv_b[..., None])
            - obs.circle_radii
        )
        d_line = segment_to_polygon(
            obs.lines[..., 0, :], obs.lines[..., 1, :], verts[..., None, :, :], nv_b[..., None]
        )
        d_poly = polygon_to_polygon(
            verts[..., None, :, :],
            nv_b[..., None],
            obs.polygons,
            obs.polygon_nv,
        )
        return jnp.concatenate(
            [
                _mask(d_pts, obs.point_mask),
                _mask(d_circ, obs.circle_mask),
                _mask(d_line, obs.line_mask),
                _mask(d_poly, obs.polygon_mask),
            ],
            axis=-1,
        )

    @property
    def inscribed_radius(self):
        import numpy as np

        v = np.asarray(self.vertices)
        # min distance from origin to the polygon edges
        r = np.inf
        for i in range(v.shape[0]):
            a, b = v[i], v[(i + 1) % v.shape[0]]
            ab = b - a
            t = np.clip(-a @ ab / max(ab @ ab, 1e-12), 0.0, 1.0)
            r = min(r, float(np.linalg.norm(a + t * ab)))
        return r


FOOTPRINT_TYPES = {
    "point": PointFootprint,
    "circular": CircularFootprint,
    "line": LineFootprint,
    "two_circles": TwoCirclesFootprint,
    "polygon": PolygonFootprint,
}


def make_footprint(footprint_type: str, **kwargs):
    """Factory (parity: getRobotFootprintFromParamServer type switch)."""
    try:
        cls = FOOTPRINT_TYPES[footprint_type]
    except KeyError:
        raise ValueError(
            f"unknown footprint type {footprint_type!r}; options: {sorted(FOOTPRINT_TYPES)}"
        ) from None
    return cls(**kwargs)
