"""Fixed-shape batched obstacle containers.

Parity: teb_local_planner ``obstacles.h`` (PointObstacle, CircularObstacle,
LineObstacle, PolygonObstacle; centroid velocity for dynamic obstacles) as
consumed by the reference's ``StageInequalitySE2`` and the ROS glue's
``updateObstacleContainerWith*`` methods.

TPU-first: instead of a heap-allocated vector of polymorphic Obstacle
pointers, an ObstacleSet is a struct-of-arrays pytree with *fixed* per-type
capacities and boolean active masks — the shape never depends on how many
obstacles exist, so solves stay compiled once and batch/vmap cleanly.
Dynamic obstacles carry a centroid velocity; ``predict(t)`` implements the
reference's constant-velocity extrapolation at stage time t.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# distance reported for padded (inactive) slots — large but finite so AD never
# sees inf arithmetic
BIG_DISTANCE = 1.0e6


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ObstacleSet:
    """Struct-of-arrays obstacle container with fixed capacities.

    Leading batch dims are allowed on every field (a batch of scenarios can
    carry a batch of obstacle fields).
    """

    points: jax.Array        # (..., Mp, 2)
    point_vels: jax.Array    # (..., Mp, 2)
    point_mask: jax.Array    # (..., Mp) bool

    circles: jax.Array       # (..., Mc, 2) centers
    circle_radii: jax.Array  # (..., Mc)
    circle_vels: jax.Array   # (..., Mc, 2)
    circle_mask: jax.Array   # (..., Mc) bool

    lines: jax.Array         # (..., Ml, 2, 2) endpoints
    line_vels: jax.Array     # (..., Ml, 2)
    line_mask: jax.Array     # (..., Ml) bool

    polygons: jax.Array      # (..., Mg, V, 2) padded vertices
    polygon_nv: jax.Array    # (..., Mg) int active vertex counts
    polygon_vels: jax.Array  # (..., Mg, 2)
    polygon_mask: jax.Array  # (..., Mg) bool

    @property
    def capacities(self) -> Tuple[int, int, int, int]:
        return (
            self.points.shape[-2],
            self.circles.shape[-2],
            self.lines.shape[-3],
            self.polygons.shape[-3],
        )

    @property
    def total_capacity(self) -> int:
        return sum(self.capacities)

    def masks_concat(self) -> jax.Array:
        return jnp.concatenate(
            [self.point_mask, self.circle_mask, self.line_mask, self.polygon_mask],
            axis=-1,
        )

    def num_active(self) -> jax.Array:
        return jnp.sum(self.masks_concat().astype(jnp.int32), axis=-1)

    def predict(self, t) -> "ObstacleSet":
        """Constant-velocity extrapolation of every obstacle to time t.

        Parity: StageInequalitySE2's dynamic-obstacle prediction (obstacle
        centroid velocity x stage time).
        """
        t = jnp.asarray(t)
        shift_p = self.point_vels * t[..., None, None]
        shift_c = self.circle_vels * t[..., None, None]
        shift_l = self.line_vels * t[..., None, None]
        shift_g = self.polygon_vels * t[..., None, None]
        return dataclasses.replace(
            self,
            points=self.points + shift_p,
            circles=self.circles + shift_c,
            lines=self.lines + shift_l[..., None, :],
            polygons=self.polygons + shift_g[..., None, :],
        )

    def predict_stages(self, times) -> "ObstacleSet":
        """Per-stage predicted sets with every leaf broadcast to a leading
        stage axis (times (T,)) — the form consumed by per-stage constraint
        evaluation. Only valid on an unbatched set (vmap over scenarios)."""
        pred = self.predict(times)
        T = times.shape[0]
        return jax.tree_util.tree_map(
            lambda a, o: a
            if a.ndim == o.ndim + 1
            else jnp.broadcast_to(a, (T,) + a.shape),
            pred,
            self,
        )

    def total_slots(self) -> int:
        """Static number of padded obstacle slots across all four families."""
        return (
            self.points.shape[-2]
            + self.circles.shape[-2]
            + self.lines.shape[-3]
            + self.polygons.shape[-3]
        )

    def padded_to(self, target_total: int) -> "ObstacleSet":
        """Pad with inactive POINT slots until ``total_slots() == target``.

        Parity: the reference's obstacle container holds any number of
        obstacles up to whatever the cycle provides; our shapes are static,
        so a scenario built with fewer slots than ``spec.obstacle_cap``
        (e.g. ``Scenario.goal_only`` under an obstacle-enabled config) is
        topped up with masked dummy slots. Raises if over capacity.
        """
        cur = self.total_slots()
        if cur == target_total:
            return self
        if cur > target_total:
            raise ValueError(
                f"scenario has {cur} obstacle slots but the spec's "
                f"obstacle_cap is {target_total}; raise "
                "collision.obstacle_capacity or trim the obstacle set"
            )
        extra = target_total - cur
        batch = self.points.shape[:-2]
        dtype = self.points.dtype
        zp = jnp.zeros(batch + (extra, 2), dtype)
        return dataclasses.replace(
            self,
            points=jnp.concatenate([self.points, zp], axis=-2),
            point_vels=jnp.concatenate([self.point_vels, zp], axis=-2),
            point_mask=jnp.concatenate(
                [self.point_mask, jnp.zeros(batch + (extra,), bool)], axis=-1
            ),
        )

    # ------------------------------------------------------------------ #
    @staticmethod
    def empty(
        max_points: int = 0,
        max_circles: int = 0,
        max_lines: int = 0,
        max_polygons: int = 0,
        max_polygon_vertices: int = 8,
        dtype=jnp.float32,
    ) -> "ObstacleSet":
        z = lambda *s: jnp.zeros(s, dtype=dtype)  # noqa: E731
        return ObstacleSet(
            points=z(max_points, 2),
            point_vels=z(max_points, 2),
            point_mask=jnp.zeros((max_points,), dtype=bool),
            circles=z(max_circles, 2),
            circle_radii=z(max_circles),
            circle_vels=z(max_circles, 2),
            circle_mask=jnp.zeros((max_circles,), dtype=bool),
            lines=z(max_lines, 2, 2),
            line_vels=z(max_lines, 2),
            line_mask=jnp.zeros((max_lines,), dtype=bool),
            polygons=z(max_polygons, max_polygon_vertices, 2),
            polygon_nv=jnp.zeros((max_polygons,), dtype=jnp.int32),
            polygon_vels=z(max_polygons, 2),
            polygon_mask=jnp.zeros((max_polygons,), dtype=bool),
        )

    @staticmethod
    def from_lists(
        points: Optional[Sequence] = None,
        circles: Optional[Sequence] = None,   # (x, y, r)
        lines: Optional[Sequence] = None,     # ((x1,y1), (x2,y2))
        polygons: Optional[Sequence] = None,  # [(x,y), ...] each
        point_vels: Optional[Sequence] = None,
        circle_vels: Optional[Sequence] = None,
        line_vels: Optional[Sequence] = None,
        polygon_vels: Optional[Sequence] = None,
        capacities: Optional[Tuple[int, int, int, int]] = None,
        max_polygon_vertices: Optional[int] = None,
        dtype=jnp.float32,
    ) -> "ObstacleSet":
        """Build a padded set from Python lists (host-side construction)."""
        points = list(points or [])
        circles = list(circles or [])
        lines = list(lines or [])
        polygons = [np.asarray(pg, dtype=np.float64) for pg in (polygons or [])]
        if capacities is None:
            capacities = (len(points), len(circles), len(lines), len(polygons))
        mp, mc, ml, mg = capacities
        if max_polygon_vertices is None:
            max_polygon_vertices = max([pg.shape[0] for pg in polygons], default=3)

        obs = ObstacleSet.empty(mp, mc, ml, mg, max_polygon_vertices, dtype=dtype)

        def fill(arr, rows, shape):
            a = np.zeros(shape, dtype=np.float64)
            for i, r in enumerate(rows):
                a[i] = np.asarray(r, dtype=np.float64)
            return jnp.asarray(a, dtype=dtype)

        def fill_mask(m, n):
            return jnp.asarray(np.arange(m) < n)

        upd = {}
        if mp:
            upd["points"] = fill(None, points, (mp, 2))
            upd["point_mask"] = fill_mask(mp, len(points))
            if point_vels:
                upd["point_vels"] = fill(None, point_vels, (mp, 2))
        if mc:
            carr = np.zeros((mc, 3))
            for i, c in enumerate(circles):
                carr[i] = np.asarray(c, dtype=np.float64)
            upd["circles"] = jnp.asarray(carr[:, :2], dtype=dtype)
            upd["circle_radii"] = jnp.asarray(carr[:, 2], dtype=dtype)
            upd["circle_mask"] = fill_mask(mc, len(circles))
            if circle_vels:
                upd["circle_vels"] = fill(None, circle_vels, (mc, 2))
        if ml:
            upd["lines"] = fill(None, [np.asarray(l) for l in lines], (ml, 2, 2))
            upd["line_mask"] = fill_mask(ml, len(lines))
            if line_vels:
                upd["line_vels"] = fill(None, line_vels, (ml, 2))
        if mg:
            parr = np.zeros((mg, max_polygon_vertices, 2))
            nv = np.zeros((mg,), dtype=np.int32)
            for i, pg in enumerate(polygons):
                n = pg.shape[0]
                parr[i, :n] = pg
                # repeat last vertex into padding so padded edges are degenerate
                parr[i, n:] = pg[-1]
                nv[i] = n
            upd["polygons"] = jnp.asarray(parr, dtype=dtype)
            upd["polygon_nv"] = jnp.asarray(nv)
            upd["polygon_mask"] = fill_mask(mg, len(polygons))
            if polygon_vels:
                upd["polygon_vels"] = fill(None, polygon_vels, (mg, 2))
        return dataclasses.replace(obs, **upd)
