"""Obstacle & footprint geometry (parity: teb_local_planner obstacles.h /
robot_footprint_model.h, reused by the reference planner)."""

from mpc_local_planner_tpu.geometry.distances import (  # noqa: F401
    point_to_point,
    point_to_segment,
    segment_to_segment,
    point_to_polygon_signed,
)
from mpc_local_planner_tpu.geometry.obstacles import ObstacleSet  # noqa: F401
from mpc_local_planner_tpu.geometry.footprints import (  # noqa: F401
    PointFootprint,
    CircularFootprint,
    LineFootprint,
    TwoCirclesFootprint,
    PolygonFootprint,
    make_footprint,
    FOOTPRINT_TYPES,
)
