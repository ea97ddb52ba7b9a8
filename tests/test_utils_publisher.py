"""Publisher/conversion smoke tests (headless matplotlib)."""

import os

import numpy as np

from mpc_local_planner_tpu.geometry.footprints import CircularFootprint
from mpc_local_planner_tpu.geometry.obstacles import ObstacleSet
from mpc_local_planner_tpu.utils.conversion import (
    poses_to_plan_array,
    time_series_to_poses,
)
from mpc_local_planner_tpu.utils.publisher import Publisher


def test_publisher_renders_scene(tmp_path):
    pub = Publisher()
    xs = np.column_stack([np.linspace(0, 2, 10), np.linspace(0, 1, 10), np.zeros(10)])
    pub.publish_local_plan(xs)
    pub.publish_global_plan(xs + 0.05)
    obs = ObstacleSet.from_lists(
        points=[(0.5, 0.5)], circles=[(1.0, 0.2, 0.3)],
        lines=[((0.0, 1.0), (1.0, 1.0))], polygons=[[(1.5, 0.0), (1.8, 0.0), (1.65, 0.4)]],
    )
    pub.publish_obstacles(obs)
    pub.publish_via_points(np.array([[0.5, 0.2, 0.0], [1.2, 0.5, 0.0]]))
    pub.publish_robot_footprint(np.array([0.0, 0.0, 0.3]), CircularFootprint(radius=0.25))
    out = tmp_path / "scene.png"
    pub.save(str(out), title="planner scene")
    assert out.exists() and os.path.getsize(out) > 5000


def test_conversions():
    import jax.numpy as jnp

    from mpc_local_planner_tpu.core.time_series import TimeSeriesSE2

    ts = TimeSeriesSE2(times=jnp.arange(4.0), values=jnp.ones((4, 3)))
    t, p = time_series_to_poses(ts)
    assert t.shape == (4,) and p.shape == (4, 3)

    plan = poses_to_plan_array([(0, 0), (1, 0), (1, 1)])
    assert plan.shape == (3, 3)
    np.testing.assert_allclose(plan[0, 2], 0.0)
    np.testing.assert_allclose(plan[1, 2], np.pi / 2)


def test_ackermann_from_twist_roundtrips_simple_car():
    """twist_from_control → ackermann_from_twist recovers (v, φ) (parity:
    the examples' cmd_vel_to_ackermann_drive script)."""
    import jax.numpy as jnp
    import numpy as np

    from mpc_local_planner_tpu.systems.models import SimpleCarModel
    from mpc_local_planner_tpu.utils.conversion import ackermann_from_twist

    model = SimpleCarModel(wheelbase=0.5)
    us = jnp.asarray(
        [[0.4, 0.3], [-0.2, 0.5], [0.3, -0.8], [0.0, 0.4]]
    )
    x = jnp.zeros((4, 3))
    tw = model.twist_from_control(x, us)
    back = ackermann_from_twist(np.asarray(tw), wheelbase=0.5)
    # standstill steering is zeroed by the singularity guard
    exp = np.asarray(us).copy()
    exp[3, 1] = 0.0
    np.testing.assert_allclose(back, exp, atol=1e-7)
