"""Closed-loop Stage-like scenario regression pack.

Parity: `mpc_local_planner_examples/{maps,stage,launch}` — the reference's
acceptance surface is Stage-simulator navigation runs (rooms, corridors,
door passages) under move_base. Each test builds an occupancy-grid world
(`utils/worlds.py`), plans globally with the A* make_plan analog, drives
the full LocalPlanner pipeline (costmap obstacles → MPC cycles →
feasibility veto) to the goal, and asserts the driven trajectory keeps
clearance from every lethal cell.
"""

import numpy as np
import pytest

from mpc_local_planner_tpu.planner.config import load_config
from mpc_local_planner_tpu.utils.worlds import (
    astar_plan,
    cluttered_room,
    corridor_corner,
    min_clearance,
    run_episode,
    two_rooms,
)

ROBOT_RADIUS = 0.15

CFG = """
controller:
  xy_goal_tolerance: 0.25
  yaw_goal_tolerance: 3.2
  global_plan_overwrite_orientation: true
  global_plan_prune_distance: 1.0
  max_global_plan_lookahead_dist: 1.5
robot:
  type: unicycle
  unicycle:
    max_vel_x: 0.4
    max_vel_x_backwards: 0.2
    max_vel_theta: 0.5
grid:
  grid_size_ref: 15
  dt_ref: 0.3
planning:
  objective:
    type: quadratic_form
    quadratic_form:
      state_weights: [2.0, 2.0, 0.25]
      control_weights: [1.0, 1.0]
  terminal_cost:
    type: quadratic
    quadratic:
      final_state_weights: [10.0, 10.0, 0.5]
collision:
  min_obstacle_dist: 0.12
  # the obstacle horizon must cover the plan lookahead (1.5 m) plus the
  # trajectory's overshoot past the local goal: cells beyond cutoff_dist are
  # invisible to the solver but still vetoed by the post-solve feasibility
  # check, which deadlocks the cycle at the first unseen wall
  cutoff_dist: 2.6
  force_inclusion_dist: 0.8
  obstacle_capacity: 128
footprint_model:
  type: circular
  radius: 0.15
"""


def _drive(costmap, start, goal, max_cycles=220):
    cfg = load_config(CFG)
    reached, traj, vetoes = run_episode(
        cfg, costmap, np.asarray(start), np.asarray(goal),
        robot_radius=ROBOT_RADIUS + 0.07, max_cycles=max_cycles,
    )
    return reached, traj, vetoes


@pytest.mark.parametrize(
    "name,costmap,start,goal",
    [
        ("two_rooms_door", two_rooms(door_width=0.8, resolution=0.1),
         (0.8, 0.8, 0.0), (5.2, 5.2, 0.0)),
        ("corridor_corner", corridor_corner(width=1.1, resolution=0.1),
         (0.55, 0.55, 0.0), (4.45, 4.45, 1.57)),
        ("cluttered_room", cluttered_room(n_boxes=5, resolution=0.1, seed=3),
         (0.8, 0.8, 0.0), (5.2, 5.2, 0.0)),
    ],
)
def test_scenario_reaches_goal_with_clearance(name, costmap, start, goal):
    reached, traj, vetoes = _drive(costmap, start, goal)
    assert reached, (
        f"{name}: goal not reached in budget "
        f"(final pose {traj[-1]}, {vetoes} vetoes)"
    )
    # cell centers are up to res/2 inside the wall surface; require the
    # robot center to clear every lethal cell center by its radius
    clr = min_clearance(costmap, traj)
    assert clr > ROBOT_RADIUS, f"{name}: clearance {clr:.3f}"
    # the budget should not be dominated by feasibility vetoes
    assert vetoes < 0.5 * traj.shape[0], f"{name}: {vetoes} vetoes"


CARLIKE_CFG = """
controller:
  xy_goal_tolerance: 0.3
  yaw_goal_tolerance: 3.2
  global_plan_overwrite_orientation: true
  global_plan_prune_distance: 1.0
  max_global_plan_lookahead_dist: 1.8
robot:
  type: simple_car
  simple_car:
    wheelbase: 0.4
    max_vel_x: 0.4
    max_vel_x_backwards: 0.2
    max_steering_angle: 1.0
grid:
  grid_size_ref: 15
  dt_ref: 0.3
  xf_fixed: [true, true, false]
  variable_grid:
    enable: true
    min_dt: 0.001
    max_dt: 0.6
planning:
  objective:
    type: minimum_time
collision:
  min_obstacle_dist: 0.1
  cutoff_dist: 2.8
  force_inclusion_dist: 0.8
  obstacle_capacity: 128
footprint_model:
  type: two_circles
  front_offset: 0.12
  front_radius: 0.15
  rear_offset: -0.12
  rear_radius: 0.15
solver:
  tol_eq: 0.001
  tol_ineq: 0.001
"""


def test_carlike_min_time_two_rooms():
    """Ackermann min-time robot drives the door-passage scenario (parity:
    the reference's carlike Stage demos — carlike_minimum_time.launch)."""
    cm = two_rooms(door_width=1.0, resolution=0.1)
    cfg = load_config(CARLIKE_CFG)
    reached, traj, vetoes = run_episode(
        cfg, cm, np.asarray((0.8, 0.8, 0.3)), np.asarray((5.2, 5.2, 0.5)),
        robot_radius=0.3, max_cycles=260,
    )
    assert reached, f"goal not reached (final {traj[-1]}, {vetoes} vetoes)"
    clr = min_clearance(cm, traj)
    assert clr > 0.15, f"clearance {clr:.3f}"


DYN_CFG = """
controller:
  xy_goal_tolerance: 0.25
  yaw_goal_tolerance: 3.2
  global_plan_overwrite_orientation: true
  global_plan_prune_distance: 1.0
  max_global_plan_lookahead_dist: 1.5
robot:
  type: unicycle
  unicycle:
    max_vel_x: 0.4
    max_vel_x_backwards: 0.2
    max_vel_theta: 0.5
grid:
  grid_size_ref: 15
  dt_ref: 0.3
planning:
  objective:
    type: quadratic_form
    quadratic_form:
      state_weights: [2.0, 2.0, 0.25]
      control_weights: [1.0, 1.0]
  terminal_cost:
    type: quadratic
    quadratic:
      final_state_weights: [10.0, 10.0, 0.5]
collision:
  min_obstacle_dist: 0.12
  cutoff_dist: 2.6
  force_inclusion_dist: 0.8
  obstacle_capacity: 128
  costmap_converter: dynamic
  dynamic_capacity: 4
  dynamic_min_speed: 0.1
  enable_dynamic_obstacles: true
footprint_model:
  type: circular
  radius: 0.15
"""


def test_pedestrian_crossing_anticipated():
    """A pedestrian crossing the robot's path becomes a tracked
    velocity-carrying obstacle (CostmapToDynamicObstacles foreground) while
    the walls stay on the static point path (background); the robot reaches
    the goal without ever violating separation from the moving agent."""
    from mpc_local_planner_tpu.utils.worlds import pedestrian_crossing

    ped_r = 0.15
    cm_at, ped_at = pedestrian_crossing(
        size=6.0, resolution=0.1,
        ped_start=(3.0, 4.6), ped_vel=(0.0, -0.28), ped_radius=ped_r,
    )
    cfg = load_config(DYN_CFG)
    reached, traj, vetoes = run_episode(
        cfg, cm_at, np.asarray((0.8, 3.0, 0.0)), np.asarray((5.2, 3.0, 0.0)),
        robot_radius=ROBOT_RADIUS + 0.07, max_cycles=220,
    )
    assert reached, f"goal not reached (final {traj[-1]}, {vetoes} vetoes)"
    # per-cycle separation from the pedestrian center (traj[k] is the pose
    # at t = k * dt_ref by construction)
    t = np.arange(traj.shape[0]) * cfg.grid.dt_ref
    ped = np.stack([np.asarray(ped_at(tk)) for tk in t])
    sep = np.linalg.norm(traj[:, :2] - ped, axis=1)
    assert sep.min() > ped_r + ROBOT_RADIUS, f"min separation {sep.min():.3f}"
    # walls must keep clearance too (static background path)
    clr = min_clearance(cm_at(0.0), traj)
    assert clr > ROBOT_RADIUS


def test_astar_refuses_blocked_goal():
    cm = two_rooms(door_width=0.0, resolution=0.1)  # no door: rooms sealed
    with pytest.raises(ValueError, match="no path found"):
        astar_plan(cm, (0.8, 0.8), (5.2, 5.2), robot_radius=0.2)


def test_astar_corner_cut_forbidden():
    """Diagonal moves must not slip between two diagonally-touching blocks."""
    from mpc_local_planner_tpu.planner.local_planner import Costmap

    data = np.zeros((20, 20), dtype=np.uint8)
    data[:10, 10:] = 254  # top-right quadrant
    data[10:, :10] = 254  # bottom-left quadrant
    cm = Costmap(data=data, origin=(0.0, 0.0), resolution=0.1)
    with pytest.raises(ValueError):
        astar_plan(cm, (0.5, 0.5), (1.5, 1.5), robot_radius=0.0)
