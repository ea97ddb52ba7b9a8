"""Canonical benchmark problem definitions (BASELINE.json configs #1–#5).

Parity: the role of `mpc_local_planner_examples/cfg/**` — the de-facto
reference configurations (SURVEY.md §3.1) — plus scenario-ensemble
generators for the batched TPU workload that BASELINE.json defines.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from mpc_local_planner_tpu.geometry.footprints import CircularFootprint, PointFootprint
from mpc_local_planner_tpu.geometry.obstacles import ObstacleSet
from mpc_local_planner_tpu.ocp.spec import OcpSpec, Scenario
from mpc_local_planner_tpu.systems.models import (
    RobotLimits,
    SimpleCarModel,
    UnicycleModel,
)

DIFF_DRIVE_LIMITS = RobotLimits(
    max_vel_x=0.4, max_vel_x_backwards=0.2, max_vel_theta=0.3,
    acc_lim_x=0.5, acc_lim_theta=0.5,
)
CARLIKE_LIMITS = RobotLimits(
    max_vel_x=0.4, max_vel_x_backwards=0.2, max_steering_angle=1.0,
    acc_lim_x=0.5,
)


def config1_unicycle_quadratic(N: int = 20) -> OcpSpec:
    """BASELINE config #1: unicycle, quadratic form, no obstacles."""
    return OcpSpec(
        model=UnicycleModel(), footprint=PointFootprint(), N=N,
        objective="quadratic_form", q_diag=(2.0, 2.0, 2.0), r_diag=(1.0, 1.0),
        qf_diag=(10.0, 10.0, 10.0), dt_ref=0.3, limits=DIFF_DRIVE_LIMITS,
    )


def config2_diffdrive_obstacles(N: int = 30, obstacle_cap: int = 10) -> OcpSpec:
    """BASELINE config #2: diff-drive, 10 circular obstacles, terminal ball."""
    return OcpSpec(
        model=UnicycleModel(), footprint=CircularFootprint(radius=0.2), N=N,
        objective="quadratic_form", q_diag=(2.0, 2.0, 2.0), r_diag=(1.0, 1.0),
        qf_diag=(20.0, 20.0, 20.0), ball_weights=(1.0, 1.0, 0.0),
        ball_radius=0.2, dt_ref=0.3, min_obstacle_dist=0.1,
        obstacle_cap=obstacle_cap, limits=DIFF_DRIVE_LIMITS,
    )


def config3_carlike_min_time(N: int = 50, obstacle_cap: int = 10) -> OcpSpec:
    """BASELINE config #3: car-like (Ackermann) time-optimal with obstacles."""
    return OcpSpec(
        model=SimpleCarModel(wheelbase=0.5), footprint=CircularFootprint(radius=0.2),
        N=N, objective="minimum_time", variable_dt=True, dt_min=1e-3, dt_max=0.5,
        dt_ref=0.3, xf_fixed=(True, True, True), min_obstacle_dist=0.1,
        obstacle_cap=obstacle_cap, limits=CARLIKE_LIMITS,
    )


def random_ensemble(
    spec: OcpSpec,
    batch: int,
    key: jax.Array,
    dtype=jnp.float32,
    goal_radius: float = 3.0,
    n_obstacles: Optional[int] = None,
) -> Scenario:
    """Random (start pose × goal × obstacle field) scenario ensemble.

    Obstacles are circles sampled between start and goal, kept clear of both
    endpoints so every instance is feasible.
    """
    kg, ko, kr, kh = jax.random.split(key, 4)
    x0 = jnp.zeros((batch, 3), dtype=dtype)
    ang = jax.random.uniform(kg, (batch,), minval=-0.8, maxval=0.8)
    dist = jax.random.uniform(kh, (batch,), minval=0.6 * goal_radius, maxval=goal_radius)
    xf = jnp.stack(
        [dist * jnp.cos(ang), dist * jnp.sin(ang), ang], axis=-1
    ).astype(dtype)

    M = spec.obstacle_cap
    if M == 0:
        return Scenario.goal_only(x0, xf, nu=spec.nu, dtype=dtype)

    n_act = M if n_obstacles is None else min(n_obstacles, M)
    frac = jax.random.uniform(ko, (batch, M), minval=0.25, maxval=0.75)
    lateral = jax.random.uniform(kr, (batch, M), minval=-1.0, maxval=1.0)
    heading = jnp.stack([jnp.cos(ang), jnp.sin(ang)], axis=-1)
    normal = jnp.stack([-jnp.sin(ang), jnp.cos(ang)], axis=-1)
    centers = (
        frac[..., None] * dist[:, None, None] * heading[:, None, :]
        + lateral[..., None] * normal[:, None, :]
    ).astype(dtype)
    radii = jnp.full((batch, M), 0.25, dtype=dtype)
    mask = (jnp.arange(M) < n_act)[None, :] & (jnp.abs(lateral) > 0.45)

    obstacles = ObstacleSet(
        points=jnp.zeros((batch, 0, 2), dtype), point_vels=jnp.zeros((batch, 0, 2), dtype),
        point_mask=jnp.zeros((batch, 0), bool),
        circles=centers, circle_radii=radii,
        circle_vels=jnp.zeros((batch, M, 2), dtype), circle_mask=mask,
        lines=jnp.zeros((batch, 0, 2, 2), dtype), line_vels=jnp.zeros((batch, 0, 2), dtype),
        line_mask=jnp.zeros((batch, 0), bool),
        polygons=jnp.zeros((batch, 0, 3, 2), dtype), polygon_nv=jnp.zeros((batch, 0), jnp.int32),
        polygon_vels=jnp.zeros((batch, 0, 2), dtype), polygon_mask=jnp.zeros((batch, 0), bool),
    )
    return Scenario(
        x0=x0, xf=xf, obstacles=obstacles,
        via_points=jnp.zeros((batch, spec.via_cap, 3), dtype),
        via_mask=jnp.zeros((batch, spec.via_cap), bool),
        u_prev=jnp.zeros((batch, spec.nu), dtype),
    )
