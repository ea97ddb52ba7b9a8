"""Concrete SE(2) kinematic robot models.

Parity (file :: symbol):
  systems/unicycle_robot.h          :: UnicycleModel
  systems/simple_car.h              :: SimpleCarModel, SimpleCarFrontWheelDrivingModel
  systems/kinematic_bicycle_model.h :: KinematicBicycleModelVelocityInput

Each model is a frozen pytree dataclass; numeric parameters (wheelbase etc.)
are data leaves so they can be traced, batched (per-scenario vehicle params),
or swept without recompiling. ``f`` vectorizes over arbitrary leading batch
dimensions.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RobotLimits:
    """Input/rate limits (parity: the reference's `robot.<type>.*` params).

    max_vel_x / max_vel_x_backwards / max_vel_theta: velocity box.
    acc_lim_x / dec_lim_x / acc_lim_theta: control-rate (acceleration) box —
    consumed by the control-deviation constraint (stage_inequality_se2.h).
    max_steering_angle / max_steering_rate: Ackermann steering box and rate.
    Zero-valued acc/dec/rate limits mean "unbounded" like the reference.
    """

    max_vel_x: float = 0.4
    max_vel_x_backwards: float = 0.2
    max_vel_theta: float = 0.3
    acc_lim_x: float = 0.0
    dec_lim_x: float = 0.0
    acc_lim_theta: float = 0.0
    max_steering_angle: float = 1.5
    max_steering_rate: float = 0.0


from mpc_local_planner_tpu.systems.base import BaseRobotSE2  # noqa: E402


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class UnicycleModel(BaseRobotSE2):
    """Differential drive / unicycle: u = (v, omega).

    Parity: systems/unicycle_robot.h :: UnicycleModel::dynamics —
    xdot = (v cos th, v sin th, omega).
    """

    control_dim = 2

    def f(self, x, u):
        th = x[..., 2]
        v, om = u[..., 0], u[..., 1]
        return jnp.stack([v * jnp.cos(th), v * jnp.sin(th), om], axis=-1)

    def twist_from_control(self, x, u):
        """(linear.x, linear.y, angular.z) — unicycle controls ARE the twist."""
        return jnp.stack([u[..., 0], jnp.zeros_like(u[..., 0]), u[..., 1]], axis=-1)

    def control_bounds(self, limits: RobotLimits):
        lo = jnp.array([-limits.max_vel_x_backwards, -limits.max_vel_theta])
        hi = jnp.array([limits.max_vel_x, limits.max_vel_theta])
        return lo, hi

    def control_rate_bounds(self, limits: RobotLimits):
        big = jnp.inf
        dec = limits.dec_lim_x if limits.dec_lim_x > 0 else big
        acc = limits.acc_lim_x if limits.acc_lim_x > 0 else big
        acc_th = limits.acc_lim_theta if limits.acc_lim_theta > 0 else big
        return jnp.array([-dec, -acc_th]), jnp.array([acc, acc_th])


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SimpleCarModel(BaseRobotSE2):
    """Rear-wheel-driven Ackermann car: u = (v, phi).

    Parity: systems/simple_car.h :: SimpleCarModel —
    xdot = (v cos th, v sin th, v tan(phi) / wheelbase).
    """

    wheelbase: float = 0.5
    control_dim = 2

    def f(self, x, u):
        th = x[..., 2]
        v, phi = u[..., 0], u[..., 1]
        return jnp.stack(
            [v * jnp.cos(th), v * jnp.sin(th), v * jnp.tan(phi) / self.wheelbase],
            axis=-1,
        )

    def twist_from_control(self, x, u):
        v, phi = u[..., 0], u[..., 1]
        om = v * jnp.tan(phi) / self.wheelbase
        return jnp.stack([v, jnp.zeros_like(v), om], axis=-1)

    def control_bounds(self, limits: RobotLimits):
        lo = jnp.array([-limits.max_vel_x_backwards, -limits.max_steering_angle])
        hi = jnp.array([limits.max_vel_x, limits.max_steering_angle])
        return lo, hi

    def control_rate_bounds(self, limits: RobotLimits):
        big = jnp.inf
        dec = limits.dec_lim_x if limits.dec_lim_x > 0 else big
        acc = limits.acc_lim_x if limits.acc_lim_x > 0 else big
        rate = limits.max_steering_rate if limits.max_steering_rate > 0 else big
        return jnp.array([-dec, -rate]), jnp.array([acc, rate])


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SimpleCarFrontWheelDrivingModel(SimpleCarModel):
    """Front-wheel-driven Ackermann car.

    Parity: systems/simple_car.h :: SimpleCarFrontWheelDrivingModel —
    the measured speed is at the steered front axle, so the body-frame
    longitudinal speed scales by cos(phi):
    xdot = (v cos phi cos th, v cos phi sin th, v sin(phi) / wheelbase).
    """

    def f(self, x, u):
        th = x[..., 2]
        v, phi = u[..., 0], u[..., 1]
        vl = v * jnp.cos(phi)
        return jnp.stack(
            [vl * jnp.cos(th), vl * jnp.sin(th), v * jnp.sin(phi) / self.wheelbase],
            axis=-1,
        )

    def twist_from_control(self, x, u):
        v, phi = u[..., 0], u[..., 1]
        return jnp.stack(
            [v * jnp.cos(phi), jnp.zeros_like(v), v * jnp.sin(phi) / self.wheelbase],
            axis=-1,
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class KinematicBicycleModelVelocityInput(BaseRobotSE2):
    """Kinematic bicycle with velocity input: u = (v, delta).

    Parity: systems/kinematic_bicycle_model.h ::
    KinematicBicycleModelVelocityInput — slip angle
    beta = atan(lr tan(delta) / (lf + lr)),
    xdot = (v cos(th+beta), v sin(th+beta), v sin(beta) / lr).
    """

    lf: float = 0.25
    lr: float = 0.25
    control_dim = 2

    def f(self, x, u):
        th = x[..., 2]
        v, delta = u[..., 0], u[..., 1]
        beta = jnp.arctan(self.lr * jnp.tan(delta) / (self.lf + self.lr))
        return jnp.stack(
            [
                v * jnp.cos(th + beta),
                v * jnp.sin(th + beta),
                v * jnp.sin(beta) / self.lr,
            ],
            axis=-1,
        )

    def twist_from_control(self, x, u):
        v, delta = u[..., 0], u[..., 1]
        beta = jnp.arctan(self.lr * jnp.tan(delta) / (self.lf + self.lr))
        return jnp.stack(
            [v * jnp.cos(beta), v * jnp.sin(beta), v * jnp.sin(beta) / self.lr],
            axis=-1,
        )

    def control_bounds(self, limits: RobotLimits):
        lo = jnp.array([-limits.max_vel_x_backwards, -limits.max_steering_angle])
        hi = jnp.array([limits.max_vel_x, limits.max_steering_angle])
        return lo, hi

    def control_rate_bounds(self, limits: RobotLimits):
        big = jnp.inf
        dec = limits.dec_lim_x if limits.dec_lim_x > 0 else big
        acc = limits.acc_lim_x if limits.acc_lim_x > 0 else big
        rate = limits.max_steering_rate if limits.max_steering_rate > 0 else big
        return jnp.array([-dec, -rate]), jnp.array([acc, rate])


ROBOT_TYPES = {
    "unicycle": UnicycleModel,
    "simple_car": SimpleCarModel,
    "simple_car_front_wheel_driving": SimpleCarFrontWheelDrivingModel,
    "kinematic_bicycle_vel_input": KinematicBicycleModelVelocityInput,
}


def make_robot_dynamics(robot_type: str, **kwargs):
    """Factory (parity: Controller::configureRobotDynamics robot.type switch)."""
    try:
        cls = ROBOT_TYPES[robot_type]
    except KeyError:
        raise ValueError(
            f"unknown robot type {robot_type!r}; options: {sorted(ROBOT_TYPES)}"
        ) from None
    return cls(**kwargs)
