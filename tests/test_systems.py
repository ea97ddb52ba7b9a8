import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_local_planner_tpu.systems import (
    KinematicBicycleModelVelocityInput,
    SimpleCarFrontWheelDrivingModel,
    SimpleCarModel,
    UnicycleModel,
    make_robot_dynamics,
)
from mpc_local_planner_tpu.systems.models import RobotLimits


def test_unicycle_dynamics():
    m = UnicycleModel()
    x = jnp.array([0.0, 0.0, jnp.pi / 2])
    u = jnp.array([1.0, 0.3])
    xdot = m.f(x, u)
    np.testing.assert_allclose(xdot, [0.0, 1.0, 0.3], atol=1e-12)


def test_unicycle_batched():
    m = UnicycleModel()
    x = jnp.zeros((4, 7, 3))
    u = jnp.ones((4, 7, 2))
    assert m.f(x, u).shape == (4, 7, 3)


def test_simple_car_turn_rate():
    m = SimpleCarModel(wheelbase=0.5)
    x = jnp.zeros(3)
    u = jnp.array([2.0, 0.4])
    xdot = m.f(x, u)
    assert xdot[2] == pytest.approx(2.0 * np.tan(0.4) / 0.5)
    assert xdot[0] == pytest.approx(2.0)


def test_front_wheel_drive_scales_by_cos_phi():
    rear = SimpleCarModel(wheelbase=0.5)
    front = SimpleCarFrontWheelDrivingModel(wheelbase=0.5)
    x = jnp.zeros(3)
    u = jnp.array([1.0, 0.5])
    fr = front.f(x, u)
    assert fr[0] == pytest.approx(np.cos(0.5))
    assert fr[2] == pytest.approx(np.sin(0.5) / 0.5)
    # straight driving: identical
    u0 = jnp.array([1.0, 0.0])
    np.testing.assert_allclose(front.f(x, u0), rear.f(x, u0), atol=1e-12)


def test_kinematic_bicycle_slip_angle():
    m = KinematicBicycleModelVelocityInput(lf=0.3, lr=0.2)
    x = jnp.zeros(3)
    u = jnp.array([1.5, 0.3])
    beta = np.arctan(0.2 * np.tan(0.3) / 0.5)
    xdot = m.f(x, u)
    assert xdot[0] == pytest.approx(1.5 * np.cos(beta))
    assert xdot[1] == pytest.approx(1.5 * np.sin(beta))
    assert xdot[2] == pytest.approx(1.5 * np.sin(beta) / 0.2)


def test_linearize_matches_fd():
    for m in [
        UnicycleModel(),
        SimpleCarModel(wheelbase=0.4),
        KinematicBicycleModelVelocityInput(),
    ]:
        x = jnp.array([0.3, -0.2, 0.7])
        u = jnp.array([0.9, 0.2])
        A, B = m.linearize(x, u)
        eps = 1e-6
        A_fd = np.stack(
            [(m.f(x + eps * jnp.eye(3)[i], u) - m.f(x - eps * jnp.eye(3)[i], u)) / (2 * eps) for i in range(3)],
            axis=1,
        )
        B_fd = np.stack(
            [(m.f(x, u + eps * jnp.eye(2)[i]) - m.f(x, u - eps * jnp.eye(2)[i])) / (2 * eps) for i in range(2)],
            axis=1,
        )
        np.testing.assert_allclose(A, A_fd, atol=1e-6)
        np.testing.assert_allclose(B, B_fd, atol=1e-6)


def test_twist_from_control_consistent_with_dynamics():
    # at theta=0 the world-frame (xdot, ydot, thdot) equals the body twist
    for m in [
        UnicycleModel(),
        SimpleCarModel(wheelbase=0.4),
        SimpleCarFrontWheelDrivingModel(wheelbase=0.4),
        KinematicBicycleModelVelocityInput(lf=0.3, lr=0.2),
    ]:
        x = jnp.zeros(3)
        u = jnp.array([1.1, 0.25])
        np.testing.assert_allclose(m.twist_from_control(x, u), m.f(x, u), atol=1e-12)


def test_factory_and_bounds():
    m = make_robot_dynamics("simple_car", wheelbase=0.7)
    assert isinstance(m, SimpleCarModel) and m.wheelbase == 0.7
    lo, hi = m.control_bounds(RobotLimits(max_vel_x=1.0, max_vel_x_backwards=0.2, max_steering_angle=0.5))
    np.testing.assert_allclose(lo, [-0.2, -0.5])
    np.testing.assert_allclose(hi, [1.0, 0.5])
    with pytest.raises(ValueError):
        make_robot_dynamics("hovercraft")


def test_models_are_pytrees_and_jittable():
    m = SimpleCarModel(wheelbase=0.5)
    leaves = jax.tree_util.tree_leaves(m)
    assert len(leaves) == 1  # wheelbase
    f = jax.jit(lambda mm, x, u: mm.f(x, u))
    out = f(m, jnp.zeros(3), jnp.array([1.0, 0.1]))
    assert out.shape == (3,)
