import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_local_planner_tpu.core import so2


def test_normalize_angle_range():
    th = jnp.linspace(-12.0, 12.0, 1001)
    w = so2.normalize_angle(th)
    assert jnp.all(w >= -jnp.pi) and jnp.all(w < jnp.pi)
    # same angle mod 2pi
    np.testing.assert_allclose(np.cos(w), np.cos(th), atol=1e-12)
    np.testing.assert_allclose(np.sin(w), np.sin(th), atol=1e-12)


def test_normalize_angle_grad_is_one():
    g = jax.grad(lambda t: so2.normalize_angle(t))(1.234)
    assert g == pytest.approx(1.0)
    g = jax.grad(lambda t: so2.normalize_angle(t))(5.0)  # wrapped region
    assert g == pytest.approx(1.0)


def test_angle_diff_shortest():
    assert so2.angle_diff(jnp.pi - 0.1, -jnp.pi + 0.1) == pytest.approx(-0.2, abs=1e-6)
    assert so2.angle_diff(0.1, -0.1) == pytest.approx(0.2, abs=1e-6)


def test_interpolate_angle_across_wrap():
    a, b = jnp.pi - 0.1, -jnp.pi + 0.1
    mid = so2.interpolate_angle(a, b, 0.5)
    assert abs(so2.angle_diff(mid, jnp.pi)) < 1e-6


def test_average_angles_wrap():
    angles = jnp.array([jnp.pi - 0.1, -jnp.pi + 0.1])
    avg = so2.average_angles(angles)
    assert abs(so2.angle_diff(avg, jnp.pi)) < 1e-6


def test_se2_boxminus_wraps_theta_only():
    xa = jnp.array([1.0, 2.0, jnp.pi - 0.1])
    xb = jnp.array([0.5, 1.0, -jnp.pi + 0.1])
    d = so2.se2_boxminus(xa, xb)
    np.testing.assert_allclose(d[:2], [0.5, 1.0], atol=1e-12)
    assert d[2] == pytest.approx(-0.2, abs=1e-6)


def test_se2_boxplus_boxminus_roundtrip():
    rng = np.random.default_rng(0)
    xa = jnp.array(rng.uniform(-3, 3, (16, 3)))
    xb = jnp.array(rng.uniform(-3, 3, (16, 3)))
    rec = so2.se2_boxplus(xb, so2.se2_boxminus(xa, xb))
    np.testing.assert_allclose(rec[:, :2], xa[:, :2], atol=1e-12)
    np.testing.assert_allclose(
        so2.normalize_angle(rec[:, 2] - xa[:, 2]), 0.0, atol=1e-9
    )


def test_rot2d():
    R = so2.rot2d(jnp.pi / 2)
    np.testing.assert_allclose(R @ jnp.array([1.0, 0.0]), [0.0, 1.0], atol=1e-12)
