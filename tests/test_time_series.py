import jax.numpy as jnp
import numpy as np
import pytest

from mpc_local_planner_tpu.core import TimeSeries, TimeSeriesSE2


def make_ts(cls=TimeSeries):
    times = jnp.array([0.0, 1.0, 2.0, 3.0])
    values = jnp.array(
        [[0.0, 0.0, 0.0], [1.0, 2.0, 0.5], [2.0, 4.0, 1.0], [3.0, 6.0, 1.5]]
    )
    return cls(times=times, values=values)


def test_linear_interpolation():
    ts = make_ts()
    v = ts.interpolate(0.5)
    np.testing.assert_allclose(v, [0.5, 1.0, 0.25], atol=1e-12)


def test_zoh_interpolation():
    ts = make_ts()
    np.testing.assert_allclose(ts.interpolate(1.9, mode="zoh"), [1.0, 2.0, 0.5], atol=1e-12)


def test_clamping_outside_support():
    ts = make_ts()
    np.testing.assert_allclose(ts.interpolate(-1.0), ts.first(), atol=1e-12)
    np.testing.assert_allclose(ts.interpolate(9.0), ts.last(), atol=1e-12)


def test_vector_time_query():
    ts = make_ts()
    v = ts.interpolate(jnp.array([0.5, 1.5, 2.5]))
    assert v.shape == (3, 3)
    np.testing.assert_allclose(v[1], [1.5, 3.0, 0.75], atol=1e-12)


def test_se2_angle_interpolation_across_wrap():
    times = jnp.array([0.0, 1.0])
    values = jnp.array([[0.0, 0.0, np.pi - 0.1], [1.0, 0.0, -np.pi + 0.1]])
    ts = TimeSeriesSE2(times=times, values=values)
    v = ts.interpolate(0.5)
    # naive interpolation would give 0; SE2-aware gives ±pi
    assert abs(abs(v[2]) - np.pi) < 1e-6
    assert v[0] == pytest.approx(0.5)
