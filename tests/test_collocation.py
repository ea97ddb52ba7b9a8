"""Transcription correctness: collocation defects and their zero sets.

Mirrors the reference's grid tests (SURVEY.md §5: cbr:optimal_control/test —
transcribe a tiny system, assert residual values)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_local_planner_tpu.ocp.collocation import collocation_defects, stage_defect
from mpc_local_planner_tpu.systems.models import UnicycleModel


@pytest.fixture
def model():
    return UnicycleModel()


def _euler_rollout(model, x0, us, dt):
    xs = [x0]
    for u in us:
        xs.append(xs[-1] + dt * model.f(xs[-1], u))
    return jnp.stack(xs)


def test_forward_defect_zero_on_euler_rollout(model):
    x0 = jnp.array([0.1, -0.2, 0.3])
    us = jnp.array([[0.4, 0.1], [0.3, -0.2], [0.2, 0.0], [0.1, 0.3]])
    dt = 0.25
    xs = _euler_rollout(model, x0, us, dt)
    d = collocation_defects(model, "forward_differences", xs, us, dt)
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-12)


def test_midpoint_and_cn_reduce_to_forward_for_constant_fields(model):
    # With θ = const and u = (v, 0), f is state-independent → all three
    # collocation rules coincide.
    x0 = jnp.array([0.0, 0.0, 0.7])
    us = jnp.tile(jnp.array([[0.5, 0.0]]), (3, 1))
    dt = 0.2
    xs = _euler_rollout(model, x0, us, dt)
    for m in ("midpoint_differences", "crank_nicolson_differences"):
        d = collocation_defects(model, m, xs, us, dt)
        np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-12)


def test_defect_wraps_angle(model):
    # A rotation crossing the ±π seam must produce a small (wrapped) defect.
    xk = jnp.array([0.0, 0.0, 3.1])
    u = jnp.array([0.0, 1.0])
    dt = 0.1
    xk1 = jnp.array([0.0, 0.0, -3.083185307179586])  # 3.1 + 0.1 wrapped
    d = stage_defect(model, "forward_differences", xk, u, xk1, jnp.asarray(dt))
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-9)


def test_midpoint_converges_second_order(model):
    # Integrate a curved arc; midpoint defect of the exact solution should
    # shrink ~O(dt^3) per stage (local truncation), forward ~O(dt^2).
    v, om = 1.0, 1.0

    def exact(t):
        return jnp.array([jnp.sin(om * t) * v / om, (1 - jnp.cos(om * t)) * v / om, om * t])

    u = jnp.array([v, om])
    errs = {}
    for m in ("forward_differences", "midpoint_differences"):
        es = []
        for dt in (0.2, 0.1):
            d = stage_defect(model, m, exact(0.0), u, exact(dt), jnp.asarray(dt))
            es.append(float(jnp.max(jnp.abs(d))))
        errs[m] = es
    # error ratio when halving dt: forward ~4x, midpoint ~8x
    assert errs["forward_differences"][0] / errs["forward_differences"][1] > 3.0
    assert errs["midpoint_differences"][0] / errs["midpoint_differences"][1] > 6.0


def test_batched_defects_match_loop(model):
    key = jax.random.PRNGKey(0)
    xs = jax.random.normal(key, (4, 6, 3), dtype=jnp.float64)
    us = jax.random.normal(jax.random.PRNGKey(1), (4, 5, 2), dtype=jnp.float64)
    dt = jnp.array([0.1, 0.2, 0.3, 0.4], dtype=jnp.float64)
    d = collocation_defects(model, "crank_nicolson_differences", xs, us, dt)
    for b in range(4):
        db = collocation_defects(model, "crank_nicolson_differences", xs[b], us[b], dt[b])
        np.testing.assert_allclose(np.asarray(d[b]), np.asarray(db), atol=1e-12)
