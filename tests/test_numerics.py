"""Numerics parity tests: integrators, FD derivatives, control theory.

Mirrors the reference's cbr:numerics test suites (SURVEY.md §5 —
test_finite_differences, integrator convergence, test_algebraic_riccati_*,
test_lyapunov_*, test_controllability), validated against scipy.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_local_planner_tpu.numerics import (
    are_continuous,
    are_discrete,
    central_hessian,
    central_jacobian,
    controllability_matrix,
    forward_jacobian,
    integrate,
    is_controllable,
    is_observable,
    lqr_gain_continuous,
    lqr_gain_discrete,
    lyapunov_continuous,
    lyapunov_discrete,
    sylvester_continuous,
)
from mpc_local_planner_tpu.numerics.integrators import rollout
from mpc_local_planner_tpu.systems.models import UnicycleModel


# --------------------------------------------------------------------- #
# integrators
# --------------------------------------------------------------------- #
def _exact_arc(t, v=1.0, om=1.0):
    return jnp.array([v / om * jnp.sin(om * t), v / om * (1 - jnp.cos(om * t)), om * t])


@pytest.mark.parametrize(
    "method,order",
    [("explicit_euler", 1), ("rk2_midpoint", 2), ("rk2_heun", 2), ("rk3", 3), ("rk4", 4)],
)
def test_integrator_convergence_order(method, order):
    model = UnicycleModel()
    u = jnp.array([1.0, 1.0])
    x0 = jnp.zeros(3)
    T = 0.8
    errs = []
    for n in (8, 16):
        x = x0
        for _ in range(n):
            x = integrate(model.f, x, u, T / n, method=method)
        errs.append(float(jnp.max(jnp.abs(x - _exact_arc(T)))))
    rate = np.log2(errs[0] / errs[1])
    assert rate > order - 0.45, (method, rate, errs)


def test_rk5_high_accuracy():
    model = UnicycleModel()
    u = jnp.array([1.0, 1.0])
    x = jnp.zeros(3)
    for _ in range(8):
        x = integrate(model.f, x, u, 0.1, method="rk5")
    np.testing.assert_allclose(np.asarray(x), np.asarray(_exact_arc(0.8)), atol=1e-8)


@pytest.mark.parametrize("method,order", [("rk6", 6), ("rk7", 7)])
def test_high_order_integrator_convergence(method, order):
    """RK6 (Butcher 7-stage) / RK7 (Fehlberg 13-stage) hit their orders.

    Parity: cbr:numerics/explicit_integrators.h ::
    IntegratorExplicitRungeKutta{6,7}. Coarse steps keep the error above the
    f64 noise floor so the observed rate is measurable.
    """
    model = UnicycleModel()
    u = jnp.array([1.0, 1.0])
    x0 = jnp.zeros(3)
    T = 1.6
    errs = []
    for n in (2, 4):
        x = x0
        for _ in range(n):
            x = integrate(model.f, x, u, T / n, method=method)
        errs.append(float(jnp.max(jnp.abs(x - _exact_arc(T)))))
    rate = np.log2(errs[0] / errs[1])
    assert rate > order - 0.6, (method, rate, errs)
    # and absolute accuracy at a practical step
    x = jnp.zeros(3)
    for _ in range(8):
        x = integrate(model.f, x, u, 0.1, method=method)
    np.testing.assert_allclose(np.asarray(x), np.asarray(_exact_arc(0.8)), atol=1e-9)


def test_rk_tableaus_consistent():
    """Every tableau satisfies Σb = 1 and each a-row sums to its c node
    (consistency conditions; guards typos in the hand-entered tableaus)."""
    from mpc_local_planner_tpu.numerics.integrators import RK_TABLEAUS

    for name, (a_rows, b) in RK_TABLEAUS.items():
        assert abs(sum(b) - 1.0) < 1e-12, name
        assert len(b) == len(a_rows) + 1, name
        for i, row in enumerate(a_rows):
            assert len(row) <= i + 1, (name, i)
    # spot-check the known c nodes of the new high-order tableaus
    a6, _ = RK_TABLEAUS["rk6"]
    np.testing.assert_allclose(
        [sum(r) for r in a6], [1 / 3, 2 / 3, 1 / 3, 1 / 2, 1 / 2, 1], atol=1e-12
    )
    a7, _ = RK_TABLEAUS["rk7"]
    np.testing.assert_allclose(
        [sum(r) for r in a7],
        [2 / 27, 1 / 9, 1 / 6, 5 / 12, 1 / 2, 5 / 6, 1 / 6, 2 / 3, 1 / 3, 1],
        atol=1e-12,
    )


def test_rollout_shape_and_consistency():
    model = UnicycleModel()
    us = jnp.tile(jnp.array([[0.3, 0.1]]), (5, 1))
    xs = rollout(model.f, jnp.zeros(3), us, 0.2, method="rk4")
    assert xs.shape == (6, 3)
    x = jnp.zeros(3)
    for k in range(5):
        x = integrate(model.f, x, us[k], 0.2, method="rk4")
    np.testing.assert_allclose(np.asarray(xs[-1]), np.asarray(x), atol=1e-12)


# --------------------------------------------------------------------- #
# finite differences vs AD
# --------------------------------------------------------------------- #
def test_fd_jacobian_matches_ad():
    f = lambda x: jnp.array([jnp.sin(x[0]) * x[1], x[0] ** 2 + jnp.cos(x[1])])  # noqa: E731
    x = jnp.array([0.7, -0.3])
    J_ad = jax.jacfwd(f)(x)
    np.testing.assert_allclose(np.asarray(forward_jacobian(f, x)), np.asarray(J_ad), atol=1e-5)
    np.testing.assert_allclose(np.asarray(central_jacobian(f, x)), np.asarray(J_ad), atol=1e-8)


def test_fd_hessian_matches_ad():
    f = lambda x: jnp.sin(x[0]) * x[1] ** 2 + x[0] * x[1]  # noqa: E731
    x = jnp.array([0.4, 1.2])
    H_ad = jax.hessian(f)(x)
    np.testing.assert_allclose(np.asarray(central_hessian(f, x)), np.asarray(H_ad), atol=1e-4)


# --------------------------------------------------------------------- #
# Riccati / Lyapunov / Sylvester vs scipy
# --------------------------------------------------------------------- #
def _rand_system(seed, n=4, m=2):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(n, n)) * 0.5
    B = rng.normal(size=(n, m))
    Q = np.eye(n) * 2.0
    R = np.eye(m) * 1.5
    return A, B, Q, R


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_dare_matches_scipy(seed):
    from scipy.linalg import solve_discrete_are

    A, B, Q, R = _rand_system(seed)
    X = np.asarray(are_discrete(A, B, Q, R))
    X_ref = solve_discrete_are(A, B, Q, R)
    np.testing.assert_allclose(X, X_ref, atol=1e-8)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_care_matches_scipy(seed):
    from scipy.linalg import solve_continuous_are

    A, B, Q, R = _rand_system(seed)
    X = np.asarray(are_continuous(A, B, Q, R))
    X_ref = solve_continuous_are(A, B, Q, R)
    np.testing.assert_allclose(X, X_ref, atol=1e-7)


def test_lqr_gains_stabilize():
    A, B, Q, R = _rand_system(3)
    K = np.asarray(lqr_gain_discrete(A, B, Q, R))
    eig = np.linalg.eigvals(A - B @ K)
    assert np.max(np.abs(eig)) < 1.0
    Kc = np.asarray(lqr_gain_continuous(A, B, Q, R))
    eigc = np.linalg.eigvals(A - B @ Kc)
    assert np.max(eigc.real) < 0.0


def test_lyapunov_discrete_matches_scipy():
    from scipy.linalg import solve_discrete_lyapunov

    rng = np.random.default_rng(5)
    A = rng.normal(size=(4, 4)) * 0.4  # spectral radius < 1
    Q = np.eye(4)
    X = np.asarray(lyapunov_discrete(A, Q))
    np.testing.assert_allclose(X, solve_discrete_lyapunov(A, Q), atol=1e-9)


def test_lyapunov_continuous_residual():
    rng = np.random.default_rng(6)
    A = rng.normal(size=(4, 4)) - 3 * np.eye(4)  # Hurwitz
    Q = np.eye(4)
    X = np.asarray(lyapunov_continuous(A, Q))
    np.testing.assert_allclose(A @ X + X @ A.T + Q, 0.0, atol=1e-9)


def test_sylvester_residual():
    rng = np.random.default_rng(7)
    A = rng.normal(size=(3, 3)) - 2 * np.eye(3)
    B = rng.normal(size=(4, 4)) - 2 * np.eye(4)
    C = rng.normal(size=(3, 4))
    X = np.asarray(sylvester_continuous(A, B, C))
    np.testing.assert_allclose(A @ X + X @ B + C, 0.0, atol=1e-9)


def test_controllability_observability():
    A = np.array([[0.0, 1.0], [0.0, 0.0]])
    B = np.array([[0.0], [1.0]])
    C = np.array([[1.0, 0.0]])
    assert controllability_matrix(A, B).shape == (2, 2)
    assert bool(is_controllable(A, B))
    assert bool(is_observable(A, C))
    # uncontrollable: input in the nullspace direction only
    B2 = np.array([[1.0], [0.0]])
    assert not bool(is_controllable(A.T, B2 * 0 + np.array([[0.0], [0.0]])))


def test_batched_dare():
    systems = [_rand_system(s) for s in (8, 9)]
    A = jnp.stack([jnp.asarray(s[0]) for s in systems])
    B = jnp.stack([jnp.asarray(s[1]) for s in systems])
    Q = jnp.stack([jnp.asarray(s[2]) for s in systems])
    R = jnp.stack([jnp.asarray(s[3]) for s in systems])
    X = jax.vmap(are_discrete)(A, B, Q, R)
    from scipy.linalg import solve_discrete_are

    for b, s in enumerate(systems):
        np.testing.assert_allclose(np.asarray(X[b]), solve_discrete_are(*s), atol=1e-8)
