"""Closed-form small-matrix solves vs numpy (machine precision)."""

import jax.numpy as jnp
import numpy as np

from mpc_local_planner_tpu.ops.smallmat import inv2, inv3, solve2, solve3, solve_psd


def test_inv2_inv3_random():
    rng = np.random.default_rng(0)
    A2 = rng.normal(size=(64, 2, 2)) + 3 * np.eye(2)
    A3 = rng.normal(size=(64, 3, 3)) + 3 * np.eye(3)
    np.testing.assert_allclose(np.asarray(inv2(jnp.asarray(A2))), np.linalg.inv(A2), atol=1e-10)
    np.testing.assert_allclose(np.asarray(inv3(jnp.asarray(A3))), np.linalg.inv(A3), atol=1e-10)


def test_solve_vec_and_mat():
    rng = np.random.default_rng(1)
    A = rng.normal(size=(8, 3, 3)) + 3 * np.eye(3)
    b = rng.normal(size=(8, 3))
    B = rng.normal(size=(8, 3, 5))
    np.testing.assert_allclose(np.asarray(solve3(jnp.asarray(A), jnp.asarray(b))), np.linalg.solve(A, b[..., None])[..., 0], atol=1e-10)
    np.testing.assert_allclose(np.asarray(solve3(jnp.asarray(A), jnp.asarray(B))), np.linalg.solve(A, B), atol=1e-10)
    A2 = rng.normal(size=(8, 2, 2)) + 3 * np.eye(2)
    b2 = rng.normal(size=(8, 2))
    np.testing.assert_allclose(np.asarray(solve2(jnp.asarray(A2), jnp.asarray(b2))), np.linalg.solve(A2, b2[..., None])[..., 0], atol=1e-10)


def test_solve_psd_cholesky_path():
    rng = np.random.default_rng(2)
    X = rng.normal(size=(4, 6, 6))
    A = X @ np.swapaxes(X, -1, -2) + 6 * np.eye(6)
    b = rng.normal(size=(4, 6))
    np.testing.assert_allclose(
        np.asarray(solve_psd(jnp.asarray(A), jnp.asarray(b))), np.linalg.solve(A, b[..., None])[..., 0], atol=1e-8
    )
