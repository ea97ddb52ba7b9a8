"""Horizon-parallel (associative-scan) Riccati vs the sequential sweep.

The parallel form must reproduce the sequential solution exactly on convex
(PSD stage Hessian) data — which the SQP guarantees by construction
(hybrid exact/GN Hessians are PSD; Huu gets the Levenberg reg).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_local_planner_tpu.solvers.riccati import lqr_solve
from mpc_local_planner_tpu.solvers.riccati_pscan import lqr_solve_pscan

NX, NU = 3, 2
NA = NX + NU + 1


def _psd_qp(seed, N):
    rng = np.random.default_rng(seed)
    nw = NA + NU
    mk = lambda *s: jnp.asarray(rng.normal(size=s))  # noqa: E731
    Fz = mk(N, NA, NA) * 0.3 + jnp.eye(NA) * 0.8
    Gz = mk(N, NA, NU)
    rz = mk(N, NA) * 0.1
    X = mk(N, nw, nw)
    Hfull = jnp.einsum("nij,nkj->nik", X, X) * 0.2 + jnp.eye(nw)[None] * 0.5
    Hzz, Hzu, Huu = Hfull[:, :NA, :NA], Hfull[:, :NA, NA:], Hfull[:, NA:, NA:]
    hz, hu = mk(N, NA), mk(N, NU)
    Y = mk(NA, NA)
    PN = Y @ Y.T * 0.2 + jnp.eye(NA)
    pN = mk(NA)
    return Fz, Gz, rz, Hzz, Hzu, Huu, hz, hu, PN, pN


@pytest.mark.parametrize("free_tau", [True, False])
@pytest.mark.parametrize("N", [1, 2, 7, 30])
def test_pscan_matches_sequential(N, free_tau):
    qp = _psd_qp(0, N)
    reg = jnp.asarray(1e-3)
    a = lqr_solve(*qp, reg, nx=NX, free_tau=free_tau)
    b = lqr_solve_pscan(*qp, reg, nx=NX, free_tau=free_tau)
    np.testing.assert_allclose(np.asarray(b.dxs), np.asarray(a.dxs), atol=1e-9)
    np.testing.assert_allclose(np.asarray(b.dus), np.asarray(a.dus), atol=1e-9)
    np.testing.assert_allclose(float(b.dtau), float(a.dtau), atol=1e-9)


def test_pscan_batched_vmap():
    qps = [_psd_qp(s, 6) for s in (1, 2, 3)]
    args = [jnp.stack([q[i] for q in qps]) for i in range(10)]
    reg = jnp.full((3,), 1e-3)
    b = jax.vmap(lambda *a: lqr_solve_pscan(*a, nx=NX, free_tau=True))(*args, reg)
    for i, q in enumerate(qps):
        a = lqr_solve(*q, jnp.asarray(1e-3), nx=NX, free_tau=True)
        np.testing.assert_allclose(np.asarray(b.dxs[i]), np.asarray(a.dxs), atol=1e-9)
