"""Riccati sweep vs dense KKT: the structured solve must be exact.

Mirrors the reference's hypergraph-NLP tests (SURVEY.md §5:
test_hyper_graph_optimization_problem — graph → NLP Jacobian correctness on
small problems), transposed to the dense batched build: the LQR sweep must
reproduce the dense equality-constrained QP solution to machine precision.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_local_planner_tpu.solvers.riccati import (
    build_augmented_transition,
    lqr_solve,
)

NX, NU, N = 3, 2, 6
NA = NX + NU + 1


def _random_qp(seed, free_tau):
    rng = np.random.default_rng(seed)
    F = rng.normal(size=(N, NX, NX)) * 0.4 + np.eye(NX)
    G = rng.normal(size=(N, NX, NU)) * 0.5
    m = rng.normal(size=(N, NX)) * (0.5 if free_tau else 0.0)
    r = rng.normal(size=(N, NX)) * 0.3

    Hzz = np.zeros((N, NA, NA))
    Hzu = rng.normal(size=(N, NA, NU)) * 0.1
    Huu = np.zeros((N, NU, NU))
    for k in range(N):
        Az = rng.normal(size=(NA, NA))
        Hzz[k] = Az @ Az.T + 0.5 * np.eye(NA)
        Au = rng.normal(size=(NU, NU))
        Huu[k] = Au @ Au.T + 0.5 * np.eye(NU)
    hz = rng.normal(size=(N, NA))
    hu = rng.normal(size=(N, NU))
    At = rng.normal(size=(NA, NA))
    PN = At @ At.T + 0.5 * np.eye(NA)
    pN = rng.normal(size=(NA,))
    return F, G, m, r, Hzz, Hzu, Huu, hz, hu, PN, pN


def _dense_solution(F, G, m, r, Hzz, Hzu, Huu, hz, hu, PN, pN, free_tau):
    """Solve the same QP densely: w = [x_1..x_N, u_0..u_{N-1}, tau]."""
    nw = N * NX + N * NU + 1
    ix = lambda k: slice((k - 1) * NX, k * NX)  # x_k for k >= 1  # noqa: E731
    iu = lambda k: slice(N * NX + k * NU, N * NX + (k + 1) * NU)  # noqa: E731
    itau = nw - 1

    H = np.zeros((nw, nw))
    g = np.zeros(nw)

    def add_quad(idx_lists, Hblk, gblk):
        # idx_lists: list of (global index array, local index array)
        for gi, li in idx_lists:
            g[gi] += gblk[li]
            for gj, lj in idx_lists:
                H[np.ix_(gi, gj)] += Hblk[np.ix_(li, lj)]

    for k in range(N + 1):
        # z_k = (x_k, u_{k-1}, tau); local order [0:3 x, 3:5 up, 5 tau], u local [5+..]
        zparts = []
        if k >= 1:
            zparts.append((np.arange(ix(k).start, ix(k).stop), np.arange(NX)))
        if k >= 1:
            zparts.append((np.arange(iu(k - 1).start, iu(k - 1).stop), np.arange(NX, NX + NU)))
        zparts.append((np.array([itau]), np.array([NX + NU])))
        if k < N:
            uparts = [(np.arange(iu(k).start, iu(k).stop), np.arange(NA, NA + NU))]
            Hfull = np.zeros((NA + NU, NA + NU))
            Hfull[:NA, :NA] = Hzz[k]
            Hfull[:NA, NA:] = Hzu[k]
            Hfull[NA:, :NA] = Hzu[k].T
            Hfull[NA:, NA:] = Huu[k]
            gfull = np.concatenate([hz[k], hu[k]])
            add_quad(zparts + uparts, Hfull, gfull)
        else:
            add_quad(zparts, PN, pN)

    # equalities: x_{k+1} = F x_k + G u_k + m tau + r, x_0 = 0
    A = np.zeros((N * NX, nw))
    b = np.zeros(N * NX)
    for k in range(N):
        rows = slice(k * NX, (k + 1) * NX)
        A[rows, ix(k + 1)] = -np.eye(NX)
        if k >= 1:
            A[rows, ix(k)] = F[k]
        A[rows, iu(k)] = G[k]
        A[rows, itau] = m[k]
        b[rows] = -r[k]

    if not free_tau:
        # pin tau with an extra equality row
        A = np.vstack([A, np.eye(nw)[itau][None]])
        b = np.concatenate([b, [0.0]])

    ne = A.shape[0]
    KKT = np.block([[H, A.T], [A, np.zeros((ne, ne))]])
    rhs = np.concatenate([-g, b])
    sol = np.linalg.solve(KKT, rhs)
    w = sol[:nw]
    xs = np.concatenate([np.zeros((1, NX)), w[: N * NX].reshape(N, NX)])
    us = w[N * NX : N * NX + N * NU].reshape(N, NU)
    return xs, us, w[itau]


@pytest.mark.parametrize("free_tau", [False, True])
@pytest.mark.parametrize("seed", [0, 1])
def test_lqr_matches_dense_kkt(seed, free_tau):
    F, G, m, r, Hzz, Hzu, Huu, hz, hu, PN, pN = _random_qp(seed, free_tau)
    Fz, Gz, rz = build_augmented_transition(
        jnp.asarray(F), jnp.asarray(G), jnp.asarray(m), jnp.asarray(r), nu=NU
    )
    step = lqr_solve(
        Fz, Gz, rz,
        jnp.asarray(Hzz), jnp.asarray(Hzu), jnp.asarray(Huu),
        jnp.asarray(hz), jnp.asarray(hu), jnp.asarray(PN), jnp.asarray(pN),
        jnp.asarray(0.0), nx=NX, free_tau=free_tau,
    )
    xs_d, us_d, tau_d = _dense_solution(F, G, m, r, Hzz, Hzu, Huu, hz, hu, PN, pN, free_tau)
    np.testing.assert_allclose(np.asarray(step.dxs), xs_d, atol=1e-8)
    np.testing.assert_allclose(np.asarray(step.dus), us_d, atol=1e-8)
    np.testing.assert_allclose(float(step.dtau), tau_d, atol=1e-8)


def test_lqr_batches_under_vmap():
    qps = [_random_qp(s, True) for s in (3, 4)]
    args = [jnp.stack([jnp.asarray(q[i]) for q in qps]) for i in range(11)]
    Fz, Gz, rz = jax.vmap(lambda F, G, m, r: build_augmented_transition(F, G, m, r, nu=NU))(
        args[0], args[1], args[2], args[3]
    )
    step = jax.vmap(
        lambda *a: lqr_solve(*a, jnp.asarray(0.0), nx=NX, free_tau=True)
    )(Fz, Gz, rz, *args[4:])
    for b, q in enumerate(qps):
        xs_d, us_d, tau_d = _dense_solution(*q, True)
        np.testing.assert_allclose(np.asarray(step.dxs[b]), xs_d, atol=1e-8)
        np.testing.assert_allclose(float(step.dtau[b]), tau_d, atol=1e-8)
