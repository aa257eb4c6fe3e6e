"""Riccati sweep vs a dense KKT factorization of the same LQR."""

import numpy as np
import jax.numpy as jnp

from doa_mpc_tpu.ops.riccati import riccati_factorize, riccati_solve


def _random_lqr(rng, N=8, nx=5, nu=2):
    A = 0.9 * np.eye(nx) + 0.1 * rng.standard_normal((N, nx, nx))
    B = rng.standard_normal((N, nx, nu))
    Q = np.zeros((N + 1, nx, nx))
    for k in range(N + 1):
        G = rng.standard_normal((nx, nx))
        Q[k] = G @ G.T + 0.1 * np.eye(nx)
    R = np.zeros((N, nu, nu))
    for k in range(N):
        G = rng.standard_normal((nu, nu))
        R[k] = G @ G.T + 0.5 * np.eye(nu)
    S = 0.1 * rng.standard_normal((N, nu, nx))
    q = rng.standard_normal((N + 1, nx))
    r = rng.standard_normal((N, nu))
    d = rng.standard_normal((N, nx))
    x0 = rng.standard_normal(nx)
    return A, B, Q, R, S, q, r, d, x0


def _dense_solve(A, B, Q, R, S, q, r, d, x0):
    """Build the full KKT system in (x_1..x_N, u_0..u_{N-1}) and solve."""
    N, nx, nu = A.shape[0], A.shape[1], B.shape[2]
    nv = N * nx + N * nu

    def xi(k):  # x_k, k=1..N
        return slice((k - 1) * nx, k * nx)

    def ui(k):
        return slice(N * nx + k * nu, N * nx + (k + 1) * nu)

    H = np.zeros((nv, nv))
    g = np.zeros(nv)
    for k in range(1, N + 1):
        H[xi(k), xi(k)] += Q[k]
        g[xi(k)] += q[k]
    for k in range(N):
        H[ui(k), ui(k)] += R[k]
        g[ui(k)] += r[k]
        if k >= 1:
            H[ui(k), xi(k)] += S[k]
            H[xi(k), ui(k)] += S[k].T
    g[ui(0)] += S[0] @ x0

    # equality constraints: x_{k+1} - A x_k - B u_k = d_k
    C = np.zeros((N * nx, nv))
    b = np.zeros(N * nx)
    for k in range(N):
        rows = slice(k * nx, (k + 1) * nx)
        C[rows, xi(k + 1)] = np.eye(nx)
        C[rows, ui(k)] = -B[k]
        if k >= 1:
            C[rows, xi(k)] = -A[k]
            b[rows] = d[k]
        else:
            b[rows] = d[0] + A[0] @ x0
    KKT = np.block([[H, C.T], [C, np.zeros((N * nx, N * nx))]])
    rhs = np.concatenate([-g, b])
    sol = np.linalg.solve(KKT, rhs)
    xs = sol[: N * nx].reshape(N, nx)
    us = sol[N * nx: nv].reshape(N, nu)
    lam = sol[nv:].reshape(N, nx)
    return np.concatenate([x0[None], xs], 0), us, lam


def test_riccati_matches_dense_kkt():
    rng = np.random.default_rng(0)
    A, B, Q, R, S, q, r, d, x0 = _random_lqr(rng)
    fac = riccati_factorize(*map(jnp.asarray, (Q, R, S, A, B)))
    x, u, nu_dyn = riccati_solve(fac, jnp.asarray(q), jnp.asarray(r),
                                 jnp.asarray(d), jnp.asarray(x0))
    x_ref, u_ref, lam_ref = _dense_solve(A, B, Q, R, S, q, r, d, x0)
    np.testing.assert_allclose(np.asarray(x), x_ref, atol=1e-8)
    np.testing.assert_allclose(np.asarray(u), u_ref, atol=1e-8)
    # dense multiplier of row k satisfies our sign convention up to sign:
    # stationarity there: Q x_k + q_k + lam_{k-1} - A' lam_k = 0, same as ours
    np.testing.assert_allclose(np.asarray(nu_dyn), lam_ref, atol=1e-7)


def test_riccati_multiple_rhs_consistent():
    # factorize once, solve twice with different gradients: must equal
    # independent dense solves (Mehrotra reuse pattern).
    rng = np.random.default_rng(1)
    A, B, Q, R, S, q, r, d, x0 = _random_lqr(rng, N=5)
    fac = riccati_factorize(*map(jnp.asarray, (Q, R, S, A, B)))
    for seed in range(3):
        rng2 = np.random.default_rng(seed)
        q2 = rng2.standard_normal(q.shape)
        r2 = rng2.standard_normal(r.shape)
        x, u, _ = riccati_solve(fac, jnp.asarray(q2), jnp.asarray(r2),
                                jnp.asarray(d), jnp.asarray(x0))
        x_ref, u_ref, _ = _dense_solve(A, B, Q, R, S, q2, r2, d, x0)
        np.testing.assert_allclose(np.asarray(x), x_ref, atol=1e-8)
        np.testing.assert_allclose(np.asarray(u), u_ref, atol=1e-8)
