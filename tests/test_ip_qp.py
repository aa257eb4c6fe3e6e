"""Interior-point OCP-QP solver tests.

Validation strategy (the reference has no QP tests; HPIPM itself is the
oracle it trusts): (a) unconstrained problems must reproduce the plain
Riccati/LQR solution, (b) constrained problems are checked against
scipy.optimize SLSQP on the mathematically equivalent reduced problem
(soft slacks eliminated in closed form), and (c) KKT conditions of the
returned solution are verified directly.
"""

import numpy as np
import jax
import jax.numpy as jnp
import scipy.optimize

from doa_mpc_tpu.ops.ocp_qp import BIG_BOUND, IDXBX, OcpQp
from doa_mpc_tpu.ops.ip_qp import solve_ocp_qp
from doa_mpc_tpu.ops.riccati import riccati_factorize, riccati_solve


def _make_qp(rng, N=6, nx=5, nu=2, M=3, box=True, soft=True, seed_scale=1.0):
    A = 0.9 * np.eye(nx) + 0.05 * rng.standard_normal((N, nx, nx))
    B = 0.3 * rng.standard_normal((N, nx, nu))
    c = 0.1 * rng.standard_normal((N, nx))
    dx0 = 0.3 * rng.standard_normal(nx)
    Q = np.zeros((N + 1, nx, nx))
    for k in range(N + 1):
        G = rng.standard_normal((nx, nx))
        Q[k] = 0.5 * (G @ G.T) + 1.0 * np.eye(nx)
    R = np.zeros((N, nu, nu))
    for k in range(N):
        G = rng.standard_normal((nu, nu))
        R[k] = 0.5 * (G @ G.T) + 1.0 * np.eye(nu)
    S = np.zeros((N, nu, nx))
    q = seed_scale * rng.standard_normal((N + 1, nx))
    r = seed_scale * rng.standard_normal((N, nu))
    if box:
        lb_u = -0.4 * np.ones((N, nu))
        ub_u = 0.4 * np.ones((N, nu))
        lb_x = np.concatenate([
            -BIG_BOUND * np.ones((1, 4)),
            -1.5 * np.ones((N - 1, 4)),
            -BIG_BOUND * np.ones((1, 4))])
        ub_x = -lb_x
    else:
        lb_u = -BIG_BOUND * np.ones((N, nu))
        ub_u = BIG_BOUND * np.ones((N, nu))
        lb_x = -BIG_BOUND * np.ones((N + 1, 4))
        ub_x = BIG_BOUND * np.ones((N + 1, 4))
    C = np.zeros((N + 1, M, nx))
    hval = np.ones((N + 1, M))
    zl = np.zeros((N + 1, M))
    Zl = np.zeros((N + 1, M))
    if soft:
        C[:, :, :2] = rng.standard_normal((N + 1, M, 2))
        hval = 0.5 * rng.standard_normal((N + 1, M))
        zl = 10.0 * np.ones((N + 1, M))
        Zl = 20.0 * np.ones((N + 1, M))
    return OcpQp(*[jnp.asarray(v) for v in
                   (A, B, c, dx0, Q, q, R, r, S, lb_u, ub_u, lb_x, ub_x,
                    C, hval, zl, Zl)])


def _scipy_reference(qp: OcpQp):
    """Solve the reduced problem (soft slacks eliminated analytically:
    penalty(g) = zl*relu(-g) + 1/2*Zl*relu(-g)^2) with SLSQP."""
    qp = jax.tree.map(np.asarray, qp)
    N, nx, nu = qp.A.shape[0], qp.A.shape[1], qp.B.shape[2]
    nv = N * (nx + nu)

    def unpack(z):
        xs = z[: N * nx].reshape(N, nx)
        us = z[N * nx:].reshape(N, nu)
        x_full = np.concatenate([qp.dx0[None], xs], 0)
        return x_full, us

    # SLSQP is scale-sensitive: normalize the objective (minimizer unchanged)
    scale = max(1.0, float(np.max(qp.zl)), float(np.max(qp.Zl)))

    def fun(z):
        x, u = unpack(z)
        val = 0.0
        for k in range(N + 1):
            val += 0.5 * x[k] @ qp.Q[k] @ x[k] + qp.q[k] @ x[k]
        for k in range(N):
            val += 0.5 * u[k] @ qp.R[k] @ u[k] + qp.r[k] @ u[k]
            val += u[k] @ qp.S[k] @ x[k]
        g = qp.hval + np.einsum("kmi,ki->km", qp.C, x)
        v = np.maximum(0.0, -g)
        val += np.sum(qp.zl * v + 0.5 * qp.Zl * v * v)
        return val / scale

    def dyn(z):
        x, u = unpack(z)
        out = []
        for k in range(N):
            out.append(x[k + 1] - qp.A[k] @ x[k] - qp.B[k] @ u[k] - qp.c[k])
        return np.concatenate(out)

    idx = np.array(IDXBX)
    bounds = []
    for k in range(1, N + 1):
        for i in range(nx):
            j = np.where(idx == i)[0]
            if len(j):
                bounds.append((qp.lb_x[k, j[0]], qp.ub_x[k, j[0]]))
            else:
                bounds.append((-np.inf, np.inf))
    for k in range(N):
        for i in range(nu):
            bounds.append((qp.lb_u[k, i], qp.ub_u[k, i]))

    z0 = np.zeros(nv)
    res = scipy.optimize.minimize(
        fun, z0, jac=None, bounds=bounds,
        constraints=[{"type": "eq", "fun": dyn}],
        method="SLSQP", options={"maxiter": 400, "ftol": 1e-12})
    assert res.success, res.message
    x, u = unpack(res.x)
    return x, u


def test_unconstrained_matches_riccati():
    rng = np.random.default_rng(0)
    qp = _make_qp(rng, box=False, soft=False)
    sol = solve_ocp_qp(qp, iters=25)
    fac = riccati_factorize(qp.Q, qp.R, qp.S, qp.A, qp.B)
    x_ref, u_ref, _ = riccati_solve(fac, qp.q, qp.r, qp.c, qp.dx0)
    np.testing.assert_allclose(np.asarray(sol.du), np.asarray(u_ref), atol=2e-6)
    np.testing.assert_allclose(np.asarray(sol.dx), np.asarray(x_ref), atol=2e-6)


def test_box_constrained_matches_scipy():
    rng = np.random.default_rng(1)
    qp = _make_qp(rng, box=True, soft=False, seed_scale=3.0)
    sol = solve_ocp_qp(qp, iters=40)
    x_ref, u_ref = _scipy_reference(qp)
    # some u bounds must actually be active for this test to mean anything
    assert np.max(np.abs(np.asarray(u_ref))) > 0.4 - 1e-6
    np.testing.assert_allclose(np.asarray(sol.du), u_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sol.dx), np.asarray(x_ref), atol=1e-5)


def test_soft_constrained_matches_scipy():
    rng = np.random.default_rng(2)
    qp = _make_qp(rng, box=True, soft=True, seed_scale=2.0)
    sol = solve_ocp_qp(qp, iters=40)
    x_ref, u_ref = _scipy_reference(qp)
    g = np.asarray(qp.hval) + np.einsum("kmi,ki->km", np.asarray(qp.C),
                                        np.asarray(x_ref))
    assert np.min(g) < -1e-4  # at least one soft constraint is violated
    np.testing.assert_allclose(np.asarray(sol.du), u_ref, atol=2e-5)
    np.testing.assert_allclose(np.asarray(sol.dx), x_ref, atol=2e-5)


def test_huge_penalty_scaling():
    # reference-scale penalties (zl = Zl ~ 1e5, robot_ocp_problem.py:146)
    rng = np.random.default_rng(3)
    qp = _make_qp(rng, box=True, soft=True)
    qp = qp._replace(zl=qp.zl * 1e4, Zl=qp.Zl * 1e4)
    sol = solve_ocp_qp(qp, iters=60)
    x_ref, u_ref = _scipy_reference(qp)
    np.testing.assert_allclose(np.asarray(sol.du), u_ref, atol=5e-4)


def test_vmap_batching():
    rng = np.random.default_rng(4)
    qps = [_make_qp(rng, seed_scale=2.0) for _ in range(4)]
    batched = jax.tree.map(lambda *xs: jnp.stack(xs), *qps)
    sols = jax.vmap(lambda qp: solve_ocp_qp(qp, iters=30))(batched)
    for i, qp in enumerate(qps):
        ref = solve_ocp_qp(qp, iters=30)
        np.testing.assert_allclose(np.asarray(sols.du[i]), np.asarray(ref.du),
                                   atol=1e-9)


def test_native_batch_axis_matches_vmap():
    # the explicit batched path (one leading axis, per-row mu/alpha/freeze)
    # must agree with vmapping the single-scenario solver
    rng = np.random.default_rng(6)
    qps = [_make_qp(rng, seed_scale=2.0) for _ in range(4)]
    batched = jax.tree.map(lambda *xs: jnp.stack(xs), *qps)
    sol_b = solve_ocp_qp(batched, iters=30)
    sol_v = jax.vmap(lambda qp: solve_ocp_qp(qp, iters=30))(batched)
    np.testing.assert_allclose(np.asarray(sol_b.du), np.asarray(sol_v.du),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(sol_b.dx), np.asarray(sol_v.dx),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(sol_b.mu), np.asarray(sol_v.mu),
                               rtol=1e-6)


def test_converges_small_mu():
    rng = np.random.default_rng(5)
    qp = _make_qp(rng, seed_scale=2.0)
    sol = solve_ocp_qp(qp, iters=40)
    assert float(sol.mu) < 1e-9
    assert float(sol.stat_res) < 1e-7
