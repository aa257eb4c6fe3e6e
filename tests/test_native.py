"""Cross-validation of the native C++ OCP core against the JAX kernels."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from doa_mpc_tpu import native
from doa_mpc_tpu.models.unicycle import dynamics
from doa_mpc_tpu.ops.integrators import irk_step, rk4_step
from doa_mpc_tpu.ops.riccati import riccati_factorize, riccati_solve

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def test_native_riccati_matches_jax():
    from test_riccati import _random_lqr
    rng = np.random.default_rng(7)
    A, B, Q, R, S, q, r, d, x0 = _random_lqr(rng, N=12)
    fac = riccati_factorize(*map(jnp.asarray, (Q, R, S, A, B)))
    xj, uj, _ = riccati_solve(fac, jnp.asarray(q), jnp.asarray(r),
                              jnp.asarray(d), jnp.asarray(x0))
    xc, uc = native.riccati_solve(Q, q, R, r, S, A, B, d, x0)
    np.testing.assert_allclose(xc, np.asarray(xj), atol=1e-9)
    np.testing.assert_allclose(uc, np.asarray(uj), atol=1e-9)


def test_native_rk4_matches_jax():
    x = np.array([0.3, -0.7, 1.2, 2.5, 0.4])
    u = np.array([1.3, -0.8])
    got = native.rk4_step(x, u, 0.1)
    ref = rk4_step(dynamics, jnp.asarray(x), jnp.asarray(u), 0.1)
    np.testing.assert_allclose(got, np.asarray(ref), atol=1e-14)


def test_native_irk3_matches_jax():
    x = np.array([0.3, -0.7, 1.2, 2.5, 0.4])
    u = np.array([1.3, -0.8])
    got = native.irk3_step(x, u, 0.1, iters=30)
    ref = irk_step(dynamics, jnp.asarray(x), jnp.asarray(u), 0.1,
                   stages=3, newton_iter=10, tableau="radau_iia")
    np.testing.assert_allclose(got, np.asarray(ref), atol=1e-10)


def test_native_ip_matches_jax_f64():
    """The native soft-constrained interior point is the production QP:
    cross-check the full solve (box + slacked obstacle constraints) against
    the f64 JAX solver on random QPs — same algorithm, independent
    implementation."""
    from test_ip_qp import _make_qp
    from doa_mpc_tpu.ops.ip_qp import solve_ocp_qp
    from doa_mpc_tpu.ops.ocp_qp import IDXBX

    rng = np.random.default_rng(11)
    for seed_scale in (1.0, 3.0):
        qp = _make_qp(rng, N=10, seed_scale=seed_scale)
        qp64 = jax.tree.map(lambda a: jnp.asarray(a, jnp.float64), qp)
        ref = solve_ocp_qp(qp64, iters=60)
        dx, du, s, mu, stat, used = native.ip_solve(
            jax.tree.map(np.asarray, qp64), IDXBX, iters=60)
        assert used > 0
        assert mu < 1e-9
        np.testing.assert_allclose(dx, np.asarray(ref.dx), atol=1e-7)
        np.testing.assert_allclose(du, np.asarray(ref.du), atol=1e-7)
        np.testing.assert_allclose(s, np.asarray(ref.s), atol=1e-7)


def test_native_ip_solves_production_qp():
    """End-to-end: a QP built by the real controller (build_qp) solved by
    the native CPU runtime reaches interior-point optimality."""
    from doa_mpc_tpu.config import SolverOptions, WorldSpec, default_cost_params
    from doa_mpc_tpu.ops.ip_qp import solve_ocp_qp
    from doa_mpc_tpu.ops.ocp_qp import IDXBX
    from doa_mpc_tpu.sim.closed_loop import init_loop_state
    from doa_mpc_tpu.sim.obstacles import predict_trajectory, robot_start_goal
    from doa_mpc_tpu.solver.sqp_rti import make_rti_controller

    spec = WorldSpec(tf=2.0, n_solv=20, qp_iter=50)
    opts = SolverOptions(qp_iter=50, integrator="rk4")
    ctrl = make_rti_controller(spec, opts, dtype=jnp.float64)
    params = default_cost_params(spec, dtype=jnp.float64)
    start, goal = robot_start_goal(spec)
    st = init_loop_state(jax.random.PRNGKey(5), ctrl,
                         jnp.asarray(start, jnp.float64), goal, "RANDOM")
    pred = predict_trajectory(st.obst, spec, spec.n_solv)
    qp = ctrl.build_qp(st.rti, st.x0, goal, pred, params)
    ref = solve_ocp_qp(qp, iters=50)
    dx, du, s, mu, stat, used = native.ip_solve(
        jax.tree.map(np.asarray, qp), IDXBX, iters=50)
    assert used > 0
    assert mu < 1e-8
    np.testing.assert_allclose(du, np.asarray(ref.du), atol=1e-6)
