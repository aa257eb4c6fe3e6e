"""Cross-validation of the native C++ OCP core against the JAX kernels."""

import numpy as np
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
