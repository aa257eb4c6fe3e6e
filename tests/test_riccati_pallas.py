"""Fused Pallas Riccati kernel vs the XLA reference implementation.

Runs in Pallas interpreter mode on CPU (small sizes — the interpreter is
slow); the TPU-compiled path is exercised by bench.py and the quality runs.
"""

import numpy as np
import jax
import jax.numpy as jnp

from doa_mpc_tpu.ops.riccati import riccati_factorize, riccati_solve
from doa_mpc_tpu.ops.riccati_pallas import riccati_solve_fused


def test_fused_matches_xla_interpret():
    from test_riccati import _random_lqr
    rng = np.random.default_rng(0)
    Bt, N = 4, 3
    qs = [_random_lqr(rng, N=N) for _ in range(Bt)]
    A, B, Q, R, S, q, r, d, x0 = [
        np.stack([qq[i] for qq in qs]).astype(np.float32) for i in range(9)]

    def one(A_, B_, Q_, R_, S_, q_, r_, d_, x0_):
        fac = riccati_factorize(Q_, R_, S_, A_, B_, reg=1e-8)
        return riccati_solve(fac, q_, r_, d_, x0_)

    xr, ur, nr = jax.vmap(one)(*map(jnp.asarray, (A, B, Q, R, S, q, r, d, x0)))
    xf, uf, nf = riccati_solve_fused(
        *map(jnp.asarray, (Q, R, S, A, B, q, r, d, x0)),
        reg=1e-8, interpret=True)
    np.testing.assert_allclose(np.asarray(xf), np.asarray(xr), atol=5e-5)
    np.testing.assert_allclose(np.asarray(uf), np.asarray(ur), atol=5e-5)
    np.testing.assert_allclose(np.asarray(nf), np.asarray(nr), atol=5e-4)
