"""Fused Pallas TPU kernel: block-tridiagonal Riccati factorize + solve.

This is the speed-of-light path for the QP solver's inner linear algebra.
The pure-XLA implementation (``ops/riccati.py``) lowers each ``lax.scan``
stage to separate tiny batched kernels — ~60 sequential launches per
interior-point iteration, each streaming the whole batch through HBM. Here
the entire backward factorization, backward gradient pass, and forward
rollout run in ONE kernel per batch tile: stage matrices live in vector
registers / VMEM scratch, and HBM is touched once for input and once for
output.

Layout: batch-last ("batch-major lanes"). Every operand is shaped
``(stages, flattened_matrix, B)`` so the TPU lane dimension is the batch and
each (i, j) matrix element is one ``(TILE,)`` vector; the 5x5/2x2 stage
algebra unrolls into elementwise VPU ops over the tile. The per-problem
matrices are far below MXU size (nx=5, nu=2) — the batch dimension IS the
compute axis. (This is also why the reference's HPIPM/BLASFEO panel-BLAS
approach has no TPU analogue: there is nothing to panel; SURVEY.md N2-N3.)

Semantics match ``riccati_factorize`` + ``riccati_solve`` exactly (tested
against them, and transitively against the dense-KKT oracle).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# small-matrix helpers over "matrix = list[list[(TILE,) vector]]"
# ---------------------------------------------------------------------------

def _mat(ref, k, rows, cols):
    """Load a (rows x cols) stage matrix from ref[k] (flattened row-major)."""
    return [[ref[k, i * cols + j] for j in range(cols)] for i in range(rows)]


def _vec(ref, k, n):
    return [ref[k, i] for i in range(n)]


def _store_vec(ref, k, v):
    for i, vi in enumerate(v):
        ref[k, i] = vi


def _store_mat(ref, k, A):
    cols = len(A[0])
    for i, row in enumerate(A):
        for j, a in enumerate(row):
            ref[k, i * cols + j] = a


def _mm(A, B):
    """(m x k) @ (k x n) -> (m x n), elementwise over the batch tile."""
    k, n = len(B), len(B[0])
    return [[sum(Ai[l] * B[l][j] for l in range(k)) for j in range(n)]
            for Ai in A]


def _mt(A):
    return [[A[j][i] for j in range(len(A))] for i in range(len(A[0]))]


def _mv(A, x):
    return [sum(Ai[j] * x[j] for j in range(len(x))) for Ai in A]


def _madd(A, B):
    return [[a + b for a, b in zip(ra, rb)] for ra, rb in zip(A, B)]


def _vadd(x, y):
    return [a + b for a, b in zip(x, y)]


def _chol2(H, reg):
    """Cholesky of a batched 2x2 SPD matrix -> (l11, l21, l22)."""
    l11 = jnp.sqrt(H[0][0] + reg)
    l21 = H[1][0] / l11
    l22 = jnp.sqrt(jnp.maximum(H[1][1] + reg - l21 * l21, 1e-30))
    return l11, l21, l22


def _chol2_solve(L, b):
    """Solve (L L') x = b for the 2x2 factor L = (l11, l21, l22)."""
    l11, l21, l22 = L
    y1 = b[0] / l11
    y2 = (b[1] - l21 * y1) / l22
    x2 = y2 / l22
    x1 = (y1 - l21 * x2) / l11
    return [x1, x2]


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------

def _riccati_kernel(nx, nu, N, reg,
                    Q_ref, R_ref, S_ref, A_ref, B_ref,
                    q_ref, r_ref, d_ref, x0_ref,
                    dx_ref, du_ref, nu_ref,
                    P_s, K_s, kff_s, pn_s):
    """Backward factorize + gradient pass, then forward rollout.

    Scratch: P_s (N, nx*nx) stores P_{k+1} per stage k; K_s (N, nu*nx);
    kff_s (N, nu); pn_s (N, nx) stores p_{k+1}. All x batch tile.
    """
    # ---- backward -------------------------------------------------------
    P = _mat(Q_ref, N, nx, nx)                     # P_N = Q_N
    p = _vec(q_ref, N, nx)                         # p_N = q_N

    for k in range(N - 1, -1, -1):
        _store_mat(P_s, k, P)                      # P_{k+1}
        _store_vec(pn_s, k, p)                     # p_{k+1}
        Ak = _mat(A_ref, k, nx, nx)
        Bk = _mat(B_ref, k, nx, nu)
        Qk = _mat(Q_ref, k, nx, nx)
        Rk = _mat(R_ref, k, nu, nu)
        Sk = _mat(S_ref, k, nu, nx)
        qk = _vec(q_ref, k, nx)
        rk = _vec(r_ref, k, nu)
        dk = _vec(d_ref, k, nx)

        PB = _mm(P, Bk)                            # (nx, nu)
        PA = _mm(P, Ak)                            # (nx, nx)
        BT = _mt(Bk)
        Huu = _madd(Rk, _mm(BT, PB))               # (nu, nu)
        Hux = _madd(Sk, _mm(BT, PA))               # (nu, nx)
        L = _chol2(Huu, reg)
        Kk = [[None] * nx for _ in range(nu)]
        for j in range(nx):
            col = _chol2_solve(L, [Hux[0][j], Hux[1][j]])
            Kk[0][j] = -col[0]
            Kk[1][j] = -col[1]
        _store_mat(K_s, k, Kk)

        Pd_p = _vadd(_mv(P, dk), p)                # P_{k+1} d_k + p_{k+1}
        m = _vadd(rk, _mv(BT, Pd_p))
        kff = [-v for v in _chol2_solve(L, m)]
        _store_vec(kff_s, k, kff)

        AT = _mt(Ak)
        Pk = _madd(Qk, _madd(_mm(AT, PA), _mm(_mt(Hux), Kk)))
        # symmetrize: keeps the unrolled recursion stable in f32
        P = [[0.5 * (Pk[i][j] + Pk[j][i]) for j in range(nx)]
             for i in range(nx)]
        p = _vadd(qk, _vadd(_mv(AT, Pd_p), _mv(_mt(Kk), m)))

    # ---- forward rollout + costate -------------------------------------
    x = _vec(x0_ref, 0, nx)
    _store_vec(dx_ref, 0, x)
    for k in range(N):
        Ak = _mat(A_ref, k, nx, nx)
        Bk = _mat(B_ref, k, nx, nu)
        dk = _vec(d_ref, k, nx)
        Kk = _mat(K_s, k, nu, nx)
        kff = _vec(kff_s, k, nu)
        u = _vadd(_mv(Kk, x), kff)
        _store_vec(du_ref, k, u)
        x = _vadd(_vadd(_mv(Ak, x), _mv(Bk, u)), dk)
        _store_vec(dx_ref, k + 1, x)
        # nu_k = -(P_{k+1} x_{k+1} + p_{k+1})
        Pk1 = _mat(P_s, k, nx, nx)
        pk1 = _vec(pn_s, k, nx)
        nu_k = [-(v + w) for v, w in zip(_mv(Pk1, x), pk1)]
        _store_vec(nu_ref, k, nu_k)


def _round_up(x, m):
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("nx", "nu", "N", "tile", "reg",
                                             "interpret"))
def _riccati_pallas_batchlast(Qf, Rf, Sf, Af, Bf, qf, rf, df, x0f,
                              nx, nu, N, tile, reg, interpret=False):
    Bt = Qf.shape[-1]
    grid = (Bt // tile,)
    dtype = Qf.dtype

    def spec(stages, width):
        return pl.BlockSpec((stages, width, tile),
                            lambda b: (0, 0, b),
                            memory_space=pltpu.VMEM)

    out_shapes = (
        jax.ShapeDtypeStruct((N + 1, nx, Bt), dtype),   # dx
        jax.ShapeDtypeStruct((N, nu, Bt), dtype),       # du
        jax.ShapeDtypeStruct((N, nx, Bt), dtype),       # nu_dyn
    )
    kernel = functools.partial(_riccati_kernel, nx, nu, N, reg)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            spec(N + 1, nx * nx),   # Q
            spec(N, nu * nu),       # R
            spec(N, nu * nx),       # S
            spec(N, nx * nx),       # A
            spec(N, nx * nu),       # B
            spec(N + 1, nx),        # q
            spec(N, nu),            # r
            spec(N, nx),            # d
            spec(1, nx),            # x0
        ],
        out_specs=(spec(N + 1, nx), spec(N, nu), spec(N, nx)),
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((N, nx * nx, tile), dtype),
            pltpu.VMEM((N, nu * nx, tile), dtype),
            pltpu.VMEM((N, nu, tile), dtype),
            pltpu.VMEM((N, nx, tile), dtype),
        ],
        interpret=interpret,
    )(Qf, Rf, Sf, Af, Bf, qf, rf, df, x0f)


def riccati_solve_fused(Q, R, S, A, B, q, r, d, x0, reg: float = 1e-8,
                        tile: int = 128, interpret: bool = False):
    """Batched fused Riccati solve (batch-FIRST interface).

    Q (Bt, N+1, nx, nx), R (Bt, N, nu, nu), S (Bt, N, nu, nx),
    A (Bt, N, nx, nx), B (Bt, N, nx, nu), q (Bt, N+1, nx), r (Bt, N, nu),
    d (Bt, N, nx), x0 (Bt, nx)
    -> (x (Bt, N+1, nx), u (Bt, N, nu), nu_dyn (Bt, N, nx)),
    identical to ``vmap(lambda ...: riccati_solve(riccati_factorize(...)))``.
    """
    Bt = Q.shape[0]
    nx = Q.shape[-1]
    N = A.shape[1]
    nu = B.shape[-1]
    pad = _round_up(max(Bt, tile), tile) - Bt

    def prep(arr, flat):
        a = arr.reshape(arr.shape[:2] + (flat,))
        a = jnp.moveaxis(a, 0, -1)
        if pad:
            a = jnp.pad(a, ((0, 0), (0, 0), (0, pad)), constant_values=1.0)
        return a

    args = (prep(Q, nx * nx), prep(R, nu * nu), prep(S, nu * nx),
            prep(A, nx * nx), prep(B, nx * nu), prep(q, nx), prep(r, nu),
            prep(d, nx), prep(x0[:, None, :], nx))
    dx, du, nud = _riccati_pallas_batchlast(
        *args, nx=nx, nu=nu, N=N, tile=tile, reg=reg, interpret=interpret)

    def unprep(a):
        return jnp.moveaxis(a, -1, 0)[:Bt]

    return unprep(dx), unprep(du), unprep(nud)
