"""Fully-fused Pallas TPU kernel: the ENTIRE interior-point solve per launch.

The batch-native XLA interior-point loop (``ops/ip_qp.py``) spends ~6 ms per
iteration on ~400 tiny elementwise kernel dispatches. The first fused design
(one kernel launch per IP iteration, kept in git history) removed the
dispatch overhead but still round-tripped the full IP state through HBM
every iteration and — because every stage loop was Python-unrolled — its
compile time and live-register stack grew with the horizon, which capped it
at N<=28 / M<=6 on a 16 MB-VMEM core (TPU v5e).

This kernel goes the rest of the way: ONE launch per batch tile runs
initialization plus ALL Mehrotra iterations — residuals, barrier sigmas,
condensed stage Hessians, Riccati factorization (shared by predictor and
corrector), predictor back-substitution + recovery, affine step lengths +
centering, corrector back-substitution + recovery, fraction-to-boundary and
the masked state update. Consequences:

- QP data is read from HBM once per tile (not once per iteration) and the
  IP state never leaves VMEM — per-solve HBM traffic drops ~20x.
- Every loop over stages or iterations is a ``lax.fori_loop``, so compiled
  code size and the live SSA set are O(1) in the horizon; N=40/M=8 (the
  reference's largest sweep point, ``run_multiple_experiments.py:5``)
  compiles in seconds and fits VMEM.
- The per-stage small-matrix algebra (nx=5, nu=2) stays Python-unrolled
  into elementwise VPU ops — that part is O(stage-size), not O(horizon).

Layout: batch-last ("batch-major lanes"), as in ``ops/riccati_pallas.py`` —
operands are ``(stages, packed_width, B)`` with the batch on the lane axis;
every matrix element is one ``(TILE,)`` vector and all per-scenario
reductions (duality measure, step lengths) are lane-wise — no cross-lane
traffic. All per-stage quantities are packed along the sublane axis via
explicit field layouts (``_Layout``) so nothing pays per-array 8-sublane
padding; that packing is what fits N=40/M=8 in 16 MB.

Semantics track ``ops/ip_qp.solve_ocp_qp`` (same initialization,
eliminations, safeguards, masked convergence freeze); the equivalence test
runs both at f32. One intentional algebraic reassociation: the predictor's
``mu_aff`` is accumulated as  sum(t*l) + ap*S1 + ad*S2 + ap*ad*S3  with
S1=sum(dt*l), S2=sum(t*dl), S3=sum(dt*dl) collected during the affine
recovery pass — exactly equal in real arithmetic to the XLA solver's
post-step sum, differing only in f32 rounding. Only the elementwise
products dt*dl (needed by the corrector betas) are stored, halving the
affine scratch.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from doa_mpc_tpu.ops.ocp_qp import IDXBX, OcpQp, normalize_cost
from doa_mpc_tpu.ops.riccati_pallas import _round_up

_T_FLOOR = 1e-12
_ZL_FLOOR = 1e-6


# ---------------------------------------------------------------------------
# QP structure declaration (trace-time specialization)
# ---------------------------------------------------------------------------

class QpStructure(NamedTuple):
    """Static structure guarantees about the QP data, exploited at trace
    time: structurally-zero/unit entries are never packed, DMA'd, or
    multiplied — the kernel's small-matrix algebra folds them away via the
    symbolic-zero helpers below. One kernel body serves every structure.

    For the unicycle + circular obstacles + LINEAR_LS model family
    (``solver/sqp_rti.build_qp``) this drops the packed QP width ~45%:
    Q/R are diagonal, S == 0, the obstacle-constraint Jacobian C only has
    (x, y) columns, the dynamics Jacobian A has exact identity x/y columns
    (the vector field does not depend on position), and Zl == zl.
    """

    q_diag: bool = False           # Q is diagonal -> pack nx, not nx^2
    r_diag: bool = False           # R is diagonal -> pack nu, not nu^2
    s_zero: bool = False           # S == 0 -> not packed at all
    c_cols: tuple | None = None    # C's (possibly) nonzero columns
    a_unit_cols: tuple = ()        # columns j with A[:, j] == e_j exactly
    zl_eq_zl2: bool = False        # Zl == zl -> pack once

    @property
    def a_cols(self):
        return self.a_unit_cols


GENERIC_STRUCTURE = QpStructure()


# ---------------------------------------------------------------------------
# symbolic-zero small-matrix algebra
#
# Entries are either traced (sb, 128) vectors or Python floats standing for
# compile-time constants (0.0 / 1.0 from the declared structure). Zero and
# unit terms vanish at trace time, so the same kernel algebra specializes
# itself to whatever structure the caller declared.
# ---------------------------------------------------------------------------

def _is0(a):
    return isinstance(a, (int, float)) and a == 0.0


def _is1(a):
    return isinstance(a, (int, float)) and a == 1.0


def _smul(a, b):
    if _is0(a) or _is0(b):
        return 0.0
    if _is1(a):
        return b
    if _is1(b):
        return a
    return a * b


def _sadd(a, b):
    if _is0(a):
        return b
    if _is0(b):
        return a
    return a + b


def _ssub(a, b):
    if _is0(b):
        return a
    if _is0(a):
        return -b
    return a - b


def _mm(A, B):
    k, n = len(B), len(B[0])
    out = []
    for Ai in A:
        row = []
        for j in range(n):
            acc = 0.0
            for l in range(k):
                acc = _sadd(acc, _smul(Ai[l], B[l][j]))
            row.append(acc)
        out.append(row)
    return out


def _mt(A):
    return [[A[j][i] for j in range(len(A))] for i in range(len(A[0]))]


def _mv(A, x):
    out = []
    for Ai in A:
        acc = 0.0
        for j in range(len(x)):
            acc = _sadd(acc, _smul(Ai[j], x[j]))
        out.append(acc)
    return out


def _madd(A, B):
    return [[_sadd(a, b) for a, b in zip(ra, rb)] for ra, rb in zip(A, B)]


def _vadd(x, y):
    return [_sadd(a, b) for a, b in zip(x, y)]


# ---------------------------------------------------------------------------
# packed sublane layouts
# ---------------------------------------------------------------------------

class _Layout:
    """Field name -> sublane offset map for one packed (stages, W, B) array."""

    def __init__(self, *fields):
        self.o = {}
        w = 0
        for name, width in fields:
            self.o[name] = w
            w += width
        self.width = w


def _layouts(nx, nu, M, nbx, st=None):
    """Packed-field layouts.

    Round-4 footprint design (each item cuts VMEM with zero precision loss;
    together they fit ``sublane_batch=8`` at N=20/M=5 in ~14.4 MB):

    - QP data is split into an (N+1)-stage array (cost/constraint fields)
      and an N-stage array (dynamics/control fields) so N-stage fields no
      longer pay an extra padded stage, and ``dx0`` is its own tiny input
      instead of a full stage-width column.
    - The Riccati value matrix P is stored as its upper triangle
      (nx*(nx+1)/2 instead of nx^2) — it is symmetric by construction.
    - Only the stationarity residual ``rx`` is stored; every other residual
      (box/soft/control) is stage-local in the state and recomputed on use
      (a handful of VPU ops against a ~2 MB scratch array).
    - The affine pass stores the affine (dx, du) per stage ("ax"/"au");
      the corrector's dt*dl pair products are recomputed from them via the
      exact same delta formulas, which is bit-identical to storing the
      products (same operands, same ops) at a third of the width.
    """
    st = st or GENERIC_STRUCTURE
    ntri = nu * (nu + 1) // 2
    ncc = len(st.c_cols) if st.c_cols is not None else nx
    na = nx - len(st.a_unit_cols)
    xfields = [
        ("Q", nx if st.q_diag else nx * nx), ("q", nx), ("C", M * ncc),
        ("h", M), ("zl", M)]
    if not st.zl_eq_zl2:
        xfields.append(("Zl", M))
    xfields += [("lbx", nbx), ("ubx", nbx)]
    ufields = [("A", nx * na), ("B", nx * nu), ("c", nx),
               ("R", nu if st.r_diag else nu * nu)]
    if not st.s_zero:
        ufields.append(("S", nu * nx))
    ufields += [("r", nu), ("lbu", nu), ("ubu", nu)]
    qpx = _Layout(*xfields)
    qpu = _Layout(*ufields)
    ric = _Layout(("P", nx * (nx + 1) // 2), ("K", nu * nx), ("L", ntri),
                  ("kff", nu), ("pn", nx))
    res = _Layout(("rx", nx))
    aff = _Layout(("ax", nx), ("au", nu))
    return qpx, qpu, ric, res, aff


def _pad8(w):
    return -(-w // 8) * 8


def fused_vmem_bytes(N, M, nx=5, nu=2, nbx=None, tile=128, sb=1,
                     itemsize=4, structure=None):
    """Estimate of the kernel's VMEM footprint.

    Used by callers to decide whether the fused backend (at a given
    sublane-batch factor ``sb``) fits the ~16 MB VMEM of one TPU core
    before paying a compile.
    """
    nbx = len(IDXBX) if nbx is None else nbx
    qpx, qpu, ric, res, aff = _layouts(nx, nu, M, nbx, structure)
    st = N + 1

    def p(w):
        return _pad8(w * sb)

    # QP data is DMA'd once per tile into single VMEM scratch copies (no
    # pipelined double-buffering); dx/du/s outputs are DMA'd straight from
    # the state scratch (no output blocks); corrector deltas are recomputed
    # in the apply pass, so there is no corrector scratch.
    inp = st * p(qpx.width) + N * p(qpu.width) + p(nx)
    outs = 2 * 2 * p(1)                         # mu/stat blocks only
    state = (st * (p(nx) + 4 * p(M) + 4 * p(nbx))
             + N * (5 * p(nu) + p(nx)))
    work = (N * p(ric.width)
            + st * (p(res.width) + p(aff.width)))
    return (inp + outs + state + work) * tile * itemsize


# ---------------------------------------------------------------------------
# small-matrix helpers over "matrix = list[list[(TILE,) vector]]"
# ---------------------------------------------------------------------------

def _lv(ref, k, off, n):
    return [ref[k, off + i] for i in range(n)]


def _lm(ref, k, off, rows, cols):
    return [[ref[k, off + i * cols + j] for j in range(cols)]
            for i in range(rows)]


def _svec(ref, k, off, v):
    for i, x in enumerate(v):
        ref[k, off + i] = x


def _smat(ref, k, off, A):
    cols = len(A[0])
    for i, row in enumerate(A):
        for j, x in enumerate(row):
            ref[k, off + i * cols + j] = x


def _ssym(ref, k, off, A):
    """Store the upper triangle of a symmetric matrix, row-major."""
    n = len(A)
    idx = 0
    for i in range(n):
        for j in range(i, n):
            ref[k, off + idx] = A[i][j]
            idx += 1


def _lsym(ref, k, off, n):
    """Load a symmetric matrix stored by ``_ssym`` back to full form."""
    A = [[None] * n for _ in range(n)]
    idx = 0
    for i in range(n):
        for j in range(i, n):
            v = ref[k, off + idx]
            A[i][j] = v
            A[j][i] = v
            idx += 1
    return A



class _R:
    """Sublane-batched ref view: element (k, i) is an (sb, 128) block.

    With sb = 1 this is a transparent pass-through (values are (128,) lane
    vectors). With sb > 1, each logical field element occupies ``sb``
    consecutive sublanes, so every elementwise op moves sb x 128 scenarios
    per instruction — sb/8 of the VPU instead of 1/8 — at sb x the VMEM.
    """

    __slots__ = ("ref", "s")

    def __init__(self, ref, s):
        self.ref = ref
        self.s = s

    def __getitem__(self, ix):
        k, i = ix
        if self.s == 1:
            return self.ref[k, i]
        return self.ref[k, i * self.s:(i + 1) * self.s]

    def __setitem__(self, ix, val):
        k, i = ix
        if self.s == 1:
            self.ref[k, i] = val
        else:
            self.ref[k, i * self.s:(i + 1) * self.s] = val


def _chol_small(H, reg):
    """Cholesky of a batched small SPD matrix (list-of-lists) -> flat lower
    factor [L00, L10, L11, L20, L21, L22, ...] (row-major lower triangle).
    Generic in n (unrolled at trace time)."""
    n = len(H)
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        acc = H[j][j] + reg
        for t in range(j):
            acc = acc - L[j][t] * L[j][t]
        Ljj = jnp.sqrt(jnp.maximum(acc, 1e-30))
        L[j][j] = Ljj
        for i in range(j + 1, n):
            a = H[i][j]
            for t in range(j):
                a = a - L[i][t] * L[j][t]
            L[i][j] = a / Ljj
    return [L[i][j] for i in range(n) for j in range(i + 1)]


def _chol_solve_small(Lf, b):
    """Solve (L L') x = b with the flat lower factor from ``_chol_small``."""
    n = len(b)
    at = lambda i, j: Lf[i * (i + 1) // 2 + j]
    y = [None] * n
    for i in range(n):
        acc = b[i]
        for t in range(i):
            acc = acc - at(i, t) * y[t]
        y[i] = acc / at(i, i)
    x = [None] * n
    for i in reversed(range(n)):
        acc = y[i]
        for t in range(i + 1, n):
            acc = acc - at(t, i) * x[t]
        x[i] = acc / at(i, i)
    return x



def _uloop(n, body, carry, su, reverse=False):
    """Partially-unrolled stage loop: body(k, carry) for k in 0..n-1
    (reversed order if ``reverse``), ``su`` stages per fori_loop step plus a
    statically peeled tail. Mosaic only supports full or no unrolling in
    ``fori_loop`` itself, so the unroll is done at trace time: each loop
    step issues ``su`` stage bodies back-to-back, amortizing the per-step
    loop/branch/address overhead and giving the compiler ILP across stages.
    """
    su = max(1, min(su, n if n else 1))
    full, rem = divmod(n, su)

    def idx(i):
        return (n - 1 - i) if reverse else i

    def step(b, c):
        for j in range(su):
            c = body(idx(b * su + j), c)
        return c

    carry = jax.lax.fori_loop(0, full, step, carry)
    for j in range(rem):                      # static tail
        carry = body(idx(full * su + j), carry)
    return carry


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------

def _ip_solve_kernel(nx, nu, N, M, nbx, iters, su, sb, reg, tau, tol,
                     stat_tol, sigma_max, n_pairs, ST, LQX, LQU, LR, LRES,
                     LAFF,
                     QPX_hbm, QPU_hbm, DX0_in,
                     dx_o, du_o, s_o, mu_o, stat_o,
                     QPXv, QPUv, sem_x, sem_u, sem_out,
                     SDX, SDU, SS, SNU,
                     STUL, SLUL, STUU, SLUU,
                     STXL, SLXL, STXU, SLXU,
                     STH, SLH, SLS,
                     RIC, RES, AFFP):
    # QP data stays in HBM (memory_space=ANY) and is copied ONCE per batch
    # tile into single VMEM scratch buffers — half the footprint of the
    # pipelined double-buffering BlockSpecs would use, and the copy (a few
    # MB at ~1 TB/s) is negligible next to the tile's multi-ms solve.
    # Two arrays: (N+1)-stage cost/constraint fields and N-stage dynamics
    # fields (see _layouts). dx/du/s outputs are ANY (HBM) and receive the
    # state scratch by DMA at the end — no VMEM output blocks.
    b = pl.program_id(0)
    cpx = pltpu.make_async_copy(QPX_hbm.at[b], QPXv, sem_x)
    cpu = pltpu.make_async_copy(QPU_hbm.at[b], QPUv, sem_u)
    cpx.start()
    cpu.start()
    cpx.wait()
    cpu.wait()
    SDXr, SDUr, SSr = SDX, SDU, SS          # raw refs for the output DMA
    mu_o, stat_o = (r.at[0] for r in (mu_o, stat_o))
    (QPX, QPU, DX0, mu_o, stat_o,
     SDX, SDU, SS, SNU, STUL, SLUL, STUU, SLUU,
     STXL, SLXL, STXU, SLXU, STH, SLH, SLS,
     RIC, RES, AFFP) = [
        _R(r, sb) for r in (QPXv, QPUv, DX0_in.at[0], mu_o, stat_o,
                            SDX, SDU, SS, SNU, STUL, SLUL, STUU, SLUU,
                            STXL, SLXL, STXU, SLXU, STH, SLH, SLS,
                            RIC, RES, AFFP)]
    idxbx = list(IDXBX)
    ntri = nu * (nu + 1) // 2
    f32max = 3.0e38
    zero = jnp.zeros_like(QPX[0, 0])

    def qref(name):
        return (QPX, LQX) if name in LQX.o else (QPU, LQU)

    def qv(k, name, n):
        ref, lay = qref(name)
        return _lv(ref, k, lay.o[name], n)

    def qm(k, name, rows, cols):
        """Load a stage matrix, rebuilding declared structure symbolically:
        structurally-zero/unit entries come back as Python floats, which the
        symbolic algebra (_smul/_sadd) folds away at trace time."""
        ref, lay = qref(name)
        if name == "Q" and ST.q_diag:
            d = _lv(ref, k, lay.o["Q"], nx)
            return [[d[i] if i == j else 0.0 for j in range(nx)]
                    for i in range(nx)]
        if name == "R" and ST.r_diag:
            d = _lv(ref, k, lay.o["R"], nu)
            return [[d[i] if i == j else 0.0 for j in range(nu)]
                    for i in range(nu)]
        if name == "S" and ST.s_zero:
            return [[0.0] * nx for _ in range(nu)]
        if name == "C" and ST.c_cols is not None:
            vals = _lm(ref, k, lay.o["C"], M, len(ST.c_cols))
            cmap = {c: i for i, c in enumerate(ST.c_cols)}
            return [[vals[m][cmap[j]] if j in cmap else 0.0
                     for j in range(nx)] for m in range(M)]
        if name == "A" and ST.a_unit_cols:
            kept = [j for j in range(nx) if j not in ST.a_unit_cols]
            vals = _lm(ref, k, lay.o["A"], nx, len(kept))
            kmap = {c: i for i, c in enumerate(kept)}
            return [[(1.0 if i == j else 0.0) if j in ST.a_unit_cols
                     else vals[i][kmap[j]] for j in range(nx)]
                    for i in range(nx)]
        return _lm(ref, k, lay.o[name], rows, cols)

    def sdx(k):
        return [SDX[k, i] for i in range(nx)]

    def sdu(k):
        return [SDU[k, i] for i in range(nu)]

    def snu(k):
        return [SNU[k, i] for i in range(nx)]

    # ================= initialization (matches solve_ocp_qp) =============
    t_min = 0.1
    mu0 = 1.0

    x = [DX0[0, i] for i in range(nx)]
    for i in range(nx):
        SDX[0, i] = x[i]

    def init_roll(k, xk):
        xn = _vadd(_mv(qm(k, "A", nx, nx), xk), qv(k, "c", nx))
        for i in range(nx):
            SDX[k + 1, i] = xn[i]
        return xn

    jax.lax.fori_loop(0, N, init_roll, x)

    def init_x(k, _):
        dxk = sdx(k)
        g = _vadd(qv(k, "h", M), _mv(qm(k, "C", M, nx), dxk))
        for m in range(M):
            s0 = jnp.maximum(t_min, t_min - g[m])
            SS[k, m] = s0
            th = jnp.maximum(g[m] + s0, t_min)
            STH[k, m] = th
            SLH[k, m] = mu0 / th
            SLS[k, m] = mu0 / s0
        lbx = qv(k, "lbx", nbx)
        ubx = qv(k, "ubx", nbx)
        for i in range(nbx):
            t = jnp.maximum(dxk[idxbx[i]] - lbx[i], t_min)
            STXL[k, i] = t
            SLXL[k, i] = mu0 / t
            t = jnp.maximum(ubx[i] - dxk[idxbx[i]], t_min)
            STXU[k, i] = t
            SLXU[k, i] = mu0 / t
        return _

    jax.lax.fori_loop(0, N + 1, init_x, 0)

    def init_u(k, _):
        lbu = qv(k, "lbu", nu)
        ubu = qv(k, "ubu", nu)
        for i in range(nu):
            SDU[k, i] = zero
            t = jnp.maximum(-lbu[i], t_min)
            STUL[k, i] = t
            SLUL[k, i] = mu0 / t
            t = jnp.maximum(ubu[i], t_min)
            STUU[k, i] = t
            SLUU[k, i] = mu0 / t
        for i in range(nx):
            SNU[k, i] = zero
        return _

    jax.lax.fori_loop(0, N, init_u, 0)

    # ================= per-iteration helpers ==============================
    def Zl_at(k):
        name = "zl" if ST.zl_eq_zl2 else "Zl"
        return [jnp.maximum(QPX[k, LQX.o[name] + m], _ZL_FLOOR)
                for m in range(M)]

    # --- stage-local residuals, recomputed on use (not stored) ------------
    # Every residual except the stationarity rx is a few elementwise ops on
    # stage-local state; recomputing them wherever the old code read the
    # RES scratch trades a handful of VPU ops for ~2 MB of VMEM (the whole
    # point: fitting sublane_batch=8). All passes read the same pre-update
    # state, so recomputed values equal the previously stored ones exactly.
    def res_box_x(k, dxk=None):
        dxk = sdx(k) if dxk is None else dxk
        lbx = qv(k, "lbx", nbx)
        ubx = qv(k, "ubx", nbx)
        rxl = [dxk[idxbx[i]] - lbx[i] - STXL[k, i] for i in range(nbx)]
        rxu = [ubx[i] - dxk[idxbx[i]] - STXU[k, i] for i in range(nbx)]
        return rxl, rxu

    def res_soft(k):
        Cdx = _mv(qm(k, "C", M, nx), sdx(k))
        h = qv(k, "h", M)
        zl = qv(k, "zl", M)
        Zk = Zl_at(k)
        rh = [h[m] + Cdx[m] + SS[k, m] - STH[k, m] for m in range(M)]
        rs = [Zk[m] * SS[k, m] + zl[m] - SLH[k, m] - SLS[k, m]
              for m in range(M)]
        return rh, rs

    def res_box_u(k):
        duk = sdu(k)
        lbu = qv(k, "lbu", nu)
        ubu = qv(k, "ubu", nu)
        rul = [duk[i] - lbu[i] - STUL[k, i] for i in range(nu)]
        ruu = [ubu[i] - duk[i] - STUU[k, i] for i in range(nu)]
        return rul, ruu

    def res_u_at(k):
        acc = _vadd(_vadd(_mv(qm(k, "R", nu, nu), sdu(k)), qv(k, "r", nu)),
                    _mv(qm(k, "S", nu, nx), sdx(k)))
        Btn = _mv(_mt(qm(k, "B", nx, nu)), snu(k))
        return [acc[i] - Btn[i] - (SLUL[k, i] - SLUU[k, i])
                for i in range(nu)]

    def sig(l, t):
        return jnp.clip(l / jnp.maximum(t, _T_FLOOR), 0.0, sigma_max)

    def sigmas_x(k):
        sxl = [sig(SLXL[k, i], STXL[k, i]) for i in range(nbx)]
        sxu = [sig(SLXU[k, i], STXU[k, i]) for i in range(nbx)]
        return sxl, sxu

    def sigmas_u(k):
        sul = [sig(SLUL[k, i], STUL[k, i]) for i in range(nu)]
        suu = [sig(SLUU[k, i], STUU[k, i]) for i in range(nu)]
        return sul, suu

    def sigmas_h(k):
        sh = [sig(SLH[k, m], STH[k, m]) for m in range(M)]
        ss = [sig(SLS[k, m], SS[k, m]) for m in range(M)]
        Zk = Zl_at(k)
        zeta = [Zk[m] + sh[m] + ss[m] for m in range(M)]
        seff = [sh[m] * (Zk[m] + ss[m]) / zeta[m] for m in range(M)]
        return sh, ss, zeta, seff

    def ftb(a, v, dv):
        neg = dv < 0
        denom = jnp.where(neg, -dv, 1.0)
        ratio = jnp.where(neg, v / denom, 2.0)
        return jnp.minimum(a, ratio)

    def iteration(it, carry_none):
        # ===== PHASE 0: duality measure + stationarity residual rx =======
        def res_x_body(k, mu):
            for i in range(nbx):
                mu = mu + STXL[k, i] * SLXL[k, i] + STXU[k, i] * SLXU[k, i]
            for m in range(M):
                mu = mu + STH[k, m] * SLH[k, m] + SS[k, m] * SLS[k, m]
            return mu

        mu = _uloop(N + 1, res_x_body, zero, su)

        def rx_at(k, with_next, with_prev, stat):
            """Stationarity wrt x_k -> RES.rx; the k=0 row is stored (used by
            qbar) but excluded from the stat norm (dx0 is an equality)."""
            dxk = sdx(k)
            acc = _vadd(_mv(qm(k, "Q", nx, nx), dxk), qv(k, "q", nx))
            if with_next:
                acc = _vadd(acc, _mv(_mt(qm(k, "S", nu, nx)), sdu(k)))
                Atn = _mv(_mt(qm(k, "A", nx, nx)), snu(k))
                acc = [acc[i] - Atn[i] for i in range(nx)]
            if with_prev:
                acc = _vadd(acc, snu(k - 1))
            for i in range(nbx):
                acc[idxbx[i]] = acc[idxbx[i]] - (SLXL[k, i] - SLXU[k, i])
            Ctl = _mv(_mt(qm(k, "C", M, nx)), _lv(SLH, k, 0, M))
            for i in range(nx):
                v = _ssub(acc[i], Ctl[i])
                RES[k, LRES.o["rx"] + i] = v
                if stat is not None:
                    stat = jnp.maximum(stat, jnp.abs(v))
            return stat

        rx_at(0, True, False, None)
        stat = _uloop(N - 1, lambda k, s: rx_at(k + 1, True, True, s), zero, su)
        stat = rx_at(N, False, True, stat)

        def res_u_body(k, carry):
            mu, stat = carry
            for i in range(nu):
                mu = mu + STUL[k, i] * SLUL[k, i] + STUU[k, i] * SLUU[k, i]
            ru = res_u_at(k)
            for i in range(nu):
                stat = jnp.maximum(stat, jnp.abs(ru[i]))
            return mu, stat

        mu, stat = _uloop(N, res_u_body, (mu, stat), su)
        mu = mu / n_pairs

        # ================= PHASE 1: factorization =========================
        def Qbar_at(k):
            Qk = qm(k, "Q", nx, nx)
            sxl, sxu = sigmas_x(k)
            for i in range(nbx):
                Qk[idxbx[i]][idxbx[i]] = (Qk[idxbx[i]][idxbx[i]]
                                          + sxl[i] + sxu[i])
            _, _, _, seff = sigmas_h(k)
            Ck = qm(k, "C", M, nx)
            for i in range(nx):
                for j in range(i, nx):
                    acc = Qk[i][j]
                    for m in range(M):
                        acc = _sadd(acc, _smul(_smul(Ck[m][i], seff[m]),
                                               Ck[m][j]))
                    Qk[i][j] = acc
                    if j != i:
                        Qk[j][i] = acc
            return Qk

        def fac_body(i, P):
            k = N - 1 - i
            _ssym(RIC, k, LR.o["P"], P)
            Ak = qm(k, "A", nx, nx)
            Bk = qm(k, "B", nx, nu)
            BT = _mt(Bk)
            PB = _mm(P, Bk)
            PA = _mm(P, Ak)
            Rk = qm(k, "R", nu, nu)
            sul, suu = sigmas_u(k)
            for j in range(nu):
                Rk[j][j] = Rk[j][j] + sul[j] + suu[j]
            Huu = _madd(Rk, _mm(BT, PB))
            Hux = _madd(qm(k, "S", nu, nx), _mm(BT, PA))
            Lf = _chol_small(Huu, reg)
            _svec(RIC, k, LR.o["L"], Lf)
            Kk = [[None] * nx for _ in range(nu)]
            for j in range(nx):
                col = _chol_solve_small(Lf, [Hux[i][j] for i in range(nu)])
                for i in range(nu):
                    Kk[i][j] = -col[i]
            _smat(RIC, k, LR.o["K"], Kk)
            AT = _mt(Ak)
            Pk = _madd(Qbar_at(k), _madd(_mm(AT, PA), _mm(_mt(Hux), Kk)))
            # symmetrize: keeps the recursion stable in f32
            return [[0.5 * (Pk[i][j] + Pk[j][i]) for j in range(nx)]
                    for i in range(nx)]

        # the fori_loop carry must be all-traced: Qbar(N)'s structural-zero
        # entries (Python floats) would change the carry pytree after the
        # first stage densifies P
        P_N = [[zero + e if isinstance(e, float) else e for e in row]
               for row in Qbar_at(N)]
        _uloop(N, lambda i, P: fac_body(i, P), P_N, su)

        # ================= direction machinery ============================
        # The affine pass stores its (dx, du) per stage; the corrector's
        # dt_aff*dl_aff pair products are recomputed from them through the
        # exact affine delta formulas — identical operands and ops, so the
        # values are bit-identical to the products the old code stored.
        def afx(k):
            return [AFFP[k, LAFF.o["ax"] + i] for i in range(nx)]

        def afu(k):
            return [AFFP[k, LAFF.o["au"] + i] for i in range(nu)]

        def bc2(t, l, prod, mu_t):
            return (mu_t - t * l - prod) / jnp.maximum(t, _T_FLOOR)

        def betas_x(k, corrector, mu_t):
            if not corrector:
                b_xl = [-SLXL[k, i] for i in range(nbx)]
                b_xu = [-SLXU[k, i] for i in range(nbx)]
                b_h = [-SLH[k, m] for m in range(M)]
                b_s = [-SLS[k, m] for m in range(M)]
            else:
                soft_a, box_a = x_deltas(k, afx(k), False, None)
                b_xl = [bc2(STXL[k, i], SLXL[k, i],
                            box_a[i][0] * box_a[i][2], mu_t)
                        for i in range(nbx)]
                b_xu = [bc2(STXU[k, i], SLXU[k, i],
                            box_a[i][1] * box_a[i][3], mu_t)
                        for i in range(nbx)]
                b_h = [bc2(STH[k, m], SLH[k, m],
                           soft_a[m][1] * soft_a[m][2], mu_t)
                       for m in range(M)]
                b_s = [bc2(SS[k, m], SLS[k, m],
                           soft_a[m][0] * soft_a[m][3], mu_t)
                       for m in range(M)]
            return b_xl, b_xu, b_h, b_s

        def betas_u(k, corrector, mu_t):
            if not corrector:
                return ([-SLUL[k, i] for i in range(nu)],
                        [-SLUU[k, i] for i in range(nu)])
            uk_a = afu(k)
            rul, ruu = res_box_u(k)
            sul, suu = sigmas_u(k)
            b_ul, b_uu = [], []
            for i in range(nu):
                dtul = uk_a[i] + rul[i]
                dtuu = -uk_a[i] + ruu[i]
                dlul = -SLUL[k, i] - sul[i] * dtul
                dluu = -SLUU[k, i] - suu[i] * dtuu
                b_ul.append(bc2(STUL[k, i], SLUL[k, i], dtul * dlul, mu_t))
                b_uu.append(bc2(STUU[k, i], SLUU[k, i], dtuu * dluu, mu_t))
            return b_ul, b_uu

        def qbar_at(k, corrector, mu_t):
            b_xl, b_xu, b_h, b_s = betas_x(k, corrector, mu_t)
            sxl, sxu = sigmas_x(k)
            sh, ss, zeta, _ = sigmas_h(k)
            rxl, rxu = res_box_x(k)
            rh_l, rs_l = res_soft(k)
            acc = [RES[k, LRES.o["rx"] + i] for i in range(nx)]
            for i in range(nbx):
                acc[idxbx[i]] = (acc[idxbx[i]]
                                 - (b_xl[i] - sxl[i] * rxl[i])
                                 + (b_xu[i] - sxu[i] * rxu[i]))
            Ck = qm(k, "C", M, nx)
            bh_hat = []
            for m in range(M):
                rho = (-rs_l[m] + b_h[m] + b_s[m] - sh[m] * rh_l[m])
                bh_hat.append(b_h[m] - sh[m] * rh_l[m] - sh[m] * rho / zeta[m])
            Ctb = _mv(_mt(Ck), bh_hat)
            return [_ssub(acc[i], Ctb[i]) for i in range(nx)]

        def rbar_at(k, corrector, mu_t):
            b_ul, b_uu = betas_u(k, corrector, mu_t)
            sul, suu = sigmas_u(k)
            rul, ruu = res_box_u(k)
            ru = res_u_at(k)
            return [ru[i]
                    - (b_ul[i] - sul[i] * rul[i])
                    + (b_uu[i] - suu[i] * ruu[i])
                    for i in range(nu)]

        def dyn_gap(k):
            """d_k = -r_dyn_k, recomputed from state (not stored)."""
            Ax = _mv(qm(k, "A", nx, nx), sdx(k))
            Bu = _mv(qm(k, "B", nx, nu), sdu(k))
            ck = qv(k, "c", nx)
            return [-(SDX[k + 1, i] - Ax[i] - Bu[i] - ck[i])
                    for i in range(nx)]

        def backward(corrector, mu_t):
            def bb(i, p):
                k = N - 1 - i
                _svec(RIC, k, LR.o["pn"], p)
                Pk1 = _lsym(RIC, k, LR.o["P"], nx)
                Lf = _lv(RIC, k, LR.o["L"], ntri)
                Kk = _lm(RIC, k, LR.o["K"], nu, nx)
                d = dyn_gap(k)
                Pd_p = _vadd(_mv(Pk1, d), p)
                BT = _mt(qm(k, "B", nx, nu))
                m_v = _vadd(rbar_at(k, corrector, mu_t), _mv(BT, Pd_p))
                kff = [-v for v in _chol_solve_small(Lf, m_v)]
                _svec(RIC, k, LR.o["kff"], kff)
                AT = _mt(qm(k, "A", nx, nx))
                return _vadd(qbar_at(k, corrector, mu_t),
                             _vadd(_mv(AT, Pd_p), _mv(_mt(Kk), m_v)))

            _uloop(N, bb, qbar_at(N, corrector, mu_t), su)

        def x_deltas(k, xk, corrector, mu_t):
            """Soft + x-box Newton deltas at stage k given Ddx_k = xk.

            Returns (soft, box): soft[m] = (ds, dt_h, dl_h, dl_s),
            box[i] = (dt_xl, dt_xu, dl_xl, dl_xu). Pure function of the
            (unmodified) IP state, so the apply pass can recompute the
            exact same values the collect pass bounded the step with.
            """
            b_xl, b_xu, b_h, b_s = betas_x(k, corrector, mu_t)
            sxl, sxu = sigmas_x(k)
            sh, ss, zeta, _ = sigmas_h(k)
            rxl, rxu = res_box_x(k)
            rh_l, rs_l = res_soft(k)
            CD = _mv(qm(k, "C", M, nx), xk)
            soft = []
            for m in range(M):
                rho = (-rs_l[m] + b_h[m] + b_s[m] - sh[m] * rh_l[m])
                ds = (rho - sh[m] * CD[m]) / zeta[m]
                dth = CD[m] + ds + rh_l[m]
                dlh = b_h[m] - sh[m] * dth
                dls = b_s[m] - ss[m] * ds
                soft.append((ds, dth, dlh, dls))
            box = []
            for i in range(nbx):
                dtxl = xk[idxbx[i]] + rxl[i]
                dtxu = -xk[idxbx[i]] + rxu[i]
                dlxl = b_xl[i] - sxl[i] * dtxl
                dlxu = b_xu[i] - sxu[i] * dtxu
                box.append((dtxl, dtxu, dlxl, dlxu))
            return soft, box

        def u_deltas(k, xk, corrector, mu_t):
            """Control delta uk = K xk + kff plus the u-box pair deltas."""
            b_ul, b_uu = betas_u(k, corrector, mu_t)
            Kk = _lm(RIC, k, LR.o["K"], nu, nx)
            kff = _lv(RIC, k, LR.o["kff"], nu)
            uk = _vadd(_mv(Kk, xk), kff)
            sul, suu = sigmas_u(k)
            rul, ruu = res_box_u(k)
            ud = []
            for i in range(nu):
                dtul = uk[i] + rul[i]
                dtuu = -uk[i] + ruu[i]
                dlul = b_ul[i] - sul[i] * dtul
                dluu = b_uu[i] - suu[i] * dtuu
                ud.append((dtul, dtuu, dlul, dluu))
            return uk, ud

        def roll(k, xk, uk):
            d = dyn_gap(k)
            Ak = qm(k, "A", nx, nx)
            Bk = qm(k, "B", nx, nu)
            return _vadd(_vadd(_mv(Ak, xk), _mv(Bk, uk)), d)

        def x_bounds(k, xk, soft, box, a_pr, a_du):
            for m, (ds, dth, dlh, dls) in enumerate(soft):
                a_pr = ftb(ftb(a_pr, STH[k, m], dth), SS[k, m], ds)
                a_du = ftb(ftb(a_du, SLH[k, m], dlh), SLS[k, m], dls)
            for i, (dtxl, dtxu, dlxl, dlxu) in enumerate(box):
                a_pr = ftb(ftb(a_pr, STXL[k, i], dtxl), STXU[k, i], dtxu)
                a_du = ftb(ftb(a_du, SLXL[k, i], dlxl), SLXU[k, i], dlxu)
            return a_pr, a_du

        def forward_affine():
            """Affine recovery pass: fraction-to-boundary bounds, the mu_aff
            cross sums S1-S3, and the affine (dx, du) per stage (stored in
            AFFP — the corrector betas recompute the dt*dl pair products
            from them)."""
            def x_part(k, xk, acc):
                a_pr, a_du, S1, S2, S3 = acc
                for i in range(nx):
                    AFFP[k, LAFF.o["ax"] + i] = xk[i]
                soft, box = x_deltas(k, xk, False, None)
                a_pr, a_du = x_bounds(k, xk, soft, box, a_pr, a_du)
                for m, (ds, dth, dlh, dls) in enumerate(soft):
                    S1 = S1 + dth * SLH[k, m] + ds * SLS[k, m]
                    S2 = S2 + STH[k, m] * dlh + SS[k, m] * dls
                    S3 = S3 + dth * dlh + ds * dls
                for i, (dtxl, dtxu, dlxl, dlxu) in enumerate(box):
                    S1 = S1 + dtxl * SLXL[k, i] + dtxu * SLXU[k, i]
                    S2 = S2 + STXL[k, i] * dlxl + STXU[k, i] * dlxu
                    S3 = S3 + dtxl * dlxl + dtxu * dlxu
                return (a_pr, a_du, S1, S2, S3)

            def fb(k, carry):
                xk, acc = carry
                acc = x_part(k, xk, acc)
                a_pr, a_du, S1, S2, S3 = acc
                uk, ud = u_deltas(k, xk, False, None)
                for i, (dtul, dtuu, dlul, dluu) in enumerate(ud):
                    a_pr = ftb(ftb(a_pr, STUL[k, i], dtul), STUU[k, i], dtuu)
                    a_du = ftb(ftb(a_du, SLUL[k, i], dlul), SLUU[k, i], dluu)
                    AFFP[k, LAFF.o["au"] + i] = uk[i]
                    S1 = S1 + dtul * SLUL[k, i] + dtuu * SLUU[k, i]
                    S2 = S2 + STUL[k, i] * dlul + STUU[k, i] * dluu
                    S3 = S3 + dtul * dlul + dtuu * dluu
                return roll(k, xk, uk), (a_pr, a_du, S1, S2, S3)

            xk0 = [zero for _ in range(nx)]
            acc0 = (jnp.full_like(mu, 2.0), jnp.full_like(mu, 2.0),
                    zero, zero, zero)
            xk, acc = _uloop(N, fb, (xk0, acc0), su)
            return x_part(N, xk, acc)

        def forward_collect(mu_t):
            """Corrector step bounds + finiteness probe. Nothing is stored:
            the apply pass recomputes the identical deltas once a_p/a_d are
            known, which removes the whole corrector-delta scratch array
            (the state is only mutated in the apply pass, so both passes
            see the same inputs).

            The probe ``chk`` accumulates EVERY component the apply pass
            will add to the state — primal deltas, dual deltas (an inf dual
            with finite primals would otherwise poison the carried
            multipliers) and the costate update — mirroring the
            all-component guard in ``ip_qp.py``. inf - inf inside the sum
            yields NaN, which the ``chk == chk`` test catches."""
            def x_part(k, xk, acc):
                a_pr, a_du, chk = acc
                soft, box = x_deltas(k, xk, True, mu_t)
                a_pr, a_du = x_bounds(k, xk, soft, box, a_pr, a_du)
                for ds, dth, dlh, dls in soft:
                    chk = chk + ds + dth + dlh + dls
                for dtxl, dtxu, dlxl, dlxu in box:
                    chk = chk + dtxl + dtxu + dlxl + dlxu
                for i in range(nx):
                    chk = chk + xk[i]
                return (a_pr, a_du, chk)

            def fb(k, carry):
                xk, acc = carry
                acc = x_part(k, xk, acc)
                a_pr, a_du, chk = acc
                uk, ud = u_deltas(k, xk, True, mu_t)
                for i, (dtul, dtuu, dlul, dluu) in enumerate(ud):
                    a_pr = ftb(ftb(a_pr, STUL[k, i], dtul), STUU[k, i], dtuu)
                    a_du = ftb(ftb(a_du, SLUL[k, i], dlul), SLUU[k, i], dluu)
                    chk = chk + dtul + dtuu + dlul + dluu
                for i in range(nu):
                    chk = chk + uk[i]
                xn = roll(k, xk, uk)
                # costate delta -(P x_{k+1} + p) — probed too
                Px = _mv(_lsym(RIC, k, LR.o["P"], nx), xn)
                pn = _lv(RIC, k, LR.o["pn"], nx)
                for i in range(nx):
                    chk = chk + Px[i] + pn[i]
                return xn, (a_pr, a_du, chk)

            xk0 = [zero for _ in range(nx)]
            acc0 = (jnp.full_like(mu, 2.0), jnp.full_like(mu, 2.0), zero)
            xk, acc = _uloop(N, fb, (xk0, acc0), su)
            return x_part(N, xk, acc)

        def forward_apply(mu_t, a_p, a_d, upd):
            """Recompute the corrector deltas and apply the masked update
            in place. Per stage the order is: compute every delta from the
            OLD state (x/soft, u, rollout to x_{k+1}, costate), then mutate
            stage k — stage k+1 still reads untouched state next step."""
            def x_apply(k, xk, soft, box):
                for i in range(nx):
                    SDX[k, i] = upd(SDX[k, i], a_p, xk[i])
                for m, (ds, dth, dlh, dls) in enumerate(soft):
                    SS[k, m] = upd(SS[k, m], a_p, ds, True)
                    STH[k, m] = upd(STH[k, m], a_p, dth, True)
                    SLH[k, m] = upd(SLH[k, m], a_d, dlh, True)
                    SLS[k, m] = upd(SLS[k, m], a_d, dls, True)
                for i, (dtxl, dtxu, dlxl, dlxu) in enumerate(box):
                    STXL[k, i] = upd(STXL[k, i], a_p, dtxl, True)
                    SLXL[k, i] = upd(SLXL[k, i], a_d, dlxl, True)
                    STXU[k, i] = upd(STXU[k, i], a_p, dtxu, True)
                    SLXU[k, i] = upd(SLXU[k, i], a_d, dlxu, True)

            def fb(k, xk):
                soft, box = x_deltas(k, xk, True, mu_t)
                uk, ud = u_deltas(k, xk, True, mu_t)
                xn = roll(k, xk, uk)
                Pk1 = _lsym(RIC, k, LR.o["P"], nx)
                pn = _lv(RIC, k, LR.o["pn"], nx)
                Px = _mv(Pk1, xn)
                x_apply(k, xk, soft, box)
                for i, (dtul, dtuu, dlul, dluu) in enumerate(ud):
                    SDU[k, i] = upd(SDU[k, i], a_p, uk[i])
                    STUL[k, i] = upd(STUL[k, i], a_p, dtul, True)
                    SLUL[k, i] = upd(SLUL[k, i], a_d, dlul, True)
                    STUU[k, i] = upd(STUU[k, i], a_p, dtuu, True)
                    SLUU[k, i] = upd(SLUU[k, i], a_d, dluu, True)
                for i in range(nx):
                    SNU[k, i] = upd(SNU[k, i], a_d, -(Px[i] + pn[i]))
                return xn

            xk = _uloop(N, fb, [zero for _ in range(nx)], su)
            soft, box = x_deltas(N, xk, True, mu_t)
            x_apply(N, xk, soft, box)

        # ================= predictor ======================================
        backward(False, None)
        ap_raw, ad_raw, S1, S2, S3 = forward_affine()
        ap_aff = jnp.minimum(ap_raw, 1.0)
        ad_aff = jnp.minimum(ad_raw, 1.0)
        mu_aff = (mu * n_pairs + ap_aff * S1 + ad_aff * S2
                  + ap_aff * ad_aff * S3) / n_pairs
        sig_c = jnp.clip((mu_aff / jnp.maximum(mu, _T_FLOOR)) ** 3, 0.0, 1.0)
        mu_t = sig_c * mu

        # ================= corrector ======================================
        backward(True, mu_t)
        ap_raw, ad_raw, chk = forward_collect(mu_t)
        a_p = jnp.minimum(tau * ap_raw, 1.0)
        a_d = jnp.minimum(tau * ad_raw, 1.0)

        converged = (mu < tol) & (stat < stat_tol)
        finite = ((jnp.abs(chk) < f32max) & (chk == chk)
                  & (a_p == a_p) & (a_d == a_d))
        frozen = converged | ~finite

        tiny = 1e-30

        def upd(old, a, step, positive=False):
            v = old + a * step
            if positive:
                v = jnp.maximum(v, tiny)
            return jnp.where(frozen, old, v)

        # ================= state update (recompute + apply) ===============
        forward_apply(mu_t, a_p, a_d, upd)

        # mu/stat of the *current* iterate (pre-update), like the per-launch
        # kernel's outputs — the last write wins, matching mus[-1]/stats[-1].
        mu_o[0, 0] = mu
        stat_o[0, 0] = stat
        return carry_none

    jax.lax.fori_loop(0, iters, iteration, 0)

    # ================= outputs ============================================
    # dx/du/s ARE the state scratch — DMA it straight to the ANY (HBM)
    # outputs instead of paying double-buffered VMEM output blocks.
    for src, dst in ((SDXr, dx_o), (SDUr, du_o), (SSr, s_o)):
        cp = pltpu.make_async_copy(src, dst.at[b], sem_out)
        cp.start()
        cp.wait()


# ---------------------------------------------------------------------------
# host-side wrapper
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=(
    "nx", "nu", "N", "M", "iters", "su", "sb", "tile", "reg", "tau", "tol",
    "stat_tol", "sigma_max", "structure", "interpret", "vmem_limit_bytes"))
def _ip_solve_batchlast(QPX, QPU, DX0, nx, nu, N, M, iters, su, sb, tile,
                        reg, tau, tol, stat_tol, sigma_max,
                        structure=GENERIC_STRUCTURE, interpret=False,
                        vmem_limit_bytes=None):
    dtype = QPX.dtype
    Bp = QPX.shape[-1]
    grid = (Bp // (sb * tile),)
    nbx = len(IDXBX)
    n_pairs = float(2 * N * nu + 2 * (N + 1) * nbx + 2 * (N + 1) * M)
    LQX, LQU, LR, LRES, LAFF = _layouts(nx, nu, M, nbx, structure)

    nt = Bp // (sb * tile)

    def pack(a):
        """(stages, w, Bp) -> (nt, stages, pad8(w*sb), tile): scenario
        b*(sb*tile) + si*tile + l lands at [b, k, w*sb + si, l]. The grid
        dimension leads so each tile's QP data is one contiguous block the
        kernel DMAs with a single ``.at[b]`` copy. The sublane dim is padded
        to a multiple of 8: Mosaic faults (or hangs) on DMA/output blocks
        whose sublane width is not a whole number of f32 (8, 128) tiles."""
        stg, w, _ = a.shape
        a = a.reshape(stg, w, nt, sb, tile)
        a = jnp.transpose(a, (2, 0, 1, 3, 4)).reshape(nt, stg, w * sb, tile)
        padw = _pad8(w * sb) - w * sb
        if padw:
            a = jnp.pad(a, ((0, 0), (0, 0), (0, padw), (0, 0)))
        return a

    def unpack(a, w):
        """(nt, stages, pad8(w*sb), tile) -> (stages, w, Bp): inverse of
        pack for the logical field width ``w`` (tail padding dropped)."""
        _, stg, _, _ = a.shape
        a = a[:, :, :w * sb].reshape(nt, stg, w, sb, tile)
        return jnp.transpose(a, (1, 2, 0, 3, 4)).reshape(stg, w, Bp)

    def ospec(stages, width):
        return pl.BlockSpec((1, stages, _pad8(width * sb), tile),
                            lambda b: (b, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    def scr(stages, width):
        return pltpu.VMEM((stages, _pad8(width * sb), tile), dtype)

    kernel = functools.partial(
        _ip_solve_kernel, nx, nu, N, M, nbx, iters, su, sb, reg, tau, tol,
        stat_tol, sigma_max, n_pairs, structure, LQX, LQU, LR, LRES, LAFF)

    # Explicit HBM (not ANY): under ANY, XLA may decide to place a small
    # output buffer in VMEM when the consumer pattern suits it (observed
    # inside a scan that only slices du), which lands on top of the
    # kernel's ~14.4 MB scratch and OOMs scoped VMEM at sublane_batch=8.
    hbm_spec = pl.BlockSpec(memory_space=pltpu.HBM)
    in_specs = [hbm_spec, hbm_spec,
                pl.BlockSpec((1, 1, _pad8(nx * sb), tile),
                             lambda b: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM)]
    out_specs = (hbm_spec, hbm_spec, hbm_spec, ospec(1, 1), ospec(1, 1))
    out_shape = (
        jax.ShapeDtypeStruct((nt, N + 1, _pad8(nx * sb), tile), dtype),
        jax.ShapeDtypeStruct((nt, N, _pad8(nu * sb), tile), dtype),
        jax.ShapeDtypeStruct((nt, N + 1, _pad8(M * sb), tile), dtype),
        jax.ShapeDtypeStruct((nt, 1, _pad8(sb), tile), dtype),
        jax.ShapeDtypeStruct((nt, 1, _pad8(sb), tile), dtype))
    state_scratch = [
        scr(N + 1, nx), scr(N, nu), scr(N + 1, M), scr(N, nx),     # dx du s nu
        scr(N, nu), scr(N, nu), scr(N, nu), scr(N, nu),            # u pairs
        scr(N + 1, nbx), scr(N + 1, nbx), scr(N + 1, nbx), scr(N + 1, nbx),
        scr(N + 1, M), scr(N + 1, M), scr(N + 1, M),               # th lh ls
    ]
    work_scratch = [scr(N, LR.width), scr(N + 1, LRES.width),
                    scr(N + 1, LAFF.width)]
    dma_scratch = [scr(N + 1, LQX.width), scr(N, LQU.width),
                   pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA,
                   pltpu.SemaphoreType.DMA]
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=dma_scratch + state_scratch + work_scratch,
        # Raise Mosaic's scoped-VMEM accounting limit above the 16 MiB flag
        # default: at sublane_batch=8 the kernel's ~14.4 MB scratch is fine
        # on its own, but XLA's memory assignment sometimes ALSO places a
        # small kernel output (e.g. du, 2.6 MB) in VMEM when the consumer
        # pattern suits it, and the combined scoped accounting then trips
        # the default limit at compile time even though the placement fits.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_bytes or 24 * 2**20)
        if not interpret else None,
        interpret=interpret,
    )(pack(QPX), pack(QPU), pack(DX0))
    widths = (nx, nu, M, 1, 1)
    return tuple(unpack(a, w) for a, w in zip(outs, widths))


def solve_ocp_qp_fused(qp: OcpQp, iters: int = 50, tau: float = 0.99,
                       reg: float | None = None, tol: float | None = None,
                       normalize: bool = True, tile: int = 128,
                       stage_unroll: int | None = None,
                       sublane_batch: int | None = None,
                       structure: QpStructure | None = None,
                       interpret: bool = False,
                       vmem_limit_bytes: int | None = None):
    """Fully-fused interior-point solve. ``qp`` has one leading batch axis.

    Returns an ``ops.ip_qp.IpSolution``. The math matches ``solve_ocp_qp``
    (same initialization, eliminations and safeguards); only the execution
    strategy differs: the entire solve — init plus all ``iters`` Mehrotra
    iterations — runs in ONE Pallas launch per batch tile, batch-last layout
    throughout, state resident in VMEM, factorization shared between
    predictor and corrector. ``sublane_batch`` packs that many batch rows
    into the sublane axis (VPU utilization x sb at VMEM x sb); auto-selected
    to the largest factor that fits VMEM.

    ``structure`` declares static structure of the QP data (diagonal Q/R,
    zero S, sparse C/A columns, Zl == zl); structurally-trivial entries are
    neither packed nor computed with. The CALLER asserts the declaration —
    wrong declarations silently solve a different QP
    (``tests/test_ip_pallas.py`` pins ``sqp_rti.UNICYCLE_QP_STRUCTURE``).
    """
    from doa_mpc_tpu.ops.ip_qp import IpSolution

    structure = structure or GENERIC_STRUCTURE
    dtype = qp.Q.dtype
    is32 = dtype == jnp.float32
    tol = (1e-7 if is32 else 1e-10) if tol is None else tol
    reg = (1e-6 if is32 else 1e-9) if reg is None else reg
    sigma_max = 1e7 if is32 else 1e12
    stat_tol = 1e-4 if is32 else 1e-8
    Bt = qp.A.shape[0]
    nx, nu = qp.A.shape[-1], qp.B.shape[-1]
    N = qp.A.shape[-3]
    M = qp.C.shape[-2]
    nbx = len(IDXBX)

    budget = 14.5 * 2**20
    if sublane_batch is None:
        sublane_batch = 1
        for cand in (8, 4, 2):
            if fused_vmem_bytes(N, M, nx, nu, nbx, tile, cand,
                                structure=structure) <= budget:
                sublane_batch = cand
                break
    if stage_unroll is None:
        # Measured on v5e: unroll 4 is fastest with VMEM headroom but
        # degrades ~20x once the footprint nears the 16 MB budget; unroll 2
        # stays fast everywhere. Odd factors hit a Mosaic vectorization
        # cliff at any size — keep to {2, 4}.
        stage_unroll = 4 if fused_vmem_bytes(
            N, M, nx, nu, nbx, tile, sublane_batch,
            structure=structure) <= 7 * 2**20 else 2

    if normalize:
        qp, kappa = normalize_cost(qp)
    else:
        kappa = jnp.ones((Bt,), dtype)

    blk = sublane_batch * tile
    pad = _round_up(max(Bt, blk), blk) - Bt

    def prep(arr, flat, stages):
        a = arr.reshape(arr.shape[:2] + (flat,))
        a = jnp.moveaxis(a, 0, -1)
        if pad:
            a = jnp.pad(a, ((0, 0), (0, 0), (0, pad)), constant_values=1.0)
        if a.shape[0] < stages:           # N-stage fields -> N+1 with zeros
            a = jnp.pad(a, ((0, stages - a.shape[0]), (0, 0), (0, 0)))
        return a

    st = N + 1
    diag = lambda a: jnp.diagonal(a, axis1=-2, axis2=-1)
    # field order must match _layouts: (N+1)-stage cost/constraint array...
    xfields = [prep(diag(qp.Q), nx, st) if structure.q_diag
               else prep(qp.Q, nx * nx, st),
               prep(qp.q, nx, st)]
    if structure.c_cols is not None:
        ncc = len(structure.c_cols)
        xfields.append(prep(qp.C[..., list(structure.c_cols)], M * ncc, st))
    else:
        xfields.append(prep(qp.C, M * nx, st))
    xfields += [prep(qp.hval, M, st), prep(qp.zl, M, st)]
    if not structure.zl_eq_zl2:
        xfields.append(prep(qp.Zl, M, st))
    xfields += [prep(qp.lb_x, nbx, st), prep(qp.ub_x, nbx, st)]
    QPX = jnp.concatenate(xfields, axis=1)

    # ... N-stage dynamics/control array ...
    if structure.a_unit_cols:
        kept = [j for j in range(nx) if j not in structure.a_unit_cols]
        ufields = [prep(qp.A[..., kept], nx * len(kept), N)]
    else:
        ufields = [prep(qp.A, nx * nx, N)]
    ufields += [prep(qp.B, nx * nu, N), prep(qp.c, nx, N),
                prep(diag(qp.R), nu, N) if structure.r_diag
                else prep(qp.R, nu * nu, N)]
    if not structure.s_zero:
        ufields.append(prep(qp.S, nu * nx, N))
    ufields += [prep(qp.r, nu, N),
                prep(qp.lb_u, nu, N), prep(qp.ub_u, nu, N)]
    QPU = jnp.concatenate(ufields, axis=1)

    # ... and dx0 as its own single-stage input.
    DX0 = prep(qp.dx0[:, None, :], nx, 1)

    dx, du, s, mu, stat = _ip_solve_batchlast(
        QPX, QPU, DX0, nx=nx, nu=nu, N=N, M=M, iters=iters, su=stage_unroll,
        sb=sublane_batch, tile=tile, reg=reg,
        tau=tau, tol=tol, stat_tol=stat_tol, sigma_max=sigma_max,
        structure=structure, interpret=interpret,
        vmem_limit_bytes=vmem_limit_bytes)

    def unprep(a):
        return jnp.moveaxis(a, -1, 0)[:Bt]

    return IpSolution(dx=unprep(dx), du=unprep(du), s=unprep(s),
                      mu=unprep(mu)[:, 0, 0], kappa=kappa,
                      stat_res=unprep(stat)[:, 0, 0])
