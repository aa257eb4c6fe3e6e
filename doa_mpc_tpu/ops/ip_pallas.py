"""Fully-fused Pallas TPU kernel: one interior-point iteration per launch.

The batch-native XLA interior-point loop (``ops/ip_qp.py``) spends ~6 ms per
iteration on ~400 tiny elementwise kernel dispatches and only ~1.4 ms in the
(already fused) Riccati solves. This kernel fuses an ENTIRE Mehrotra
iteration — residuals, barrier sigmas, condensed stage Hessians, one Riccati
factorization, predictor back-substitution + recovery, affine step lengths +
centering, corrector back-substitution + recovery, fraction-to-boundary and
the masked state update — into a single launch per batch tile. The
factorization is computed once and shared by predictor and corrector (the
two-call fused-Riccati path recomputes it).

Layout: batch-last, identical to ``ops/riccati_pallas.py`` — operands are
``(stages, flattened, B)`` with the batch on the lane axis, every matrix
element a ``(TILE,)`` vector, and all per-scenario reductions (duality
measure, step lengths) lane-wise vector min/sum — no cross-lane traffic.

Semantics track ``ops/ip_qp.solve_ocp_qp`` line for line (same elimination
identities, same safeguards); the equivalence test runs both at f32.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from doa_mpc_tpu.ops.ocp_qp import IDXBX, OcpQp, normalize_cost
from doa_mpc_tpu.ops.riccati_pallas import (
    _chol2, _chol2_solve, _mat, _madd, _mm, _mt, _mv, _round_up, _store_mat,
    _store_vec, _vadd, _vec,
)

_T_FLOOR = 1e-12
_ZL_FLOOR = 1e-6


def _ip_iteration_kernel(nx, nu, N, M, nbx, reg, tau, tol, stat_tol,
                         sigma_max, n_pairs,
                         # ---- QP data refs (read-only) ----
                         Q_ref, R_ref, S_ref, A_ref, B_ref, q_ref, r_ref,
                         c_ref, lbu_ref, ubu_ref, lbx_ref, ubx_ref,
                         C_ref, h_ref, zl_ref, Zl_ref,
                         # ---- IP state in ----
                         dx_i, du_i, s_i, nu_i,
                         tul_i, lul_i, tuu_i, luu_i, txl_i, lxl_i,
                         txu_i, lxu_i, th_i, lh_i, ls_i,
                         # ---- IP state out ----
                         dx_o, du_o, s_o, nu_o,
                         tul_o, lul_o, tuu_o, luu_o, txl_o, lxl_o,
                         txu_o, lxu_o, th_o, lh_o, ls_o,
                         mu_o, stat_o,
                         # ---- scratch ----
                         P_s, K_s, L_s):
    idxbx = list(IDXBX)
    f32max = 3.0e38

    # ================= load state (lists of (TILE,) vectors) ============
    dx = [_vec(dx_i, k, nx) for k in range(N + 1)]
    du = [_vec(du_i, k, nu) for k in range(N)]
    s = [_vec(s_i, k, M) for k in range(N + 1)]
    nu_d = [_vec(nu_i, k, nx) for k in range(N)]
    t_ul = [_vec(tul_i, k, nu) for k in range(N)]
    l_ul = [_vec(lul_i, k, nu) for k in range(N)]
    t_uu = [_vec(tuu_i, k, nu) for k in range(N)]
    l_uu = [_vec(luu_i, k, nu) for k in range(N)]
    t_xl = [_vec(txl_i, k, nbx) for k in range(N + 1)]
    l_xl = [_vec(lxl_i, k, nbx) for k in range(N + 1)]
    t_xu = [_vec(txu_i, k, nbx) for k in range(N + 1)]
    l_xu = [_vec(lxu_i, k, nbx) for k in range(N + 1)]
    t_h = [_vec(th_i, k, M) for k in range(N + 1)]
    l_h = [_vec(lh_i, k, M) for k in range(N + 1)]
    l_s = [_vec(ls_i, k, M) for k in range(N + 1)]

    Zl = [[jnp.maximum(Zl_ref[k, m], _ZL_FLOOR) for m in range(M)]
          for k in range(N + 1)]
    zl = [[zl_ref[k, m] for m in range(M)] for k in range(N + 1)]

    # ================= residuals ========================================
    r_ul, r_uu, r_u = [], [], []
    for k in range(N):
        lbu = _vec(lbu_ref, k, nu)
        ubu = _vec(ubu_ref, k, nu)
        r_ul.append([du[k][i] - lbu[i] - t_ul[k][i] for i in range(nu)])
        r_uu.append([ubu[i] - du[k][i] - t_uu[k][i] for i in range(nu)])
    r_xl, r_xu = [], []
    for k in range(N + 1):
        lbx = _vec(lbx_ref, k, nbx)
        ubx = _vec(ubx_ref, k, nbx)
        r_xl.append([dx[k][idxbx[i]] - lbx[i] - t_xl[k][i]
                     for i in range(nbx)])
        r_xu.append([ubx[i] - dx[k][idxbx[i]] - t_xu[k][i]
                     for i in range(nbx)])
    g_h, r_h, r_s = [], [], []
    Cs = [_mat(C_ref, k, M, nx) for k in range(N + 1)]
    for k in range(N + 1):
        hv = _vec(h_ref, k, M)
        g = _vadd(hv, _mv(Cs[k], dx[k]))
        g_h.append(g)
        r_h.append([g[m] + s[k][m] - t_h[k][m] for m in range(M)])
        r_s.append([Zl[k][m] * s[k][m] + zl[k][m] - l_h[k][m] - l_s[k][m]
                    for m in range(M)])

    r_dyn = []
    As = [_mat(A_ref, k, nx, nx) for k in range(N)]
    Bs = [_mat(B_ref, k, nx, nu) for k in range(N)]
    for k in range(N):
        ck = _vec(c_ref, k, nx)
        Ax = _mv(As[k], dx[k])
        Bu = _mv(Bs[k], du[k])
        r_dyn.append([dx[k + 1][i] - Ax[i] - Bu[i] - ck[i]
                      for i in range(nx)])

    # stationarity residuals
    r_x = []
    for k in range(N + 1):
        Qk = _mat(Q_ref, k, nx, nx)
        qk = _vec(q_ref, k, nx)
        acc = _vadd(_mv(Qk, dx[k]), qk)
        if k < N:
            Sk = _mat(S_ref, k, nu, nx)
            acc = _vadd(acc, _mv(_mt(Sk), du[k]))
            Atn = _mv(_mt(As[k]), nu_d[k])
            acc = [acc[i] - Atn[i] for i in range(nx)]
        if k >= 1:
            acc = _vadd(acc, nu_d[k - 1])
        for i in range(nbx):
            acc[idxbx[i]] = acc[idxbx[i]] - (l_xl[k][i] - l_xu[k][i])
        Ctl = _mv(_mt(Cs[k]), l_h[k])
        r_x.append([acc[i] - Ctl[i] for i in range(nx)])
    r_u = []
    for k in range(N):
        Rk = _mat(R_ref, k, nu, nu)
        Sk = _mat(S_ref, k, nu, nx)
        rk = _vec(r_ref, k, nu)
        acc = _vadd(_vadd(_mv(Rk, du[k]), rk), _mv(Sk, dx[k]))
        Btn = _mv(_mt(Bs[k]), nu_d[k])
        r_u.append([acc[i] - Btn[i] - (l_ul[k][i] - l_uu[k][i])
                    for i in range(nu)])

    # ================= sigmas + condensed Hessians ======================
    def sig(l, t):
        return jnp.clip(l / jnp.maximum(t, _T_FLOOR), 0.0, sigma_max)

    s_ul = [[sig(l_ul[k][i], t_ul[k][i]) for i in range(nu)] for k in range(N)]
    s_uu = [[sig(l_uu[k][i], t_uu[k][i]) for i in range(nu)] for k in range(N)]
    s_xl = [[sig(l_xl[k][i], t_xl[k][i]) for i in range(nbx)]
            for k in range(N + 1)]
    s_xu = [[sig(l_xu[k][i], t_xu[k][i]) for i in range(nbx)]
            for k in range(N + 1)]
    s_h = [[sig(l_h[k][m], t_h[k][m]) for m in range(M)] for k in range(N + 1)]
    s_s = [[sig(l_s[k][m], s[k][m]) for m in range(M)] for k in range(N + 1)]
    zeta = [[Zl[k][m] + s_h[k][m] + s_s[k][m] for m in range(M)]
            for k in range(N + 1)]
    s_eff = [[s_h[k][m] * (Zl[k][m] + s_s[k][m]) / zeta[k][m]
              for m in range(M)] for k in range(N + 1)]

    Qbar, Rbar = [], []
    for k in range(N + 1):
        Qk = _mat(Q_ref, k, nx, nx)
        for i in range(nbx):
            Qk[idxbx[i]][idxbx[i]] = (Qk[idxbx[i]][idxbx[i]]
                                      + s_xl[k][i] + s_xu[k][i])
        # C' diag(s_eff) C
        for i in range(nx):
            for j in range(i, nx):
                acc = Qk[i][j]
                for m in range(M):
                    acc = acc + Cs[k][m][i] * s_eff[k][m] * Cs[k][m][j]
                Qk[i][j] = acc
                if j != i:
                    Qk[j][i] = acc
        Qbar.append(Qk)
    for k in range(N):
        Rk = _mat(R_ref, k, nu, nu)
        for i in range(nu):
            Rk[i][i] = Rk[i][i] + s_ul[k][i] + s_uu[k][i]
        Rbar.append(Rk)

    # ================= Riccati factorization (shared) ===================
    P = Qbar[N]
    for k in range(N - 1, -1, -1):
        _store_mat(P_s, k, P)                      # P_{k+1}
        PB = _mm(P, Bs[k])
        PA = _mm(P, As[k])
        BT = _mt(Bs[k])
        Sk = _mat(S_ref, k, nu, nx)
        Huu = _madd(Rbar[k], _mm(BT, PB))
        Hux = _madd(Sk, _mm(BT, PA))
        L = _chol2(Huu, reg)
        L_s[k, 0] = L[0]
        L_s[k, 1] = L[1]
        L_s[k, 2] = L[2]
        Kk = [[None] * nx for _ in range(nu)]
        for j in range(nx):
            col = _chol2_solve(L, [Hux[0][j], Hux[1][j]])
            Kk[0][j] = -col[0]
            Kk[1][j] = -col[1]
        _store_mat(K_s, k, Kk)
        AT = _mt(As[k])
        Pk = _madd(Qbar[k], _madd(_mm(AT, PA), _mm(_mt(Hux), Kk)))
        P = [[0.5 * (Pk[i][j] + Pk[j][i]) for j in range(nx)]
             for i in range(nx)]

    # ================= direction computation (two RHS) ==================
    def directions(beta):
        """beta = dict of per-group beta lists; returns all deltas."""
        b_ul, b_uu, b_xl, b_xu, b_h, b_s = (
            beta["ul"], beta["uu"], beta["xl"], beta["xu"], beta["h"],
            beta["s"])
        rho, beta_hat = [], []
        for k in range(N + 1):
            rho.append([
                -r_s[k][m] + b_h[k][m] + b_s[k][m] - s_h[k][m] * r_h[k][m]
                for m in range(M)])
            beta_hat.append([
                b_h[k][m] - s_h[k][m] * r_h[k][m]
                - s_h[k][m] * rho[k][m] / zeta[k][m]
                for m in range(M)])
        # qbar / rbar
        qbar, rbar = [], []
        for k in range(N + 1):
            acc = list(r_x[k])
            for i in range(nbx):
                acc[idxbx[i]] = (acc[idxbx[i]]
                                 - (b_xl[k][i] - s_xl[k][i] * r_xl[k][i])
                                 + (b_xu[k][i] - s_xu[k][i] * r_xu[k][i]))
            Ctb = _mv(_mt(Cs[k]), beta_hat[k])
            qbar.append([acc[i] - Ctb[i] for i in range(nx)])
        for k in range(N):
            rbar.append([
                r_u[k][i] - (b_ul[k][i] - s_ul[k][i] * r_ul[k][i])
                + (b_uu[k][i] - s_uu[k][i] * r_uu[k][i]) for i in range(nu)])
        d = [[-r_dyn[k][i] for i in range(nx)] for k in range(N)]

        # backward gradient pass (reuse stored factors)
        p = qbar[N]
        kffs = [None] * N
        pns = [None] * N
        for k in range(N - 1, -1, -1):
            pns[k] = p
            Pk1 = _mat(P_s, k, nx, nx)
            L = (L_s[k, 0], L_s[k, 1], L_s[k, 2])
            Kk = _mat(K_s, k, nu, nx)
            Pd_p = _vadd(_mv(Pk1, d[k]), p)
            BT = _mt(Bs[k])
            m_v = _vadd(rbar[k], _mv(BT, Pd_p))
            kffs[k] = [-v for v in _chol2_solve(L, m_v)]
            AT = _mt(As[k])
            p = _vadd(qbar[k], _vadd(_mv(AT, Pd_p), _mv(_mt(Kk), m_v)))

        # forward rollout
        Ddx = [[jnp.zeros_like(dx[0][0])] * nx]
        Ddu, Dnu = [], []
        xk = Ddx[0]
        for k in range(N):
            Kk = _mat(K_s, k, nu, nx)
            uk = _vadd(_mv(Kk, xk), kffs[k])
            Ddu.append(uk)
            xk = _vadd(_vadd(_mv(As[k], xk), _mv(Bs[k], uk)), d[k])
            Ddx.append(xk)
            Pk1 = _mat(P_s, k, nx, nx)
            Px = _mv(Pk1, xk)
            Dnu.append([-(Px[i] + pns[k][i]) for i in range(nx)])

        # recovery
        Ds, Dt_h, Dl_h, Dl_s = [], [], [], []
        for k in range(N + 1):
            CD = _mv(Cs[k], Ddx[k])
            ds_k, dth_k, dlh_k, dls_k = [], [], [], []
            for m in range(M):
                ds = (rho[k][m] - s_h[k][m] * CD[m]) / zeta[k][m]
                dth = CD[m] + ds + r_h[k][m]
                ds_k.append(ds)
                dth_k.append(dth)
                dlh_k.append(b_h[k][m] - s_h[k][m] * dth)
                dls_k.append(b_s[k][m] - s_s[k][m] * ds)
            Ds.append(ds_k)
            Dt_h.append(dth_k)
            Dl_h.append(dlh_k)
            Dl_s.append(dls_k)
        Dt_ul = [[Ddu[k][i] + r_ul[k][i] for i in range(nu)] for k in range(N)]
        Dt_uu = [[-Ddu[k][i] + r_uu[k][i] for i in range(nu)]
                 for k in range(N)]
        Dl_ul = [[b_ul[k][i] - s_ul[k][i] * Dt_ul[k][i] for i in range(nu)]
                 for k in range(N)]
        Dl_uu = [[b_uu[k][i] - s_uu[k][i] * Dt_uu[k][i] for i in range(nu)]
                 for k in range(N)]
        Dt_xl = [[Ddx[k][idxbx[i]] + r_xl[k][i] for i in range(nbx)]
                 for k in range(N + 1)]
        Dt_xu = [[-Ddx[k][idxbx[i]] + r_xu[k][i] for i in range(nbx)]
                 for k in range(N + 1)]
        Dl_xl = [[b_xl[k][i] - s_xl[k][i] * Dt_xl[k][i] for i in range(nbx)]
                 for k in range(N + 1)]
        Dl_xu = [[b_xu[k][i] - s_xu[k][i] * Dt_xu[k][i] for i in range(nbx)]
                 for k in range(N + 1)]
        return dict(dx=Ddx, du=Ddu, nu=Dnu, s=Ds,
                    t_ul=Dt_ul, l_ul=Dl_ul, t_uu=Dt_uu, l_uu=Dl_uu,
                    t_xl=Dt_xl, l_xl=Dl_xl, t_xu=Dt_xu, l_xu=Dl_xu,
                    t_h=Dt_h, l_h=Dl_h, l_s=Dl_s)

    # pair iteration helper: yields (v, dv, group_kind) for step rules
    def pairs(delta, which):
        out = []
        if which in ("prim", "both"):
            for k in range(N):
                for i in range(nu):
                    out.append((t_ul[k][i], delta["t_ul"][k][i]))
                    out.append((t_uu[k][i], delta["t_uu"][k][i]))
            for k in range(N + 1):
                for i in range(nbx):
                    out.append((t_xl[k][i], delta["t_xl"][k][i]))
                    out.append((t_xu[k][i], delta["t_xu"][k][i]))
                for m in range(M):
                    out.append((t_h[k][m], delta["t_h"][k][m]))
                    out.append((s[k][m], delta["s"][k][m]))
        if which in ("dual", "both"):
            for k in range(N):
                for i in range(nu):
                    out.append((l_ul[k][i], delta["l_ul"][k][i]))
                    out.append((l_uu[k][i], delta["l_uu"][k][i]))
            for k in range(N + 1):
                for i in range(nbx):
                    out.append((l_xl[k][i], delta["l_xl"][k][i]))
                    out.append((l_xu[k][i], delta["l_xu"][k][i]))
                for m in range(M):
                    out.append((l_h[k][m], delta["l_h"][k][m]))
                    out.append((l_s[k][m], delta["l_s"][k][m]))
        return out

    def max_step(plist, tau_f):
        a = jnp.ones_like(dx[0][0])
        for v, dv in plist:
            neg = dv < 0
            denom = jnp.where(neg, -dv, 1.0)
            ratio = jnp.where(neg, tau_f * v / denom, 2.0)
            a = jnp.minimum(a, ratio)
        return a

    # ---- mu ------------------------------------------------------------
    compl = jnp.zeros_like(dx[0][0])
    for k in range(N):
        for i in range(nu):
            compl = compl + t_ul[k][i] * l_ul[k][i] + t_uu[k][i] * l_uu[k][i]
    for k in range(N + 1):
        for i in range(nbx):
            compl = compl + t_xl[k][i] * l_xl[k][i] + t_xu[k][i] * l_xu[k][i]
        for m in range(M):
            compl = compl + t_h[k][m] * l_h[k][m] + s[k][m] * l_s[k][m]
    mu = compl / n_pairs

    # ---- predictor ------------------------------------------------------
    beta_aff = dict(
        ul=[[-l_ul[k][i] for i in range(nu)] for k in range(N)],
        uu=[[-l_uu[k][i] for i in range(nu)] for k in range(N)],
        xl=[[-l_xl[k][i] for i in range(nbx)] for k in range(N + 1)],
        xu=[[-l_xu[k][i] for i in range(nbx)] for k in range(N + 1)],
        h=[[-l_h[k][m] for m in range(M)] for k in range(N + 1)],
        s=[[-l_s[k][m] for m in range(M)] for k in range(N + 1)],
    )
    aff = directions(beta_aff)
    ap_aff = max_step(pairs(aff, "prim"), 1.0)
    ad_aff = max_step(pairs(aff, "dual"), 1.0)

    mu_aff = jnp.zeros_like(mu)

    def acc_aff(t, dt, l, dl):
        return (t + ap_aff * dt) * (l + ad_aff * dl)

    for k in range(N):
        for i in range(nu):
            mu_aff = mu_aff + acc_aff(t_ul[k][i], aff["t_ul"][k][i],
                                      l_ul[k][i], aff["l_ul"][k][i])
            mu_aff = mu_aff + acc_aff(t_uu[k][i], aff["t_uu"][k][i],
                                      l_uu[k][i], aff["l_uu"][k][i])
    for k in range(N + 1):
        for i in range(nbx):
            mu_aff = mu_aff + acc_aff(t_xl[k][i], aff["t_xl"][k][i],
                                      l_xl[k][i], aff["l_xl"][k][i])
            mu_aff = mu_aff + acc_aff(t_xu[k][i], aff["t_xu"][k][i],
                                      l_xu[k][i], aff["l_xu"][k][i])
        for m in range(M):
            mu_aff = mu_aff + acc_aff(t_h[k][m], aff["t_h"][k][m],
                                      l_h[k][m], aff["l_h"][k][m])
            mu_aff = mu_aff + acc_aff(s[k][m], aff["s"][k][m],
                                      l_s[k][m], aff["l_s"][k][m])
    mu_aff = mu_aff / n_pairs
    sig_c = jnp.clip((mu_aff / jnp.maximum(mu, _T_FLOOR)) ** 3, 0.0, 1.0)
    mu_t = sig_c * mu

    # ---- corrector -------------------------------------------------------
    def bc2(t, l, dt_a, dl_a):
        return (mu_t - t * l - dt_a * dl_a) / jnp.maximum(t, _T_FLOOR)

    beta_cor = dict(
        ul=[[bc2(t_ul[k][i], l_ul[k][i], aff["t_ul"][k][i],
                 aff["l_ul"][k][i]) for i in range(nu)] for k in range(N)],
        uu=[[bc2(t_uu[k][i], l_uu[k][i], aff["t_uu"][k][i],
                 aff["l_uu"][k][i]) for i in range(nu)] for k in range(N)],
        xl=[[bc2(t_xl[k][i], l_xl[k][i], aff["t_xl"][k][i],
                 aff["l_xl"][k][i]) for i in range(nbx)]
            for k in range(N + 1)],
        xu=[[bc2(t_xu[k][i], l_xu[k][i], aff["t_xu"][k][i],
                 aff["l_xu"][k][i]) for i in range(nbx)]
            for k in range(N + 1)],
        h=[[bc2(t_h[k][m], l_h[k][m], aff["t_h"][k][m], aff["l_h"][k][m])
            for m in range(M)] for k in range(N + 1)],
        s=[[bc2(s[k][m], l_s[k][m], aff["s"][k][m], aff["l_s"][k][m])
            for m in range(M)] for k in range(N + 1)],
    )
    cor = directions(beta_cor)
    a_p = max_step(pairs(cor, "prim"), tau)
    a_d = max_step(pairs(cor, "dual"), tau)

    # ---- convergence / finiteness safeguards ---------------------------
    stat = jnp.zeros_like(mu)
    for k in range(1, N + 1):
        for i in range(nx):
            stat = jnp.maximum(stat, jnp.abs(r_x[k][i]))
    for k in range(N):
        for i in range(nu):
            stat = jnp.maximum(stat, jnp.abs(r_u[k][i]))
    converged = (mu < tol) & (stat < stat_tol)
    chk = jnp.zeros_like(mu)
    for k in range(N + 1):
        for i in range(nx):
            chk = chk + cor["dx"][k][i]
        for m in range(M):
            chk = chk + cor["s"][k][m]
    for k in range(N):
        for i in range(nu):
            chk = chk + cor["du"][k][i]
    finite = (jnp.abs(chk) < f32max) & (jnp.abs(a_p) < f32max) & \
        (jnp.abs(a_d) < f32max) & (chk == chk)
    frozen = converged | ~finite

    tiny = 1e-30

    def upd(old, a, step, positive=False):
        v = old + a * step
        if positive:
            v = jnp.maximum(v, tiny)
        return jnp.where(frozen, old, v)

    # ---- write state out ------------------------------------------------
    for k in range(N + 1):
        _store_vec(dx_o, k, [upd(dx[k][i], a_p, cor["dx"][k][i])
                             for i in range(nx)])
        _store_vec(s_o, k, [upd(s[k][m], a_p, cor["s"][k][m], True)
                            for m in range(M)])
        _store_vec(txl_o, k, [upd(t_xl[k][i], a_p, cor["t_xl"][k][i], True)
                              for i in range(nbx)])
        _store_vec(lxl_o, k, [upd(l_xl[k][i], a_d, cor["l_xl"][k][i], True)
                              for i in range(nbx)])
        _store_vec(txu_o, k, [upd(t_xu[k][i], a_p, cor["t_xu"][k][i], True)
                              for i in range(nbx)])
        _store_vec(lxu_o, k, [upd(l_xu[k][i], a_d, cor["l_xu"][k][i], True)
                              for i in range(nbx)])
        _store_vec(th_o, k, [upd(t_h[k][m], a_p, cor["t_h"][k][m], True)
                             for m in range(M)])
        _store_vec(lh_o, k, [upd(l_h[k][m], a_d, cor["l_h"][k][m], True)
                             for m in range(M)])
        _store_vec(ls_o, k, [upd(l_s[k][m], a_d, cor["l_s"][k][m], True)
                             for m in range(M)])
    for k in range(N):
        _store_vec(du_o, k, [upd(du[k][i], a_p, cor["du"][k][i])
                             for i in range(nu)])
        _store_vec(nu_o, k, [upd(nu_d[k][i], a_d, cor["nu"][k][i])
                             for i in range(nx)])
        _store_vec(tul_o, k, [upd(t_ul[k][i], a_p, cor["t_ul"][k][i], True)
                              for i in range(nu)])
        _store_vec(lul_o, k, [upd(l_ul[k][i], a_d, cor["l_ul"][k][i], True)
                              for i in range(nu)])
        _store_vec(tuu_o, k, [upd(t_uu[k][i], a_p, cor["t_uu"][k][i], True)
                              for i in range(nu)])
        _store_vec(luu_o, k, [upd(l_uu[k][i], a_d, cor["l_uu"][k][i], True)
                              for i in range(nu)])
    mu_o[0, 0] = mu
    stat_o[0, 0] = stat


class _BL(NamedTuple):
    """Batch-last IP state (arrays shaped (stages, width, B))."""

    dx: jnp.ndarray; du: jnp.ndarray; s: jnp.ndarray; nu: jnp.ndarray
    t_ul: jnp.ndarray; l_ul: jnp.ndarray
    t_uu: jnp.ndarray; l_uu: jnp.ndarray
    t_xl: jnp.ndarray; l_xl: jnp.ndarray
    t_xu: jnp.ndarray; l_xu: jnp.ndarray
    t_h: jnp.ndarray; l_h: jnp.ndarray; l_s: jnp.ndarray


def solve_ocp_qp_fused(qp: OcpQp, iters: int = 50, tau: float = 0.99,
                       reg: float | None = None, tol: float | None = None,
                       normalize: bool = True, tile: int = 128,
                       interpret: bool = False):
    """Fully-fused interior-point solve. ``qp`` has one leading batch axis.

    Returns an ``ops.ip_qp.IpSolution``. The per-iteration math matches
    ``solve_ocp_qp`` (same initialization, eliminations and safeguards);
    only the execution strategy differs: one Pallas launch per iteration,
    batch-last layout throughout, factorization shared between predictor
    and corrector.
    """
    from doa_mpc_tpu.ops.ip_qp import IpSolution

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
    n_pairs = float(2 * N * nu + 2 * (N + 1) * nbx + 2 * (N + 1) * M)

    if normalize:
        qp, kappa = normalize_cost(qp)
    else:
        kappa = jnp.ones((Bt,), dtype)

    pad = _round_up(max(Bt, tile), tile) - Bt

    def prep(arr, flat):
        a = arr.reshape(arr.shape[:2] + (flat,))
        a = jnp.moveaxis(a, 0, -1)
        if pad:
            a = jnp.pad(a, ((0, 0), (0, 0), (0, pad)), constant_values=1.0)
        return a

    qp_bl = [
        prep(qp.Q, nx * nx), prep(qp.R, nu * nu), prep(qp.S, nu * nx),
        prep(qp.A, nx * nx), prep(qp.B, nx * nu), prep(qp.q, nx),
        prep(qp.r, nu), prep(qp.c, nx),
        prep(qp.lb_u, nu), prep(qp.ub_u, nu),
        prep(qp.lb_x, nbx), prep(qp.ub_x, nbx),
        prep(qp.C, M * nx), prep(qp.hval, M), prep(qp.zl, M), prep(qp.Zl, M),
    ]

    # ---- initialization (same as solve_ocp_qp, done in XLA) -------------
    def fwd(dxk, inp):
        Ak, ck = inp
        return (jnp.einsum("...ij,...j->...i", Ak, dxk) + ck,) * 2

    _, dxs = jax.lax.scan(fwd, qp.dx0,
                          (jnp.moveaxis(qp.A, 1, 0), jnp.moveaxis(qp.c, 1, 0)))
    dx = jnp.concatenate([qp.dx0[:, None, :], jnp.moveaxis(dxs, 0, 1)], axis=1)
    du = jnp.zeros_like(qp.r)
    t_min = jnp.asarray(0.1, dtype)
    g_h = qp.hval + jnp.einsum("...mi,...i->...m", qp.C, dx)
    s0 = jnp.maximum(t_min, t_min - g_h)
    mu0 = jnp.asarray(1.0, dtype)

    def init_pair(expr):
        t = jnp.maximum(expr, t_min)
        return t, mu0 / t

    idx = jnp.asarray(IDXBX)
    t_ul, l_ul = init_pair(du - qp.lb_u)
    t_uu, l_uu = init_pair(qp.ub_u - du)
    t_xl, l_xl = init_pair(dx[..., idx] - qp.lb_x)
    t_xu, l_xu = init_pair(qp.ub_x - dx[..., idx])
    t_h = jnp.maximum(g_h + s0, t_min)
    l_h = mu0 / t_h
    l_s = mu0 / s0

    st = _BL(
        dx=prep(dx, nx), du=prep(du, nu), s=prep(s0, M),
        nu=prep(jnp.zeros_like(qp.c), nx),
        t_ul=prep(t_ul, nu), l_ul=prep(l_ul, nu),
        t_uu=prep(t_uu, nu), l_uu=prep(l_uu, nu),
        t_xl=prep(t_xl, nbx), l_xl=prep(l_xl, nbx),
        t_xu=prep(t_xu, nbx), l_xu=prep(l_xu, nbx),
        t_h=prep(t_h, M), l_h=prep(l_h, M), l_s=prep(l_s, M),
    )

    Bp = st.dx.shape[-1]
    grid = (Bp // tile,)

    def spec(stages, width):
        return pl.BlockSpec((stages, width, tile), lambda b: (0, 0, b),
                            memory_space=pltpu.VMEM)

    state_specs = [
        spec(N + 1, nx), spec(N, nu), spec(N + 1, M), spec(N, nx),
        spec(N, nu), spec(N, nu), spec(N, nu), spec(N, nu),
        spec(N + 1, nbx), spec(N + 1, nbx), spec(N + 1, nbx), spec(N + 1, nbx),
        spec(N + 1, M), spec(N + 1, M), spec(N + 1, M),
    ]
    qp_specs = [
        spec(N + 1, nx * nx), spec(N, nu * nu), spec(N, nu * nx),
        spec(N, nx * nx), spec(N, nx * nu), spec(N + 1, nx), spec(N, nu),
        spec(N, nx), spec(N, nu), spec(N, nu), spec(N + 1, nbx),
        spec(N + 1, nbx), spec(N + 1, M * nx), spec(N + 1, M),
        spec(N + 1, M), spec(N + 1, M),
    ]
    state_shapes = [jax.ShapeDtypeStruct(a.shape, dtype) for a in st]
    kernel = functools.partial(
        _ip_iteration_kernel, nx, nu, N, M, nbx, reg, tau, tol, stat_tol,
        sigma_max, n_pairs)

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=qp_specs + state_specs,
        out_specs=tuple(state_specs) + (spec(1, 1), spec(1, 1)),
        out_shape=tuple(state_shapes) + (
            jax.ShapeDtypeStruct((1, 1, Bp), dtype),
            jax.ShapeDtypeStruct((1, 1, Bp), dtype)),
        scratch_shapes=[
            pltpu.VMEM((N, nx * nx, tile), dtype),
            pltpu.VMEM((N, nu * nx, tile), dtype),
            pltpu.VMEM((N, 3, tile), dtype),
        ],
        interpret=interpret,
    )

    def iteration(carry, _):
        outs = call(*qp_bl, *carry)
        new_state = _BL(*outs[:15])
        mu, stat = outs[15], outs[16]
        return new_state, (mu[0, 0], stat[0, 0])

    st, (mus, stats) = jax.lax.scan(iteration, st, None, length=iters)

    def unprep(a):
        return jnp.moveaxis(a, -1, 0)[:Bt]

    dx_out = unprep(st.dx)
    du_out = unprep(st.du)
    s_out = unprep(st.s)
    return IpSolution(dx=dx_out, du=du_out, s=s_out,
                      mu=mus[-1][:Bt], kappa=kappa, stat_res=stats[-1][:Bt])
