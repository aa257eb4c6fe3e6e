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

VMEM discipline: every loose SSA vector occupies a padded (8, 128) register
tile, so holding whole-horizon quantities as Python lists blows the 16 MB
scoped-VMEM budget. All values that cross a stage-loop boundary therefore
live in dense VMEM *scratch arrays* (residuals, Riccati factors, affine and
corrector deltas); the kernel proceeds in stage-local passes whose live set
is O(stage), not O(horizon).

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
                         P_s, K_s, L_s, KFF, PN,
                         RX, RU, RUL, RUU, RXL, RXU, RH, RS,
                         ATU, ALU, ATV, ALV, AXL, ALXL, AXU, ALXU,
                         ATH, ALH, AS_, ALS,
                         DDX, DDU, DNU, DS2,
                         CTU, CLU, CTV, CLV, CXL, CLXL, CXU, CLXU,
                         CTH, CLH, CLS):
    idxbx = list(IDXBX)
    f32max = 3.0e38

    def Zl_at(k):
        return [jnp.maximum(Zl_ref[k, m], _ZL_FLOOR) for m in range(M)]

    def sig(l, t):
        return jnp.clip(l / jnp.maximum(t, _T_FLOOR), 0.0, sigma_max)

    def sigmas_x(k):
        sxl = [sig(lxl_i[k, i], txl_i[k, i]) for i in range(nbx)]
        sxu = [sig(lxu_i[k, i], txu_i[k, i]) for i in range(nbx)]
        return sxl, sxu

    def sigmas_u(k):
        sul = [sig(lul_i[k, i], tul_i[k, i]) for i in range(nu)]
        suu = [sig(luu_i[k, i], tuu_i[k, i]) for i in range(nu)]
        return sul, suu

    def sigmas_h(k):
        sh = [sig(lh_i[k, m], th_i[k, m]) for m in range(M)]
        ss = [sig(ls_i[k, m], s_i[k, m]) for m in range(M)]
        Zk = Zl_at(k)
        zeta = [Zk[m] + sh[m] + ss[m] for m in range(M)]
        seff = [sh[m] * (Zk[m] + ss[m]) / zeta[m] for m in range(M)]
        return sh, ss, zeta, seff

    # ================= PHASE 0: residuals -> scratch ====================
    mu = jnp.zeros_like(dx_i[0, 0])
    stat = jnp.zeros_like(mu)
    for k in range(N + 1):
        dxk = _vec(dx_i, k, nx)
        Ck = _mat(C_ref, k, M, nx)
        # x-box residuals + complementarity
        for i in range(nbx):
            RXL[k, i] = dxk[idxbx[i]] - lbx_ref[k, i] - txl_i[k, i]
            RXU[k, i] = ubx_ref[k, i] - dxk[idxbx[i]] - txu_i[k, i]
            mu = mu + txl_i[k, i] * lxl_i[k, i] + txu_i[k, i] * lxu_i[k, i]
        # soft constraint residuals
        Cdx = _mv(Ck, dxk)
        Zk = Zl_at(k)
        for m in range(M):
            g = h_ref[k, m] + Cdx[m]
            RH[k, m] = g + s_i[k, m] - th_i[k, m]
            RS[k, m] = (Zk[m] * s_i[k, m] + zl_ref[k, m]
                        - lh_i[k, m] - ls_i[k, m])
            mu = mu + th_i[k, m] * lh_i[k, m] + s_i[k, m] * ls_i[k, m]
        # stationarity wrt x
        Qk = _mat(Q_ref, k, nx, nx)
        acc = _vadd(_mv(Qk, dxk), _vec(q_ref, k, nx))
        if k < N:
            Sk = _mat(S_ref, k, nu, nx)
            acc = _vadd(acc, _mv(_mt(Sk), _vec(du_i, k, nu)))
            Ak = _mat(A_ref, k, nx, nx)
            Atn = _mv(_mt(Ak), _vec(nu_i, k, nx))
            acc = [acc[i] - Atn[i] for i in range(nx)]
        if k >= 1:
            acc = _vadd(acc, _vec(nu_i, k - 1, nx))
        for i in range(nbx):
            acc[idxbx[i]] = acc[idxbx[i]] - (lxl_i[k, i] - lxu_i[k, i])
        Ctl = _mv(_mt(Ck), _vec(lh_i, k, M))
        for i in range(nx):
            RX[k, i] = acc[i] - Ctl[i]
            if k >= 1:
                stat = jnp.maximum(stat, jnp.abs(acc[i] - Ctl[i]))
    for k in range(N):
        duk = _vec(du_i, k, nu)
        for i in range(nu):
            RUL[k, i] = duk[i] - lbu_ref[k, i] - tul_i[k, i]
            RUU[k, i] = ubu_ref[k, i] - duk[i] - tuu_i[k, i]
            mu = mu + tul_i[k, i] * lul_i[k, i] + tuu_i[k, i] * luu_i[k, i]
        Rk = _mat(R_ref, k, nu, nu)
        Sk = _mat(S_ref, k, nu, nx)
        Bk = _mat(B_ref, k, nx, nu)
        acc = _vadd(_vadd(_mv(Rk, duk), _vec(r_ref, k, nu)),
                    _mv(Sk, _vec(dx_i, k, nx)))
        Btn = _mv(_mt(Bk), _vec(nu_i, k, nx))
        for i in range(nu):
            RU[k, i] = acc[i] - Btn[i] - (lul_i[k, i] - luu_i[k, i])
            stat = jnp.maximum(stat, jnp.abs(RU[k, i]))
    mu = mu / n_pairs

    # ================= PHASE 1: factorization ===========================
    # P_N = Qbar_N computed inline; P carried as stage-local live matrix.
    def Qbar_at(k):
        Qk = _mat(Q_ref, k, nx, nx)
        sxl, sxu = sigmas_x(k)
        for i in range(nbx):
            Qk[idxbx[i]][idxbx[i]] = Qk[idxbx[i]][idxbx[i]] + sxl[i] + sxu[i]
        _, _, _, seff = sigmas_h(k)
        Ck = _mat(C_ref, k, M, nx)
        for i in range(nx):
            for j in range(i, nx):
                acc = Qk[i][j]
                for m in range(M):
                    acc = acc + Ck[m][i] * seff[m] * Ck[m][j]
                Qk[i][j] = acc
                if j != i:
                    Qk[j][i] = acc
        return Qk

    P = Qbar_at(N)
    for k in range(N - 1, -1, -1):
        _store_mat(P_s, k, P)
        Ak = _mat(A_ref, k, nx, nx)
        Bk = _mat(B_ref, k, nx, nu)
        BT = _mt(Bk)
        PB = _mm(P, Bk)
        PA = _mm(P, Ak)
        Rk = _mat(R_ref, k, nu, nu)
        sul, suu = sigmas_u(k)
        for i in range(nu):
            Rk[i][i] = Rk[i][i] + sul[i] + suu[i]
        Huu = _madd(Rk, _mm(BT, PB))
        Sk = _mat(S_ref, k, nu, nx)
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
        AT = _mt(Ak)
        Pk = _madd(Qbar_at(k), _madd(_mm(AT, PA), _mm(_mt(Hux), Kk)))
        P = [[0.5 * (Pk[i][j] + Pk[j][i]) for j in range(nx)]
             for i in range(nx)]

    # ================= direction machinery ==============================
    def betas_at(k, corrector, mu_t):
        """Per-stage beta lists for every group (predictor: -lambda)."""
        if not corrector:
            b_ul = [-lul_i[k, i] for i in range(nu)] if k < N else None
            b_uu = [-luu_i[k, i] for i in range(nu)] if k < N else None
            b_xl = [-lxl_i[k, i] for i in range(nbx)]
            b_xu = [-lxu_i[k, i] for i in range(nbx)]
            b_h = [-lh_i[k, m] for m in range(M)]
            b_s = [-ls_i[k, m] for m in range(M)]
        else:
            def bc2(t, l, dt_a, dl_a):
                return (mu_t - t * l - dt_a * dl_a) / jnp.maximum(t, _T_FLOOR)

            b_ul = ([bc2(tul_i[k, i], lul_i[k, i], ATU[k, i], ALU[k, i])
                     for i in range(nu)] if k < N else None)
            b_uu = ([bc2(tuu_i[k, i], luu_i[k, i], ATV[k, i], ALV[k, i])
                     for i in range(nu)] if k < N else None)
            b_xl = [bc2(txl_i[k, i], lxl_i[k, i], AXL[k, i], ALXL[k, i])
                    for i in range(nbx)]
            b_xu = [bc2(txu_i[k, i], lxu_i[k, i], AXU[k, i], ALXU[k, i])
                    for i in range(nbx)]
            b_h = [bc2(th_i[k, m], lh_i[k, m], ATH[k, m], ALH[k, m])
                   for m in range(M)]
            b_s = [bc2(s_i[k, m], ls_i[k, m], AS_[k, m], ALS[k, m])
                   for m in range(M)]
        return b_ul, b_uu, b_xl, b_xu, b_h, b_s

    def qbar_at(k, corrector, mu_t):
        b_ul, b_uu, b_xl, b_xu, b_h, b_s = betas_at(k, corrector, mu_t)
        sxl, sxu = sigmas_x(k)
        sh, ss, zeta, _ = sigmas_h(k)
        acc = [RX[k, i] for i in range(nx)]
        for i in range(nbx):
            acc[idxbx[i]] = (acc[idxbx[i]]
                             - (b_xl[i] - sxl[i] * RXL[k, i])
                             + (b_xu[i] - sxu[i] * RXU[k, i]))
        Ck = _mat(C_ref, k, M, nx)
        bh_hat = []
        for m in range(M):
            rho = (-RS[k, m] + b_h[m] + b_s[m] - sh[m] * RH[k, m])
            bh_hat.append(b_h[m] - sh[m] * RH[k, m] - sh[m] * rho / zeta[m])
        Ctb = _mv(_mt(Ck), bh_hat)
        return [acc[i] - Ctb[i] for i in range(nx)]

    def rbar_at(k, corrector, mu_t):
        b_ul, b_uu, _, _, _, _ = betas_at(k, corrector, mu_t)
        sul, suu = sigmas_u(k)
        return [RU[k, i] - (b_ul[i] - sul[i] * RUL[k, i])
                + (b_uu[i] - suu[i] * RUU[k, i]) for i in range(nu)]

    def direction_pass(corrector, mu_t=None):
        """Backward gradient pass + forward rollout + recovery.

        Writes per-pair deltas into the aff (A*) or corrector (C*) scratch
        arrays; corrector also stores DDX/DDU/DNU/DS2 for the update pass.
        Returns the (a_prim_raw, a_dual_raw) step bounds (tau applied by
        caller) plus, for the corrector, a finiteness accumulator.
        """
        T = (CTU, CLU, CTV, CLV, CXL, CLXL, CXU, CLXU, CTH, CLH, CLS) \
            if corrector else (ATU, ALU, ATV, ALV, AXL, ALXL, AXU, ALXU,
                               ATH, ALH, ALS)
        (tTU, tLU, tTV, tLV, tXL, tLXL, tXU, tLXU, tTH, tLH, tLS) = T

        # backward
        p = qbar_at(N, corrector, mu_t)
        for k in range(N - 1, -1, -1):
            _store_vec(PN, k, p)
            Pk1 = _mat(P_s, k, nx, nx)
            L = (L_s[k, 0], L_s[k, 1], L_s[k, 2])
            Kk = _mat(K_s, k, nu, nx)
            ck = _vec(c_ref, k, nx)
            # d_k = -r_dyn_k; r_dyn recomputed here (not stored):
            Ak = _mat(A_ref, k, nx, nx)
            Bk = _mat(B_ref, k, nx, nu)
            Ax = _mv(Ak, _vec(dx_i, k, nx))
            Bu = _mv(Bk, _vec(du_i, k, nu))
            d = [-(dx_i[k + 1, i] - Ax[i] - Bu[i] - ck[i]) for i in range(nx)]
            Pd_p = _vadd(_mv(Pk1, d), p)
            BT = _mt(Bk)
            m_v = _vadd(rbar_at(k, corrector, mu_t), _mv(BT, Pd_p))
            kff = [-v for v in _chol2_solve(L, m_v)]
            _store_vec(KFF, k, kff)
            AT = _mt(Ak)
            p = _vadd(qbar_at(k, corrector, mu_t),
                      _vadd(_mv(AT, Pd_p), _mv(_mt(Kk), m_v)))

        # forward + recovery. The step-bound accumulators hold the RAW
        # min ratio (sentinel 2.0); the caller applies min(1, tau * raw) so
        # predictor (tau=1) and corrector (tau=0.99) match the XLA solver's
        # exact step rule.
        a_pr = jnp.full_like(mu, 2.0)
        a_du = jnp.full_like(mu, 2.0)
        chk = jnp.zeros_like(mu)

        def ftb(a, v, dv):
            neg = dv < 0
            denom = jnp.where(neg, -dv, 1.0)
            ratio = jnp.where(neg, v / denom, 2.0)
            return jnp.minimum(a, ratio)

        xk = [jnp.zeros_like(mu) for _ in range(nx)]
        for k in range(N + 1):
            # soft / x-box recovery at stage k (uses current xk = Ddx_k)
            b_ul, b_uu, b_xl, b_xu, b_h, b_s = betas_at(k, corrector, mu_t)
            sxl, sxu = sigmas_x(k)
            sh, ss, zeta, _ = sigmas_h(k)
            Ck = _mat(C_ref, k, M, nx)
            CD = _mv(Ck, xk)
            for m in range(M):
                rho = (-RS[k, m] + b_h[m] + b_s[m] - sh[m] * RH[k, m])
                ds = (rho - sh[m] * CD[m]) / zeta[m]
                dth = CD[m] + ds + RH[k, m]
                dlh = b_h[m] - sh[m] * dth
                dls = b_s[m] - ss[m] * ds
                tTH[k, m] = dth
                tLH[k, m] = dlh
                tLS[k, m] = dls
                if corrector:
                    DS2[k, m] = ds
                    chk = chk + ds
                else:
                    AS_[k, m] = ds
                a_pr = ftb(ftb(a_pr, th_i[k, m], dth), s_i[k, m], ds)
                a_du = ftb(ftb(a_du, lh_i[k, m], dlh), ls_i[k, m], dls)
            for i in range(nbx):
                dtxl = xk[idxbx[i]] + RXL[k, i]
                dtxu = -xk[idxbx[i]] + RXU[k, i]
                dlxl = b_xl[i] - sxl[i] * dtxl
                dlxu = b_xu[i] - sxu[i] * dtxu
                tXL[k, i] = dtxl
                tXU[k, i] = dtxu
                tLXL[k, i] = dlxl
                tLXU[k, i] = dlxu
                a_pr = ftb(ftb(a_pr, txl_i[k, i], dtxl), txu_i[k, i], dtxu)
                a_du = ftb(ftb(a_du, lxl_i[k, i], dlxl), lxu_i[k, i], dlxu)
            if corrector:
                _store_vec(DDX, k, xk)
                for i in range(nx):
                    chk = chk + xk[i]
            if k == N:
                break
            # control + step to k+1
            Kk = _mat(K_s, k, nu, nx)
            kff = _vec(KFF, k, nu)
            uk = _vadd(_mv(Kk, xk), kff)
            sul, suu = sigmas_u(k)
            for i in range(nu):
                dtul = uk[i] + RUL[k, i]
                dtuu = -uk[i] + RUU[k, i]
                dlul = b_ul[i] - sul[i] * dtul
                dluu = b_uu[i] - suu[i] * dtuu
                tTU[k, i] = dtul
                tTV[k, i] = dtuu
                tLU[k, i] = dlul
                tLV[k, i] = dluu
                a_pr = ftb(ftb(a_pr, tul_i[k, i], dtul), tuu_i[k, i], dtuu)
                a_du = ftb(ftb(a_du, lul_i[k, i], dlul), luu_i[k, i], dluu)
            if corrector:
                _store_vec(DDU, k, uk)
                for i in range(nu):
                    chk = chk + uk[i]
            Ak = _mat(A_ref, k, nx, nx)
            Bk = _mat(B_ref, k, nx, nu)
            ck = _vec(c_ref, k, nx)
            Ax = _mv(Ak, _vec(dx_i, k, nx))
            Bu = _mv(Bk, _vec(du_i, k, nu))
            d = [-(dx_i[k + 1, i] - Ax[i] - Bu[i] - ck[i]) for i in range(nx)]
            xk = _vadd(_vadd(_mv(Ak, xk), _mv(Bk, uk)), d)
            if corrector:
                Pk1 = _mat(P_s, k, nx, nx)
                Px = _mv(Pk1, xk)
                pn = _vec(PN, k, nx)
                _store_vec(DNU, k, [-(Px[i] + pn[i]) for i in range(nx)])
        return a_pr, a_du, chk

    # ================= predictor ========================================
    ap_raw0, ad_raw0, _ = direction_pass(False)
    ap_aff = jnp.minimum(ap_raw0, 1.0)
    ad_aff = jnp.minimum(ad_raw0, 1.0)

    mu_aff = jnp.zeros_like(mu)
    for k in range(N):
        for i in range(nu):
            mu_aff = (mu_aff
                      + (tul_i[k, i] + ap_aff * ATU[k, i])
                      * (lul_i[k, i] + ad_aff * ALU[k, i])
                      + (tuu_i[k, i] + ap_aff * ATV[k, i])
                      * (luu_i[k, i] + ad_aff * ALV[k, i]))
    for k in range(N + 1):
        for i in range(nbx):
            mu_aff = (mu_aff
                      + (txl_i[k, i] + ap_aff * AXL[k, i])
                      * (lxl_i[k, i] + ad_aff * ALXL[k, i])
                      + (txu_i[k, i] + ap_aff * AXU[k, i])
                      * (lxu_i[k, i] + ad_aff * ALXU[k, i]))
        for m in range(M):
            mu_aff = (mu_aff
                      + (th_i[k, m] + ap_aff * ATH[k, m])
                      * (lh_i[k, m] + ad_aff * ALH[k, m])
                      + (s_i[k, m] + ap_aff * AS_[k, m])
                      * (ls_i[k, m] + ad_aff * ALS[k, m]))
    mu_aff = mu_aff / n_pairs
    sig_c = jnp.clip((mu_aff / jnp.maximum(mu, _T_FLOOR)) ** 3, 0.0, 1.0)
    mu_t = sig_c * mu

    # ================= corrector ========================================
    ap_raw, ad_raw, chk = direction_pass(True, mu_t)
    a_p = jnp.minimum(tau * ap_raw, 1.0)
    a_d = jnp.minimum(tau * ad_raw, 1.0)

    converged = (mu < tol) & (stat < stat_tol)
    finite = (jnp.abs(chk) < f32max) & (chk == chk) & \
        (a_p == a_p) & (a_d == a_d)
    frozen = converged | ~finite

    tiny = 1e-30

    def upd(old, a, step, positive=False):
        v = old + a * step
        if positive:
            v = jnp.maximum(v, tiny)
        return jnp.where(frozen, old, v)

    # ================= state update =====================================
    for k in range(N + 1):
        for i in range(nx):
            dx_o[k, i] = upd(dx_i[k, i], a_p, DDX[k, i])
        for m in range(M):
            s_o[k, m] = upd(s_i[k, m], a_p, DS2[k, m], True)
            th_o[k, m] = upd(th_i[k, m], a_p, CTH[k, m], True)
            lh_o[k, m] = upd(lh_i[k, m], a_d, CLH[k, m], True)
            ls_o[k, m] = upd(ls_i[k, m], a_d, CLS[k, m], True)
        for i in range(nbx):
            txl_o[k, i] = upd(txl_i[k, i], a_p, CXL[k, i], True)
            lxl_o[k, i] = upd(lxl_i[k, i], a_d, CLXL[k, i], True)
            txu_o[k, i] = upd(txu_i[k, i], a_p, CXU[k, i], True)
            lxu_o[k, i] = upd(lxu_i[k, i], a_d, CLXU[k, i], True)
    for k in range(N):
        for i in range(nu):
            du_o[k, i] = upd(du_i[k, i], a_p, DDU[k, i])
            tul_o[k, i] = upd(tul_i[k, i], a_p, CTU[k, i], True)
            lul_o[k, i] = upd(lul_i[k, i], a_d, CLU[k, i], True)
            tuu_o[k, i] = upd(tuu_i[k, i], a_p, CTV[k, i], True)
            luu_o[k, i] = upd(luu_i[k, i], a_d, CLV[k, i], True)
        for i in range(nx):
            nu_o[k, i] = upd(nu_i[k, i], a_d, DNU[k, i])
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
        nxt = jnp.einsum("...ij,...j->...i", Ak, dxk) + ck
        return nxt, nxt

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

    def scr(stages, width):
        return pltpu.VMEM((stages, width, tile), dtype)

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

    # aff deltas: t_ul, l_ul, t_uu, l_uu, t_xl, l_xl, t_xu, l_xu,
    #             t_h, l_h, s, l_s   (12 arrays; the s-delta is AS_)
    aff_scratch = [
        scr(N, nu), scr(N, nu), scr(N, nu), scr(N, nu),
        scr(N + 1, nbx), scr(N + 1, nbx), scr(N + 1, nbx), scr(N + 1, nbx),
        scr(N + 1, M), scr(N + 1, M), scr(N + 1, M), scr(N + 1, M),
    ]
    # corrector deltas: same minus the s-delta (stored in DS2) -> 11 arrays
    cor_scratch = [
        scr(N, nu), scr(N, nu), scr(N, nu), scr(N, nu),
        scr(N + 1, nbx), scr(N + 1, nbx), scr(N + 1, nbx), scr(N + 1, nbx),
        scr(N + 1, M), scr(N + 1, M), scr(N + 1, M),
    ]
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=qp_specs + state_specs,
        out_specs=tuple(state_specs) + (spec(1, 1), spec(1, 1)),
        out_shape=tuple(state_shapes) + (
            jax.ShapeDtypeStruct((1, 1, Bp), dtype),
            jax.ShapeDtypeStruct((1, 1, Bp), dtype)),
        scratch_shapes=(
            [scr(N, nx * nx), scr(N, nu * nx), scr(N, 3),        # P, K, L
             scr(N, nu), scr(N, nx),                             # KFF, PN
             scr(N + 1, nx), scr(N, nu), scr(N, nu), scr(N, nu),  # RX RU RUL RUU
             scr(N + 1, nbx), scr(N + 1, nbx),                   # RXL RXU
             scr(N + 1, M), scr(N + 1, M)]                       # RH RS
            + aff_scratch
            + [scr(N + 1, nx), scr(N, nu), scr(N, nx), scr(N + 1, M)]
            + cor_scratch),
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

    return IpSolution(dx=unprep(st.dx), du=unprep(st.du), s=unprep(st.s),
                      mu=mus[-1][:Bt], kappa=kappa, stat_res=stats[-1][:Bt])
