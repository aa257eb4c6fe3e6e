// Native CPU OCP core: Riccati LQR solve + RK4/IRK unicycle integrator.
//
// Role: the native runtime tier of the framework, mirroring what the
// reference reaches through the acados C library (SQP-RTI + HPIPM + IRK,
// /root/reference/src/simulation/robot_ocp_problem.py:126-136). The TPU
// compute path is JAX/Pallas; this library serves as
//   (a) an independent validation oracle for the JAX Riccati/LQR kernels
//       (tests/test_native.py cross-checks them bit-for-bit-ish), and
//   (b) a dependency-free single-scenario CPU runtime for deployments
//       without an accelerator.
//
// Dense, unblocked, column-agnostic (all row-major), no external BLAS: the
// stage matrices are 5x5/5x2 — loop overhead dwarfs any BLAS gain.
//
// Build: make -C native   (produces libocp_core.so, loaded via ctypes)

#include <cmath>
#include <cstring>
#include <vector>

namespace {

// Solve A x = b for SPD A (n x n, row-major) via Cholesky. Returns false if
// a pivot underflows.
bool cholesky_solve(int n, const double* A, const double* b, double* x,
                    double reg) {
  std::vector<double> L(n * n, 0.0);
  for (int i = 0; i < n; ++i) {
    for (int j = 0; j <= i; ++j) {
      double s = A[i * n + j];
      for (int k = 0; k < j; ++k) s -= L[i * n + k] * L[j * n + k];
      if (i == j) {
        s += reg;
        if (s <= 0.0) return false;
        L[i * n + i] = std::sqrt(s);
      } else {
        L[i * n + j] = s / L[j * n + j];
      }
    }
  }
  std::vector<double> y(n);
  for (int i = 0; i < n; ++i) {
    double s = b[i];
    for (int k = 0; k < i; ++k) s -= L[i * n + k] * y[k];
    y[i] = s / L[i * n + i];
  }
  for (int i = n - 1; i >= 0; --i) {
    double s = y[i];
    for (int k = i + 1; k < n; ++k) s -= L[k * n + i] * x[k];
    x[i] = s / L[i * n + i];
  }
  return true;
}

// C = A^T * B, A (k x m), B (k x n) -> C (m x n)
void at_b(int k, int m, int n, const double* A, const double* B, double* C) {
  for (int i = 0; i < m; ++i)
    for (int j = 0; j < n; ++j) {
      double s = 0.0;
      for (int l = 0; l < k; ++l) s += A[l * m + i] * B[l * n + j];
      C[i * n + j] = s;
    }
}

// C = A * B, A (m x k), B (k x n)
void a_b(int m, int k, int n, const double* A, const double* B, double* C) {
  for (int i = 0; i < m; ++i)
    for (int j = 0; j < n; ++j) {
      double s = 0.0;
      for (int l = 0; l < k; ++l) s += A[i * k + l] * B[l * n + j];
      C[i * n + j] = s;
    }
}

void a_x(int m, int n, const double* A, const double* x, double* y) {
  for (int i = 0; i < m; ++i) {
    double s = 0.0;
    for (int j = 0; j < n; ++j) s += A[i * n + j] * x[j];
    y[i] = s;
  }
}

}  // namespace

extern "C" {

// Backward-Riccati solve of the equality-constrained LQR:
//   min sum 1/2 x'Qx + q'x + 1/2 u'Ru + r'u + u'Sx,  x_{k+1}=Ax+Bu+d
// Layouts (row-major, stage-major):
//   Q (N+1)*nx*nx, q (N+1)*nx, R N*nu*nu, r N*nu, S N*nu*nx,
//   A N*nx*nx, B N*nx*nu, d N*nx, x0 nx
// Outputs: x (N+1)*nx, u N*nu. Returns 0 on success.
int ocp_riccati_solve(int N, int nx, int nu, const double* Q, const double* q,
                      const double* R, const double* r, const double* S,
                      const double* A, const double* B, const double* d,
                      const double* x0, double reg, double* x_out,
                      double* u_out) {
  std::vector<double> P((N + 1) * nx * nx), p((N + 1) * nx);
  std::vector<double> K(N * nu * nx), kff(N * nu);
  std::memcpy(&P[N * nx * nx], &Q[N * nx * nx], sizeof(double) * nx * nx);
  std::memcpy(&p[N * nx], &q[N * nx], sizeof(double) * nx);

  std::vector<double> PB(nx * nu), PA(nx * nx), Huu(nu * nu), Hux(nu * nx),
      tmp_u(nu), tmp_x(nx), Pd_p(nx), col(nu);

  for (int k = N - 1; k >= 0; --k) {
    const double* Pk1 = &P[(k + 1) * nx * nx];
    const double* pk1 = &p[(k + 1) * nx];
    const double* Ak = &A[k * nx * nx];
    const double* Bk = &B[k * nx * nu];
    const double* dk = &d[k * nx];

    a_b(nx, nx, nu, Pk1, Bk, PB.data());               // P B
    a_b(nx, nx, nx, Pk1, Ak, PA.data());               // P A
    at_b(nx, nu, nu, Bk, PB.data(), Huu.data());       // B'PB
    for (int i = 0; i < nu * nu; ++i) Huu[i] += R[k * nu * nu + i];
    at_b(nx, nu, nx, Bk, PA.data(), Hux.data());       // B'PA
    for (int i = 0; i < nu * nx; ++i) Hux[i] += S[k * nu * nx + i];

    // K = -Huu^{-1} Hux (column by column)
    std::vector<double> rhs(nu);
    for (int j = 0; j < nx; ++j) {
      for (int i = 0; i < nu; ++i) rhs[i] = Hux[i * nx + j];
      if (!cholesky_solve(nu, Huu.data(), rhs.data(), col.data(), reg))
        return 1;
      for (int i = 0; i < nu; ++i) K[k * nu * nx + i * nx + j] = -col[i];
    }
    // kff = -Huu^{-1} (r + B'(P d + p))
    a_x(nx, nx, Pk1, dk, Pd_p.data());
    for (int i = 0; i < nx; ++i) Pd_p[i] += pk1[i];
    at_b(nx, nu, 1, Bk, Pd_p.data(), tmp_u.data());
    for (int i = 0; i < nu; ++i) tmp_u[i] += r[k * nu + i];
    if (!cholesky_solve(nu, Huu.data(), tmp_u.data(), col.data(), reg))
      return 1;
    for (int i = 0; i < nu; ++i) kff[k * nu + i] = -col[i];

    // P_k = Q + A'PA + Hux'K ; p_k = q + A'(Pd+p) + K'(Huu kff + m)
    double* Pk = &P[k * nx * nx];
    at_b(nx, nx, nx, Ak, PA.data(), Pk);               // A'PA
    for (int i = 0; i < nx; ++i)
      for (int j = 0; j < nx; ++j) {
        double s = Q[k * nx * nx + i * nx + j];
        for (int l = 0; l < nu; ++l)
          s += Hux[l * nx + i] * K[k * nu * nx + l * nx + j];
        Pk[i * nx + j] += s;
      }
    // symmetrize
    for (int i = 0; i < nx; ++i)
      for (int j = i + 1; j < nx; ++j) {
        double m2 = 0.5 * (Pk[i * nx + j] + Pk[j * nx + i]);
        Pk[i * nx + j] = m2;
        Pk[j * nx + i] = m2;
      }
    // p_k = q + A'(Pd + p) + K' m,  m = r + B'(Pd + p)  (in tmp_u)
    double* pk = &p[k * nx];
    at_b(nx, nx, 1, Ak, Pd_p.data(), pk);
    for (int i = 0; i < nx; ++i) {
      double s = q[k * nx + i];
      for (int l = 0; l < nu; ++l)
        s += K[k * nu * nx + l * nx + i] * tmp_u[l];
      pk[i] += s;
    }
  }

  // forward rollout
  std::memcpy(x_out, x0, sizeof(double) * nx);
  for (int k = 0; k < N; ++k) {
    const double* xk = &x_out[k * nx];
    double* uk = &u_out[k * nu];
    for (int i = 0; i < nu; ++i) {
      double s = kff[k * nu + i];
      for (int j = 0; j < nx; ++j) s += K[k * nu * nx + i * nx + j] * xk[j];
      uk[i] = s;
    }
    double* xk1 = &x_out[(k + 1) * nx];
    for (int i = 0; i < nx; ++i) {
      double s = d[k * nx + i];
      for (int j = 0; j < nx; ++j) s += A[k * nx * nx + i * nx + j] * xk[j];
      for (int j = 0; j < nu; ++j) s += B[k * nx * nu + i * nu + j] * uk[j];
      xk1[i] = s;
    }
  }
  return 0;
}

// Unicycle dynamics f(s, u) (robot_model.py:39-43)
static void unicycle_f(const double* s, const double* u, double* out) {
  out[0] = s[3] * std::cos(s[2]);
  out[1] = s[3] * std::sin(s[2]);
  out[2] = s[4];
  out[3] = u[0];
  out[4] = u[1];
}

// RK4 step for the unicycle (nx=5, nu=2)
void unicycle_rk4(const double* x, const double* u, double dt, double* out) {
  double k1[5], k2[5], k3[5], k4[5], t[5];
  unicycle_f(x, u, k1);
  for (int i = 0; i < 5; ++i) t[i] = x[i] + 0.5 * dt * k1[i];
  unicycle_f(t, u, k2);
  for (int i = 0; i < 5; ++i) t[i] = x[i] + 0.5 * dt * k2[i];
  unicycle_f(t, u, k3);
  for (int i = 0; i < 5; ++i) t[i] = x[i] + dt * k3[i];
  unicycle_f(t, u, k4);
  for (int i = 0; i < 5; ++i)
    out[i] = x[i] + dt / 6.0 * (k1[i] + 2 * k2[i] + 2 * k3[i] + k4[i]);
}

// Fixed-point IRK (3-stage Radau IIA, robot_sim.py:25-29 config) for the
// unicycle; `iters` functional iterations (the dynamics are mildly stiff at
// worst, convergence is fast at dt=0.1).
void unicycle_irk3(const double* x, const double* u, double dt, int iters,
                   double* out) {
  static const double A3[3][3] = {
      {0.19681547722366044, -0.06553542585019838, 0.02377097434822015},
      {0.39442431473908913, 0.29207341166522843, -0.04154875212599793},
      {0.37640306270046725, 0.51248582618842153, 0.1111111111111111}};
  static const double b3[3] = {0.37640306270046725, 0.51248582618842153,
                               0.1111111111111111};
  double K[3][5], Z[5];
  unicycle_f(x, u, K[0]);
  std::memcpy(K[1], K[0], sizeof(K[0]));
  std::memcpy(K[2], K[0], sizeof(K[0]));
  for (int it = 0; it < iters; ++it) {
    for (int s = 0; s < 3; ++s) {
      for (int i = 0; i < 5; ++i) {
        double acc = x[i];
        for (int j = 0; j < 3; ++j) acc += dt * A3[s][j] * K[j][i];
        Z[i] = acc;
      }
      unicycle_f(Z, u, K[s]);
    }
  }
  for (int i = 0; i < 5; ++i) {
    double acc = x[i];
    for (int j = 0; j < 3; ++j) acc += dt * b3[j] * K[j][i];
    out[i] = acc;
  }
}

}  // extern "C"
