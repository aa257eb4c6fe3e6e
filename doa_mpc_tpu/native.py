"""ctypes bindings for the native CPU OCP core (``native/ocp_core.cpp``).

Loads (building on demand if needed) the dependency-free C++ library that
mirrors the reference's acados-C tier: a dense Riccati LQR solve and the
unicycle RK4/IRK integrators. Used as an independent oracle for the JAX
kernels and as a CPU-only runtime.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libocp_core.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(_LIB_PATH)
    dp = ctypes.POINTER(ctypes.c_double)
    lib.ocp_riccati_solve.restype = ctypes.c_int
    lib.ocp_riccati_solve.argtypes = (
        [ctypes.c_int] * 3 + [dp] * 9 + [ctypes.c_double] + [dp] * 2)
    lib.unicycle_rk4.restype = None
    lib.unicycle_rk4.argtypes = [dp, dp, ctypes.c_double, dp]
    lib.unicycle_irk3.restype = None
    lib.unicycle_irk3.argtypes = [dp, dp, ctypes.c_double, ctypes.c_int, dp]
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def _c(arr):
    a = np.ascontiguousarray(arr, dtype=np.float64)
    return a, a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def riccati_solve(Q, q, R, r, S, A, B, d, x0, reg: float = 0.0):
    """Native dense Riccati solve; same problem as ops.riccati."""
    lib = _load()
    N, nx, nu = A.shape[0], A.shape[1], B.shape[2]
    x_out = np.zeros((N + 1, nx))
    u_out = np.zeros((N, nu))
    holds = [_c(v) for v in (Q, q, R, r, S, A, B, d, x0)]
    ptrs = [h[1] for h in holds]
    xo, xo_p = _c(x_out)
    uo, uo_p = _c(u_out)
    status = lib.ocp_riccati_solve(N, nx, nu, *ptrs, ctypes.c_double(reg),
                                   xo_p, uo_p)
    if status != 0:
        raise RuntimeError(f"native riccati failed with status {status}")
    return xo, uo


def rk4_step(x, u, dt: float):
    lib = _load()
    out = np.zeros(5)
    xa, xp = _c(x)
    ua, up = _c(u)
    oa, op = _c(out)
    lib.unicycle_rk4(xp, up, ctypes.c_double(dt), op)
    return oa


def irk3_step(x, u, dt: float, iters: int = 10):
    lib = _load()
    out = np.zeros(5)
    xa, xp = _c(x)
    ua, up = _c(u)
    oa, op = _c(out)
    lib.unicycle_irk3(xp, up, ctypes.c_double(dt), iters, op)
    return oa
