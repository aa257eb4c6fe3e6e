"""VMEM-estimator guard: ``fused_vmem_bytes`` must bracket reality.

VERDICT r4 item 8: the fused kernel's sublane-batch auto-selection trusts
the hand-maintained ``fused_vmem_bytes`` estimate; if a kernel edit makes
the estimate drift low, the auto-picked sb OOMs scoped VMEM at compile
time in production. This script compiles the ACTUAL kernel on the real
chip at the shipped (N, M, sb) corners with Mosaic's scoped-VMEM limit set
from the estimate itself:

- limit = estimate * (1 + MARGIN_HI): compile MUST SUCCEED — the estimate
  is not materially UNDER the kernel's true scoped footprint;
- limit = estimate * (1 - MARGIN_LO): compile MUST FAIL with Mosaic's
  scoped-allocation error — the estimate is not wildly OVER either (i.e.
  the kernel really uses roughly what the model says).

Prints one JSON verdict line; exit 0 iff every corner brackets.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

MARGIN_HI = 0.15
MARGIN_LO = 0.30
# shipped corners: production N=20/M=5 at auto sb=8; long-horizon
# N=40/M=8 auto-degrades to sb=2 (ip_pallas auto-selection)
CORNERS = [(20, 5, 8), (40, 8, 2)]


def try_compile(N, M, sb, limit_bytes):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from doa_mpc_tpu.config import SolverOptions, WorldSpec, default_cost_params
    from doa_mpc_tpu.ops.ip_pallas import solve_ocp_qp_fused
    from doa_mpc_tpu.sim.closed_loop import init_loop_state
    from doa_mpc_tpu.sim.obstacles import predict_trajectory, robot_start_goal
    from doa_mpc_tpu.solver.sqp_rti import (
        UNICYCLE_QP_STRUCTURE, make_rti_controller)

    spec = WorldSpec(tf=N / 10.0, n_solv=N, n_obst=M, qp_iter=2)
    opts = SolverOptions(qp_iter=2, integrator="rk4")
    ctrl = make_rti_controller(spec, opts, dtype=jnp.float32)
    params = default_cost_params(spec, dtype=jnp.float32)
    start, goal = robot_start_goal(spec)
    B = sb * 128
    st = init_loop_state(jax.random.PRNGKey(0), ctrl,
                         start.astype(np.float32), goal, "RANDOM",
                         batch_shape=(B,))
    pred = predict_trajectory(st.obst, spec, N)
    pred = jnp.moveaxis(pred, 0, 1)
    qp = jax.jit(jax.vmap(
        lambda rti, x0, p: ctrl.build_qp(rti, x0, goal, p, params)
    ))(st.rti, st.x0, pred)
    try:
        sol = solve_ocp_qp_fused(
            qp, iters=2, sublane_batch=sb,
            structure=UNICYCLE_QP_STRUCTURE, vmem_limit_bytes=limit_bytes)
        jax.block_until_ready(sol.du)
        return True, ""
    except Exception as e:  # Mosaic scoped-vmem errors surface as XlaError
        return False, f"{type(e).__name__}: {e}"[:300]


def main():
    from doa_mpc_tpu.ops.ip_pallas import fused_vmem_bytes
    from doa_mpc_tpu.solver.sqp_rti import UNICYCLE_QP_STRUCTURE

    results = []
    ok = True
    for N, M, sb in CORNERS:
        est = fused_vmem_bytes(N, M, sb=sb, structure=UNICYCLE_QP_STRUCTURE)
        hi = int(est * (1 + MARGIN_HI))
        lo = int(est * (1 - MARGIN_LO))
        ok_hi, err_hi = try_compile(N, M, sb, hi)
        ok_lo, err_lo = try_compile(N, M, sb, lo)
        corner = {
            "N": N, "M": M, "sb": sb, "estimate_bytes": est,
            "compile_at_estimate_x1.15": ok_hi,
            "compile_at_estimate_x0.70": ok_lo,
            "hi_err": err_hi if not ok_hi else "",
            "lo_err": err_lo[:160] if not ok_lo else "",
            "brackets": bool(ok_hi and not ok_lo),
        }
        results.append(corner)
        ok = ok and corner["brackets"]
        print(f"# N={N} M={M} sb={sb}: est {est/2**20:.2f} MiB, "
              f"hi-compile {ok_hi}, lo-compile {ok_lo}", flush=True)

    verdict = {"ok": ok, "margin_hi": MARGIN_HI, "margin_lo": MARGIN_LO,
               "corners": results}
    os.makedirs("results", exist_ok=True)
    with open("results/vmem_guard_r5.json", "w") as f:
        json.dump(verdict, f, indent=1)
    print(json.dumps(verdict))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
