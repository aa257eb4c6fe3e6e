"""Speed-of-light accounting for the fused interior-point kernel.

VERDICT r4 item 4: the old SOL model assumed the XLA path's HBM traffic
(2 passes per IP iteration); the fused kernel reads the QP data ONCE per
solve. This script measures the production tick on the real chip, fits the
per-IP-iteration cost from a qp_iter sweep (RTT cancelled by chain-length
differencing, the bench.py methodology), and emits the roofline
decomposition from the corrected model
(``utils/profiling.speed_of_light_report(backend='fused')``) plus the
binding-resource verdict, to ``results/sol_r5.json``.

Evidence lines the verdict rests on:
- HBM: one QP read + one result write per solve — exact byte count from
  the kernel's packed layouts; tens of microseconds at B=4096.
- MXU: unused by design at nx=5 (batch-lanes layout; a 5-wide contraction
  would idle >96% of the 128x128 systolic array).
- VPU: the measured per-iteration cost vs the single-cycle issue bound;
  the round-4 sublane sweep (tick 2.95/1.61/0.98 ms at sb=2/4/8 —
  near-linear in sublane occupancy) already shows the kernel scales with
  VECTOR ISSUE CAPACITY, not bandwidth.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BATCH = 4096
CHAIN_SHORT = 20
CHAIN_LONG = 120
QP_ITERS = (6, 12)


def device_tick(ctrl_factory, backend, qp_iter):
    import jax
    import jax.numpy as jnp

    tick = ctrl_factory(backend, qp_iter)

    def chain(ticks):
        @jax.jit
        def run(st):
            def body(s, _):
                return tick["tick"](s), None
            final, _ = jax.lax.scan(body, st, None, length=ticks)
            return final, jnp.sum(final.x0)
        return run

    def timed_best(run, st, reps=4):
        _, chk = run(st)
        float(chk)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            _, chk = run(st)
            float(chk)
            best = min(best, time.perf_counter() - t0)
        return best

    st = tick["state"]
    t_s = timed_best(chain(CHAIN_SHORT), st)
    t_l = timed_best(chain(CHAIN_LONG), st)
    return max(t_l - t_s, 1e-9) / (CHAIN_LONG - CHAIN_SHORT)


def main():
    import jax.numpy as jnp
    import jax

    from doa_mpc_tpu.config import SolverOptions, WorldSpec, default_cost_params
    from doa_mpc_tpu.sim.closed_loop import init_loop_state, make_batched_tick
    from doa_mpc_tpu.sim.obstacles import robot_start_goal
    from doa_mpc_tpu.solver.sqp_rti import make_rti_controller
    from doa_mpc_tpu.utils.profiling import (
        TPU_V5E_HBM_GBS, TPU_V5E_VPU_OPS, fused_hbm_bytes,
        speed_of_light_report)

    def factory(backend, qp_iter):
        spec = WorldSpec(tf=2.0, n_solv=20, qp_iter=qp_iter)
        opts = SolverOptions(qp_iter=qp_iter, integrator="rk4")
        ctrl = make_rti_controller(spec, opts, dtype=jnp.float32)
        params = default_cost_params(spec, dtype=jnp.float32)
        start, goal = robot_start_goal(spec)
        st = init_loop_state(jax.random.PRNGKey(0), ctrl,
                             start.astype(jnp.float32), goal, "RANDOM",
                             batch_shape=(BATCH,))
        return {"tick": make_batched_tick(ctrl, goal, params,
                                          backend=backend),
                "state": st}

    ticks = {}
    for it in QP_ITERS:
        ticks[it] = device_tick(factory, "fused", it)
        print(f"qp_iter={it}: tick {ticks[it]*1e3:.3f} ms", flush=True)
    # glue = everything but the QP solve (forecast/linearize/plant/world)
    glue = device_tick(factory, "zero", 6)
    print(f"glue (backend=zero): {glue*1e6:.1f} us", flush=True)

    # least-squares line tick = a + b * qp_iter over the sweep
    import numpy as np
    xs = np.array(QP_ITERS, float)
    ys = np.array([ticks[i] for i in QP_ITERS])
    b, a = np.polyfit(xs, ys, 1)

    spec = WorldSpec(tf=2.0, n_solv=20, qp_iter=6)
    rep = speed_of_light_report(spec, 6, BATCH, ticks[6], backend="fused")
    hbm_b = fused_hbm_bytes(spec, BATCH)
    per_iter_vpu_bound = rep["per_ip_iter_flops"] / TPU_V5E_VPU_OPS

    out = {
        "config": {"batch": BATCH, "n_solv": 20, "n_obst": 5,
                   "backend": "fused", "sublane_batch": "auto(8)"},
        "measured": {
            "tick_s_by_qp_iter": {str(k): v for k, v in ticks.items()},
            "glue_tick_s": glue,
            "per_ip_iter_s": b,
            "iter_independent_s": a,
        },
        "model": rep,
        "bounds": {
            "hbm_bytes_per_tick": hbm_b,
            "hbm_bound_s": hbm_b / (TPU_V5E_HBM_GBS * 1e9),
            "vpu_issue_bound_per_iter_s": per_iter_vpu_bound,
            "vpu_issue_bound_tick_s": rep["vpu_bound_tick_s"],
            "mxu_note": "unused by design at nx=5 (batch-lanes layout); "
                        "a 5-wide contraction would idle >96% of the "
                        "128x128 systolic array",
        },
        "verdict": {
            "binding_resource": "VPU issue rate + stage-serial dependency "
                                "chains",
            "evidence": [
                "HBM bound is a few % of the measured tick (one QP "
                "read/solve; exact bytes above)",
                "sb sweep r4: tick 2.95/1.61/0.98 ms at sb=2/4/8 — "
                "scales with sublane (vector issue) occupancy, which an "
                "HBM-bound kernel would not",
                "per-IP-iteration cost vs its single-cycle VPU issue "
                "bound (ratio below); the residual multiple is "
                "multi-cycle ops (div/rsqrt in the barrier updates) and "
                "the N-serial Riccati recursion's dependency stalls",
            ],
            "measured_per_iter_vs_vpu_bound":
                b / per_iter_vpu_bound if per_iter_vpu_bound else None,
        },
    }
    os.makedirs("results", exist_ok=True)
    with open("results/sol_r5.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["verdict"], indent=1))


if __name__ == "__main__":
    main()
