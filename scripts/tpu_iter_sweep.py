"""Closed-loop quality + throughput vs interior-point iteration count.

The RTI controller warm-starts the QP's primal variables by shifting the
previous solution (``solver/sqp_rti.shift``), so the IP solve may need far
fewer than the reference's QP_ITER=50 HPIPM iterations
(``/root/reference/src/simulation/robot_ocp_problem.py:131``) to hold
closed-loop quality. This sweep measures collision / goal-reached rates
(RANDOM + EDGE, n seeds each) and the B=4096 tick latency at each iters,
and PERSISTS the result (per-cell CSVs in the reference 6-column schema +
summary.json) so the benchmark's qp_iter choice is backed by a committed
artifact rather than a comment. The default iteration list extends down to
2 to actually locate the quality cliff (ADVICE r2).

Usage: python scripts/tpu_iter_sweep.py [n_runs] [iters ...]
       (defaults: 256 seeds; iters 20 10 6 4 3 2)
Output: results/iter_sweep_r3/ (override with ITER_SWEEP_OUT env var)
"""

import sys
sys.path.insert(0, ".")

import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 256
iter_list = [int(a) for a in sys.argv[2:]] or [20, 10, 6, 4, 3, 2]
out_dir = os.environ.get("ITER_SWEEP_OUT", "results/iter_sweep_r3")
os.makedirs(out_dir, exist_ok=True)

from doa_mpc_tpu.config import SolverOptions, WorldSpec, default_cost_params
from doa_mpc_tpu.sim.closed_loop import init_loop_state, make_batched_tick
from doa_mpc_tpu.sim.experiments import run_scenario_batch
from doa_mpc_tpu.sim.obstacles import robot_start_goal
from doa_mpc_tpu.solver.sqp_rti import make_rti_controller

B, TICKS = 4096, 20
dtype = jnp.float32

spath = os.path.join(out_dir, "summary.json")
merged = {}
if os.path.exists(spath):
    with open(spath) as f:
        for r in json.load(f).get("rows", []):
            merged[r["iters"]] = r

for iters in iter_list:
    spec = WorldSpec(tf=2.0, n_solv=20, qp_iter=iters)
    opts = SolverOptions(qp_iter=iters, integrator="rk4")

    # --- throughput at B=4096 (same protocol as bench.py)
    ctrl = make_rti_controller(spec, opts, dtype=dtype)
    params = default_cost_params(spec, dtype=dtype)
    start, goal = robot_start_goal(spec)
    start, goal = start.astype(dtype), goal.astype(dtype)
    st0 = init_loop_state(jax.random.PRNGKey(0), ctrl, start, goal,
                          "RANDOM", batch_shape=(B,))
    tick = make_batched_tick(ctrl, goal, params, backend="fused")

    @jax.jit
    def run(st, _tick=tick):
        final, _ = jax.lax.scan(lambda s, _: (_tick(s), None), st, None,
                                length=TICKS)
        return final, jnp.sum(final.x0)

    _, chk = run(st0)
    float(chk)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _, chk = run(st0)
        float(chk)
        best = min(best, time.perf_counter() - t0)
    tick_ms = best / TICKS * 1e3
    print(f"iters={iters}: tick {tick_ms:.2f} ms  "
          f"({B / (best / TICKS):,.0f} solves/s)", flush=True)

    # --- closed-loop quality, both scenarios
    row = {"iters": iters, "tick_ms": round(tick_ms, 3),
           "solves_per_s": round(B / (best / TICKS), 1), "runs": n_runs}
    for scenario in ("RANDOM", "EDGE"):
        m = run_scenario_batch(spec, opts, scenario, n_runs=n_runs,
                               backend="fused")
        hit, reached = m[:, 0].mean(), m[:, 1].mean()
        oob = m[:, 5].mean()
        print(f"iters={iters} {scenario:6s}: collision {hit:.3f}  "
              f"reached {reached:.3f}  oob {oob:.3f}", flush=True)
        row[scenario] = {"hit": float(hit), "reached": float(reached),
                         "oob": float(oob)}
        np.savetxt(os.path.join(out_dir, f"iters{iters:03d}_{scenario}.csv"),
                   np.asarray(m), delimiter=";")
    merged[iters] = row
    # rewrite after every iters value: the TPU tunnel can kill the process
    rows = [merged[k] for k in sorted(merged, reverse=True)]
    with open(spath, "w") as f:
        json.dump({"batch": B, "n_runs": n_runs, "backend": "fused",
                   "integrator": "rk4", "spec": "tf=2 n_solv=20",
                   "rows": rows}, f, indent=1)
print(f"wrote {spath}")
