"""Closed-loop quality + throughput vs interior-point iteration count.

The RTI controller warm-starts the QP's primal variables by shifting the
previous solution (``solver/sqp_rti.shift``), so the IP solve may need far
fewer than the reference's QP_ITER=50 HPIPM iterations
(``/root/reference/src/simulation/robot_ocp_problem.py:131``) to hold
closed-loop quality. This sweep measures collision / goal-reached rates
(RANDOM + EDGE, n seeds each) and the B=4096 tick latency at each iters.

Usage: python scripts/tpu_iter_sweep.py [n_runs] [iters ...]
       (defaults: 256 seeds; iters 20 14 10 8 6)
"""

import sys
sys.path.insert(0, ".")

import time

import numpy as np
import jax
import jax.numpy as jnp

n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 256
iter_list = [int(a) for a in sys.argv[2:]] or [20, 14, 10, 8, 6]

from doa_mpc_tpu.config import SolverOptions, WorldSpec, default_cost_params
from doa_mpc_tpu.sim.closed_loop import init_loop_state, make_batched_tick
from doa_mpc_tpu.sim.experiments import run_scenario_batch
from doa_mpc_tpu.sim.obstacles import robot_start_goal
from doa_mpc_tpu.solver.sqp_rti import make_rti_controller

B, TICKS = 4096, 20
dtype = jnp.float32

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
    for scenario in ("RANDOM", "EDGE"):
        m = run_scenario_batch(spec, opts, scenario, n_runs=n_runs,
                               backend="fused")
        hit, reached = m[:, 0].mean(), m[:, 1].mean()
        oob = m[:, 5].mean()
        print(f"iters={iters} {scenario:6s}: collision {hit:.3f}  "
              f"reached {reached:.3f}  oob {oob:.3f}", flush=True)
