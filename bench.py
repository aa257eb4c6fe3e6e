"""Headline benchmark: batched MPC solves/s/chip at N=20.

The reference controller's implicit real-time budget is one RTI solve per
dt = TF/N = 0.1 s control tick (``world_specification.py:43-44``), i.e. 10
solves/s on its CPU. This benchmark runs the full production control tick
(obstacle forecast -> RTI linearize -> batched interior-point QP with the
fused Pallas Riccati kernel -> plant step -> noisy world step -> metrics)
for ``BATCH`` concurrent scenarios on one chip and reports throughput in MPC
solves per second.

``vs_baseline`` = solves/s/chip divided by the reference's 10 solves/s
real-time budget.

Timing note: the device stream is asynchronous (and ``block_until_ready``
is unreliable through remote-tunnel platforms), so ticks are chained inside
one jitted scan and a dependent scalar is fetched to the host — wall time /
TICKS is the true steady-state per-tick latency.

Prints exactly one JSON line.
"""

import json
import time

import jax
import jax.numpy as jnp

BATCH = 4096
TICKS = 20
QP_ITER = 20
BACKEND = "fused"


def main():
    from doa_mpc_tpu.config import SolverOptions, WorldSpec, default_cost_params
    from doa_mpc_tpu.sim.closed_loop import init_loop_state, make_batched_tick
    from doa_mpc_tpu.sim.obstacles import robot_start_goal
    from doa_mpc_tpu.solver.sqp_rti import make_rti_controller

    dtype = jnp.float32
    spec = WorldSpec(tf=2.0, n_solv=20, qp_iter=QP_ITER)
    opts = SolverOptions(qp_iter=QP_ITER, integrator="rk4")
    ctrl = make_rti_controller(spec, opts, dtype=dtype)
    params = default_cost_params(spec, dtype=dtype)
    start, goal = robot_start_goal(spec)
    start, goal = start.astype(dtype), goal.astype(dtype)

    state = init_loop_state(jax.random.PRNGKey(0), ctrl, start, goal,
                            "RANDOM", batch_shape=(BATCH,))
    tick = make_batched_tick(ctrl, goal, params, backend=BACKEND)

    def make_run(n):
        @jax.jit
        def run(st):
            def body(s, _):
                return tick(s), None
            final, _ = jax.lax.scan(body, st, None, length=n)
            return final, jnp.sum(final.x0)
        return run

    # single compile: first call compiles + warms, second is timed
    run = make_run(TICKS)
    final, chk = run(state)
    float(chk)
    t0 = time.perf_counter()
    final, chk = run(state)
    float(chk)
    elapsed = time.perf_counter() - t0
    tick_s = elapsed / TICKS
    solves_per_s = BATCH / tick_s

    print(json.dumps({
        "metric": "mpc_solves_per_s_per_chip_N20",
        "value": round(solves_per_s, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / 10.0, 2),
        "batch": BATCH,
        "qp_iter": QP_ITER,
        "backend": BACKEND,
        "mean_tick_s": round(tick_s, 5),
        "realtime_ok": bool(tick_s < 0.1),
    }))


if __name__ == "__main__":
    main()
