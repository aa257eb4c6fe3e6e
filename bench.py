"""Headline benchmark: batched MPC solves/s/chip at N=20.

The reference controller's implicit real-time budget is one RTI solve per
dt = TF/N = 0.1 s control tick (``world_specification.py:43-44``), i.e. 10
solves/s on its CPU. This benchmark runs the full production control tick
(obstacle forecast -> RTI linearize -> interior-point QP via Riccati ->
plant IRK step -> noisy world step -> metrics) for ``BATCH`` concurrent
scenarios on one chip and reports throughput in MPC solves per second.

``vs_baseline`` = solves/s/chip divided by the reference's 10 solves/s
real-time budget.

Prints exactly one JSON line.
"""

import json
import time

import jax
import jax.numpy as jnp

BATCH = 4096
TICKS = 20
QP_ITER = 20


def main():
    from doa_mpc_tpu.config import SolverOptions, WorldSpec, default_cost_params
    from doa_mpc_tpu.sim.closed_loop import init_loop_state, make_tick
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
    tick = jax.jit(jax.vmap(make_tick(ctrl, goal, params)))

    # compile + warmup
    state = tick(state)
    jax.block_until_ready(state)

    times = []
    for _ in range(TICKS):
        t0 = time.perf_counter()
        state = tick(state)
        jax.block_until_ready(state)
        times.append(time.perf_counter() - t0)

    times.sort()
    mean_t = sum(times) / len(times)
    p99_t = times[min(len(times) - 1, int(0.99 * len(times)))]
    solves_per_s = BATCH / mean_t

    print(json.dumps({
        "metric": "mpc_solves_per_s_per_chip_N20",
        "value": round(solves_per_s, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / 10.0, 2),
        "batch": BATCH,
        "qp_iter": QP_ITER,
        "mean_tick_s": round(mean_t, 5),
        "p99_tick_s": round(p99_t, 5),
        "realtime_ok": bool(p99_t < 0.1),
    }))


if __name__ == "__main__":
    main()
