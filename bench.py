"""Headline benchmark: batched MPC solves/s/chip at N=20.

The reference controller's implicit real-time budget is one RTI solve per
dt = TF/N = 0.1 s control tick (``world_specification.py:43-44``), i.e. 10
solves/s on its CPU. This benchmark runs the full production control tick
(obstacle forecast -> RTI linearize -> batched interior-point QP with the
fused Pallas kernel -> plant step -> noisy world step -> metrics) for
``BATCH`` concurrent scenarios on one chip and reports throughput in MPC
solves per second.

``vs_baseline`` = solves/s/chip divided by the reference's 10 solves/s
real-time budget.

Timing note: the device stream is asynchronous (and ``block_until_ready``
is unreliable through remote-tunnel platforms), so ticks are chained inside
one jitted scan and a dependent scalar is fetched to the host — wall time /
TICKS is the true steady-state per-tick latency.

Resilience: a Pallas kernel fault kills the whole TPU worker process, which
a single-process benchmark cannot recover from (this lost the round-1
headline number to a toolchain drift). So the measurement runs in a child
process per backend, best backend first; if a backend crashes or hangs the
parent falls back to the next one and the bench still lands a number.

Prints exactly one JSON line (the last line of stdout).
"""

import json
import os
import subprocess
import sys
import time

BATCH = 4096
TICKS = 20
# Per-tick latency distribution (BASELINE.md's p99 north star): chained
# chunks of PCT_CHUNK ticks, host-timed, PCT_REPS repeats -> >=200 ticks.
# Chunks match the headline's 20-tick scan so the tunnel's ~20 ms host
# round-trip amortizes identically (a 5-tick chunk inflates per-tick time
# by RTT/5 ~ 4 ms; measured p50 was 2x the steady-state tick).
PCT_CHUNK = 20
PCT_REPS = 12
B1_CHUNK = 20
B1_REPS = 12
# 6 interior-point iterations per RTI tick: the controller warm-starts the
# QP primal by shifting the previous solution, so few IP iterations suffice.
# The persisted sweep (results/iter_sweep_r3/, 256 seeds x 2 scenarios per
# count, CSVs in the reference schema) locates the quality cliff at 2
# iterations (reached collapses 96% -> 7%); 4 and up are statistically
# indistinguishable from 20 (RANDOM 95.7-96.5%, EDGE 87.5-89.8%). 6 keeps a
# 3x margin over the cliff at 1.32M solves/s (vs 1.05M at 10, 0.67M at 20).
QP_ITER = 6
BACKENDS = ("fused", "pallas", "xla")
ATTEMPT_TIMEOUT_S = 560  # 3 compiles (B=4096 scan, pct chunk, B=1 chunk) + timing
PROBE_TIMEOUT_S = 90
PROBE_RETRY_S = 120
PROBE_BUDGET_S = 2400


def probe_device():
    """Child-process device health check: a trivial matmul must complete.

    A Pallas fault/hang can wedge the (remote-tunnel) device for many
    minutes after the offending client dies; burning a 420 s backend
    attempt against a wedged device both wastes the budget and mislabels
    a healthy backend as broken. rc 0 = healthy."""
    import jax
    import jax.numpy as jnp
    x = jnp.ones((256, 256))
    print("probe", float((x @ x).sum()), flush=True)


def wait_for_device(deadline):
    while True:
        try:
            res = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--probe"],
                timeout=PROBE_TIMEOUT_S, capture_output=True, text=True)
            if res.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.time() > deadline:
            return False
        print("# device wedged; retrying probe", file=sys.stderr, flush=True)
        time.sleep(PROBE_RETRY_S)


def measure(backend):
    import jax
    import jax.numpy as jnp

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
    tick = make_batched_tick(ctrl, goal, params, backend=backend)

    @jax.jit
    def run(st):
        def body(s, _):
            return tick(s), None
        final, _ = jax.lax.scan(body, st, None, length=TICKS)
        return final, jnp.sum(final.x0)

    # single compile: first call compiles + warms; then best-of-3 timed
    # repeats (the remote tunnel adds run-to-run jitter on the ms scale)
    final, chk = run(state)
    float(chk)
    elapsed = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        final, chk = run(state)
        float(chk)
        elapsed = min(elapsed, time.perf_counter() - t0)
    tick_s = elapsed / TICKS
    solves_per_s = BATCH / tick_s

    def tick_percentiles(st, chunk, reps):
        """p50/p99 per-tick latency: host-timed chunked scans (one device
        round-trip per `chunk` ticks gives ms-scale resolution without the
        tunnel's per-call sync noise dominating)."""
        @jax.jit
        def run_chunk(s):
            def body(s, _):
                return tick(s), None
            final, _ = jax.lax.scan(body, s, None, length=chunk)
            return final, jnp.sum(final.x0)
        st, chk = run_chunk(st)
        float(chk)  # compile + warm
        samples = []
        for _ in range(reps):
            t0 = time.perf_counter()
            st, chk = run_chunk(st)
            float(chk)
            samples.append((time.perf_counter() - t0) / chunk)
        samples.sort()
        p = lambda q: samples[min(len(samples) - 1, int(q * len(samples)))]
        return p(0.50), p(0.99)

    p50, p99 = tick_percentiles(state, PCT_CHUNK, PCT_REPS)

    # Host<->device round-trip through the tunnel: median time to fetch a
    # dependent scalar from a trivial jitted op. Every chunked measurement
    # above carries one RTT per chunk; report it so per-tick numbers can be
    # read as device time + RTT/chunk.
    @jax.jit
    def tiny(x):
        return jnp.sum(x) * 1.0000001
    v = jnp.ones((8,), dtype)
    float(tiny(v))
    rtts = []
    for _ in range(15):
        t0 = time.perf_counter()
        float(tiny(v))
        rtts.append(time.perf_counter() - t0)
    rtt = sorted(rtts)[len(rtts) // 2]

    # B=1 deployment latency: the reference's actual use case is ONE robot
    # per control tick. Same controller, batch_shape=(1,).
    st1 = init_loop_state(jax.random.PRNGKey(1), ctrl, start, goal,
                          "RANDOM", batch_shape=(1,))
    b1_p50, b1_p99 = tick_percentiles(st1, B1_CHUNK, B1_REPS)

    print(json.dumps({
        "metric": "mpc_solves_per_s_per_chip_N20",
        "value": round(solves_per_s, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / 10.0, 2),
        "batch": BATCH,
        "qp_iter": QP_ITER,
        "backend": backend,
        "mean_tick_s": round(tick_s, 5),
        "p50_tick_s": round(p50, 5),
        "p99_tick_s": round(p99, 5),
        "b1_p50_tick_s": round(b1_p50, 6),
        "b1_p99_tick_s": round(b1_p99, 6),
        "tunnel_rtt_s": round(rtt, 6),
        "b1_p50_device_s": round(max(b1_p50 - rtt / B1_CHUNK, 0.0), 6),
        "realtime_ok": bool(tick_s < 0.1),
    }), flush=True)


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    deadline = time.time() + PROBE_BUDGET_S
    for backend in BACKENDS:
        if not wait_for_device(deadline):
            print("# device never recovered", file=sys.stderr, flush=True)
            break
        cmd = [sys.executable, os.path.abspath(__file__), backend]
        try:
            res = subprocess.run(
                cmd, cwd=here, timeout=ATTEMPT_TIMEOUT_S,
                capture_output=True, text=True)
        except subprocess.TimeoutExpired:
            print(f"# backend {backend}: timed out",
                  file=sys.stderr, flush=True)
            continue
        if res.returncode == 0 and res.stdout.strip():
            print(res.stdout.strip().splitlines()[-1], flush=True)
            return 0
        tail = "\n".join(res.stderr.strip().splitlines()[-3:])
        print(f"# backend {backend}: rc={res.returncode}\n{tail}",
              file=sys.stderr, flush=True)
    print("# all backends failed", file=sys.stderr, flush=True)
    return 1


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--probe":
        probe_device()
    elif len(sys.argv) > 1:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        measure(sys.argv[1])
    else:
        sys.exit(main())
