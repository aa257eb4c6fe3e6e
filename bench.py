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

Timing note (round-4 correction): the axon tunnel runs launches in a
streamed mode where ``block_until_ready`` returns WITHOUT waiting, and
after the first device->host value fetch every call completes
synchronously at wall = tunnel RTT (~25 ms) + device time. Fetching a
dependent scalar per chunk is therefore correct but adds one RTT per
chunk — the round-1..3 headline (20-tick chunks) overstated the tick by
RTT/20 ~ 1.3 ms. The headline now cancels the RTT exactly by differencing
two chain lengths: tick = (T(long) - T(short)) / (long - short), each T
measured with a dependent-scalar fetch. ``wall_tick_s`` (T(long)/long,
RTT included) is also reported as the conservative per-launch bound; real
experiment rollouts scan 400 ticks per launch, so their RTT share is
smaller than even that.

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
CHAIN_SHORT = 20
CHAIN_LONG = 200
# Per-tick latency distribution (BASELINE.md's p99 north star): chained
# chunks of PCT_CHUNK ticks, host-timed, PCT_REPS repeats. Each sample is a
# CHUNK-MEAN (per-tick variation inside a scan is not host-observable), so
# the fields are named *_chunkmean_*; the per-sample tunnel-RTT share
# (rtt/PCT_CHUNK) is subtracted using the separately measured RTT.
PCT_CHUNK = 100
PCT_REPS = 30
B1_CHUNK = 20
B1_REPS = 24
# 6 interior-point iterations per RTI tick: the controller warm-starts the
# QP primal by shifting the previous solution, so few IP iterations suffice.
# The persisted sweep (results/iter_sweep_r3/, 256 seeds x 2 scenarios per
# count, CSVs in the reference schema) locates the quality cliff at 2
# iterations (reached collapses 96% -> 7%). The round-5 SEED-MATCHED
# re-validation (results/parity_r5/qp_budget/ + prod_rk4_qp6/) sharpens
# this: 6 iterations hold reference quality on the reference's own worlds
# across all 10 bundled cells (hit parity, reached better, trips within
# 3%), while 4 iterations slow trips 36% — aggregate rates alone hid that.
# 6 is the validated budget; the validated config IS the benchmarked one.
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

    def chain(st0, ticks):
        @jax.jit
        def run(st):
            def body(s, _):
                return tick(s), None
            final, _ = jax.lax.scan(body, st, None, length=ticks)
            return final, jnp.sum(final.x0)
        return run

    def timed_best(run, st, reps=5):
        """Best-of-reps wall time of run(st) incl. the dependent-scalar
        fetch (the fetch is what forces true completion on the tunnel)."""
        _, chk = run(st)
        float(chk)                       # compile + warm + force sync mode
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            _, chk = run(st)
            float(chk)
            best = min(best, time.perf_counter() - t0)
        return best

    # ---- headline: RTT-cancelled device tick ---------------------------
    t_short = timed_best(chain(state, CHAIN_SHORT), state)
    t_long = timed_best(chain(state, CHAIN_LONG), state)
    tick_s = max(t_long - t_short, 1e-9) / (CHAIN_LONG - CHAIN_SHORT)
    wall_tick_s = t_long / CHAIN_LONG
    solves_per_s = BATCH / tick_s

    # Host<->device round-trip through the tunnel (sync mode): median time
    # to fetch a dependent scalar from a trivial jitted op.
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

    def chunkmean_percentiles(st, chunk, reps):
        """p50/p99 of chunk-mean per-tick latency, RTT share subtracted.
        Per-tick variation inside a scan is not host-observable, so these
        are distributions over chunk MEANS (labeled accordingly)."""
        run = chain(st, chunk)
        st2, chk = run(st)
        float(chk)  # compile + warm
        samples = []
        for _ in range(reps):
            t0 = time.perf_counter()
            st2, chk = run(st2)
            float(chk)
            samples.append(max(time.perf_counter() - t0 - rtt, 0.0) / chunk)
        samples.sort()
        p = lambda q: samples[min(len(samples) - 1, int(q * len(samples)))]
        return p(0.50), p(0.99)

    p50, p99 = chunkmean_percentiles(state, PCT_CHUNK, PCT_REPS)

    # B=1 deployment latency: the reference's actual use case is ONE robot
    # per control tick. Same controller, batch_shape=(1,); device tick via
    # the same two-length cancellation, plus raw chunk-mean percentiles.
    st1 = init_loop_state(jax.random.PRNGKey(1), ctrl, start, goal,
                          "RANDOM", batch_shape=(1,))
    b1_short = timed_best(chain(st1, CHAIN_SHORT), st1, reps=3)
    b1_long = timed_best(chain(st1, CHAIN_LONG), st1, reps=3)
    b1_device = max(b1_long - b1_short, 1e-9) / (CHAIN_LONG - CHAIN_SHORT)
    b1_p50, b1_p99 = chunkmean_percentiles(st1, B1_CHUNK, B1_REPS)

    print(json.dumps({
        "metric": "mpc_solves_per_s_per_chip_N20",
        "value": round(solves_per_s, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / 10.0, 2),
        "batch": BATCH,
        "qp_iter": QP_ITER,
        "backend": backend,
        "mean_tick_s": round(tick_s, 6),
        "wall_tick_s": round(wall_tick_s, 6),
        "p50_chunkmean_tick_s": round(p50, 6),
        "p99_chunkmean_tick_s": round(p99, 6),
        "b1_device_tick_s": round(b1_device, 6),
        "b1_p50_chunkmean_tick_s": round(b1_p50, 6),
        "b1_p99_chunkmean_tick_s": round(b1_p99, 6),
        "tunnel_rtt_s": round(rtt, 6),
        "realtime_ok": bool(wall_tick_s < 0.1),
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
