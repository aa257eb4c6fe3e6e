"""A/B the fused kernel's sublane_batch factor on the real TPU.

Runs the full batched tick with the fused backend at each requested
``sublane_batch`` (plumbed through ``make_batched_tick`` — no
monkey-patching) and compares per-tick latency plus the final states.

Usage: python scripts/tpu_check_sb.py [sb ...]   (default: 1 2)
"""

import sys
sys.path.insert(0, ".")

import time

import numpy as np
import jax
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)

from doa_mpc_tpu.config import SolverOptions, WorldSpec, default_cost_params
from doa_mpc_tpu.ops.ip_pallas import fused_vmem_bytes
from doa_mpc_tpu.sim.closed_loop import init_loop_state, make_batched_tick
from doa_mpc_tpu.sim.obstacles import robot_start_goal
from doa_mpc_tpu.solver.sqp_rti import make_rti_controller

B = 4096
TICKS = 20
dtype = jnp.float32
spec = WorldSpec(tf=2.0, n_solv=20, qp_iter=20)
opts = SolverOptions(qp_iter=20, integrator="rk4")
ctrl = make_rti_controller(spec, opts, dtype=dtype)
params = default_cost_params(spec, dtype=dtype)
start, goal = robot_start_goal(spec)
start, goal = start.astype(dtype), goal.astype(dtype)
state0 = init_loop_state(jax.random.PRNGKey(0), ctrl, start, goal, "RANDOM",
                         batch_shape=(B,))

sbs = [int(a) for a in sys.argv[1:]] or [1, 2]
results = {}
for sb in sbs:
    mb = fused_vmem_bytes(spec.n_solv, spec.n_obst, sb=sb) / 2**20
    print(f"sb={sb}: est VMEM {mb:.1f} MB", flush=True)
    tick = make_batched_tick(ctrl, goal, params, backend="fused",
                             sublane_batch=sb)

    @jax.jit
    def run(st, _tick=tick):
        def body(s, _):
            return _tick(s), None
        final, _ = jax.lax.scan(body, st, None, length=TICKS)
        return final

    t0 = time.time()
    final = jax.block_until_ready(run(state0))
    compile_s = time.time() - t0
    t0 = time.time()
    final = jax.block_until_ready(run(state0))
    dt = (time.time() - t0) / TICKS
    results[sb] = np.asarray(final.x0)
    print(f"sb={sb}: compile {compile_s:.1f}s, per-tick {dt*1e3:.2f} ms, "
          f"{B/dt:.0f} solves/s", flush=True)

base = sbs[0]
for sb in sbs[1:]:
    d = np.abs(results[base] - results[sb]).max()
    print(f"max |x0(sb{base}) - x0(sb{sb})| after {TICKS} ticks: {d}")
