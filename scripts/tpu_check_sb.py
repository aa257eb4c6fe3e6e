import sys; sys.path.insert(0, ".")
import time
import numpy as np
import jax, jax.numpy as jnp
print("devices:", jax.devices(), flush=True)

from doa_mpc_tpu.config import SolverOptions, WorldSpec, default_cost_params
from doa_mpc_tpu.sim.closed_loop import init_loop_state, make_batched_tick
from doa_mpc_tpu.sim.obstacles import robot_start_goal
from doa_mpc_tpu.solver.sqp_rti import make_rti_controller
from doa_mpc_tpu.ops import ip_pallas

B = 4096
dtype = jnp.float32
spec = WorldSpec(tf=2.0, n_solv=20, qp_iter=20)
opts = SolverOptions(qp_iter=20, integrator="rk4")
ctrl = make_rti_controller(spec, opts, dtype=dtype)
params = default_cost_params(spec, dtype=dtype)
start, goal = robot_start_goal(spec)
start, goal = start.astype(dtype), goal.astype(dtype)
state0 = init_loop_state(jax.random.PRNGKey(0), ctrl, start, goal, "RANDOM", batch_shape=(B,))

import doa_mpc_tpu.ops.ip_pallas as ipp
orig = ipp.solve_ocp_qp_fused

def run_backend(sb, ticks=20):
    def patched(qp, **kw):
        return orig(qp, sublane_batch=sb, **kw)
    ipp.solve_ocp_qp_fused = patched
    import doa_mpc_tpu.sim.closed_loop as cl
    cl.solve_ocp_qp_fused_override = None
    tick = make_batched_tick(ctrl, goal, params, backend="fused")
    @jax.jit
    def run(st, n):
        def body(s, _):
            return tick(s), None
        final, _ = jax.lax.scan(body, st, None, length=ticks)
        return final
    t0 = time.time()
    final = run(state0, ticks)
    jnp.sum(final.x0).block_until_ready()
    compile_s = time.time() - t0
    t0 = time.time()
    final = run(state0, ticks)
    v = float(jnp.sum(final.x0))
    dt = time.time() - t0
    ipp.solve_ocp_qp_fused = orig
    return compile_s, dt / ticks, v, np.asarray(final.x0)

# closed_loop imports the symbol directly; patch there instead
import doa_mpc_tpu.sim.closed_loop as cl
results = {}
for sb in (2, 4):
    def patched(qp, _sb=sb, **kw):
        kw.setdefault("sublane_batch", _sb)
        return orig(qp, **kw)
    cl.solve_ocp_qp_fused = patched
    tick = make_batched_tick(ctrl, goal, params, backend="fused")
    @jax.jit
    def run(st):
        def body(s, _):
            return tick(s), None
        final, _ = jax.lax.scan(body, st, None, length=20)
        return final
    t0 = time.time()
    final = jax.block_until_ready(run(state0))
    compile_s = time.time() - t0
    t0 = time.time()
    final = jax.block_until_ready(run(state0))
    dt = (time.time() - t0) / 20
    results[sb] = (compile_s, dt, np.asarray(final.x0))
    print(f"sb={sb}: compile {compile_s:.1f}s, per-tick {dt*1e3:.2f} ms, "
          f"{B/dt:.0f} solves/s", flush=True)

d = np.abs(results[2][2] - results[4][2]).max()
print("max |x0(sb2) - x0(sb4)| after 20 ticks:", d)
