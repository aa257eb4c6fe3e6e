"""Break the production tick into phases and time each on the real TPU.

Phases (each scan-chained 20x inside one jit, dependent-scalar fetched):
  full   the production batched tick (fused backend)
  noqp   the tick with the QP solve replaced by a zero step (glue only:
         obstacle forecast + GN linearization + plant + world + metrics)
  qp     linearize once, then scan the fused QP solve on perturbed data

Usage: python scripts/tpu_tick_profile.py [B] [sb]
"""

import sys
sys.path.insert(0, ".")

import time

import jax
import jax.numpy as jnp

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
sb = int(sys.argv[2]) if len(sys.argv) > 2 else None
TICKS = 20

from doa_mpc_tpu.config import SolverOptions, WorldSpec, default_cost_params
from doa_mpc_tpu.ops.ip_pallas import solve_ocp_qp_fused
from doa_mpc_tpu.sim.closed_loop import init_loop_state, make_batched_tick
from doa_mpc_tpu.sim.obstacles import predict_trajectory, robot_start_goal
from doa_mpc_tpu.solver.sqp_rti import make_rti_controller

dtype = jnp.float32
spec = WorldSpec(tf=2.0, n_solv=20, qp_iter=20)
opts = SolverOptions(qp_iter=20, integrator="rk4")
ctrl = make_rti_controller(spec, opts, dtype=dtype)
params = default_cost_params(spec, dtype=dtype)
start, goal = robot_start_goal(spec)
start, goal = start.astype(dtype), goal.astype(dtype)
state0 = init_loop_state(jax.random.PRNGKey(0), ctrl, start, goal, "RANDOM",
                         batch_shape=(B,))


def timed(fn, *args):
    out = jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best, out


def scan20(tick):
    @jax.jit
    def run(st):
        def body(s, _):
            return tick(s), None
        final, _ = jax.lax.scan(body, st, None, length=TICKS)
        return final
    return run

# --- full production tick
full = scan20(make_batched_tick(ctrl, goal, params, backend="fused",
                                sublane_batch=sb))
t_full, _ = timed(full, state0)
print(f"full  : {t_full/TICKS*1e3:7.3f} ms/tick  ({B/(t_full/TICKS):,.0f} solves/s)",
      flush=True)

# --- glue only: QP replaced by zero step
glue = scan20(make_batched_tick(ctrl, goal, params, backend="zero"))
t_glue, _ = timed(glue, state0)
print(f"noqp  : {t_glue/TICKS*1e3:7.3f} ms/tick", flush=True)

# --- QP solve only: fixed QP data, perturbed per scan step for dependence
@jax.jit
def build(st):
    pred = predict_trajectory(st.obst, spec, spec.n_solv)
    pred = jnp.moveaxis(pred, 0, 1)
    return jax.vmap(
        lambda rti, x0, p: ctrl.build_qp(rti, x0, goal, p, params)
    )(st.rti, st.x0, pred)

qp0 = jax.block_until_ready(build(state0))

@jax.jit
def qponly(qp):
    def body(q, _):
        sol = solve_ocp_qp_fused(q, iters=opts.qp_iter, tau=opts.ip_tau,
                                 sublane_batch=sb)
        q = q._replace(dx0=q.dx0 + 1e-6 * sol.du[:, 0, :1])
        return q, None
    q, _ = jax.lax.scan(body, qp, None, length=TICKS)
    return q

t_qp, _ = timed(qponly, qp0)
print(f"qponly: {t_qp/TICKS*1e3:7.3f} ms/tick", flush=True)
print(f"sum(noqp+qponly) = {(t_glue+t_qp)/TICKS*1e3:.3f} ms vs full "
      f"{t_full/TICKS*1e3:.3f} ms", flush=True)
