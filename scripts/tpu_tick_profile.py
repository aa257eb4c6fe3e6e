"""Break the production tick into phases and time each on the real TPU.

Phases (each scan-chained inside one jit):
  full   the production batched tick (fused backend)
  noqp   the tick with the QP solve replaced by a zero step (glue only:
         obstacle forecast + GN linearization + plant + world + metrics)
  qp     linearize once, then scan the fused QP solve on perturbed data

Timing: the tunnel's dispatch modes (docs/DESIGN.md section 3 "dispatch
poison") mean block_until_ready alone measures nothing and a per-call
dependent-scalar fetch adds one ~26 ms round-trip. Each phase is timed as
the DIFFERENCE of a long and a short chain, both with a fetch — RTT
cancels exactly.

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


LONG = 200


def _dep(out):
    leaves = jax.tree.leaves(out)
    return jnp.sum(leaves[0])


def timed(short_fn, long_fn, *args):
    """RTT-cancelled per-tick seconds from a TICKS- and a LONG-chain."""
    def best_of(fn):
        _ = float(_dep(fn(*args)))            # compile + force sync mode
        best = float("inf")
        for _i in range(4):
            t0 = time.perf_counter()
            _ = float(_dep(fn(*args)))
            best = min(best, time.perf_counter() - t0)
        return best
    t_s, t_l = best_of(short_fn), best_of(long_fn)
    return max(t_l - t_s, 1e-9) / (LONG - TICKS)


def scans(tick):
    def make(n):
        @jax.jit
        def run(st):
            def body(s, _):
                return tick(s), None
            final, _ = jax.lax.scan(body, st, None, length=n)
            return final
        return run
    return make(TICKS), make(LONG)

# --- full production tick
full_s, full_l = scans(make_batched_tick(ctrl, goal, params, backend="fused",
                                         sublane_batch=sb))
t_full = timed(full_s, full_l, state0)
print(f"full  : {t_full*1e3:7.4f} ms/tick  ({B/t_full:,.0f} solves/s)",
      flush=True)

# --- glue only: QP replaced by zero step
glue_s, glue_l = scans(make_batched_tick(ctrl, goal, params, backend="zero"))
t_glue = timed(glue_s, glue_l, state0)
print(f"noqp  : {t_glue*1e3:7.4f} ms/tick", flush=True)

# --- QP solve only: fixed QP data, perturbed per scan step for dependence
@jax.jit
def build(st):
    pred = predict_trajectory(st.obst, spec, spec.n_solv)
    pred = jnp.moveaxis(pred, 0, 1)
    return jax.vmap(
        lambda rti, x0, p: ctrl.build_qp(rti, x0, goal, p, params)
    )(st.rti, st.x0, pred)

qp0 = jax.block_until_ready(build(state0))

def qponly_n(n):
    @jax.jit
    def run(qp):
        def body(q, _):
            sol = solve_ocp_qp_fused(q, iters=opts.qp_iter, tau=opts.ip_tau,
                                     sublane_batch=sb)
            # consume du FULLY: a sliced-only consumer invites XLA to
            # place the kernel's du output in VMEM inside the scan, which
            # lands on top of the kernel's ~14.4 MB scratch and OOMs
            # scoped VMEM at sb=8
            q = q._replace(
                dx0=q.dx0 + 1e-6 * jnp.sum(sol.du, axis=1)[:, :1])
            return q, None
        q, _ = jax.lax.scan(body, qp, None, length=n)
        return q
    return run

t_qp = timed(qponly_n(TICKS), qponly_n(LONG), qp0)
print(f"qponly: {t_qp*1e3:7.4f} ms/tick", flush=True)
print(f"sum(noqp+qponly) = {(t_glue+t_qp)*1e3:.4f} ms vs full "
      f"{t_full*1e3:.4f} ms", flush=True)
