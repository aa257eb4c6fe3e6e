"""Sweep (sublane_batch, stage_unroll) of the fused QP kernel on the TPU.

Usage: python scripts/tpu_qp_sweep.py [B] [iters] -- pairs like 2:2 4:2 4:4
"""

import sys
sys.path.insert(0, ".")

import time

import jax
import jax.numpy as jnp

args = [a for a in sys.argv[1:] if ":" not in a]
pairs = [tuple(int(x) for x in a.split(":")) for a in sys.argv[1:] if ":" in a]
B = int(args[0]) if args else 4096
ITERS = int(args[1]) if len(args) > 1 else 20
pairs = pairs or [(2, 2), (4, 2), (4, 4)]
TICKS = 20

from doa_mpc_tpu.config import SolverOptions, WorldSpec, default_cost_params
from doa_mpc_tpu.ops.ip_pallas import fused_vmem_bytes, solve_ocp_qp_fused
from doa_mpc_tpu.sim.closed_loop import init_loop_state
from doa_mpc_tpu.sim.obstacles import predict_trajectory, robot_start_goal
from doa_mpc_tpu.solver.sqp_rti import make_rti_controller

dtype = jnp.float32
spec = WorldSpec(tf=2.0, n_solv=20, qp_iter=ITERS)
opts = SolverOptions(qp_iter=ITERS, integrator="rk4")
ctrl = make_rti_controller(spec, opts, dtype=dtype)
params = default_cost_params(spec, dtype=dtype)
start, goal = robot_start_goal(spec)
start, goal = start.astype(dtype), goal.astype(dtype)
state0 = init_loop_state(jax.random.PRNGKey(0), ctrl, start, goal, "RANDOM",
                         batch_shape=(B,))

@jax.jit
def build(st):
    pred = predict_trajectory(st.obst, spec, spec.n_solv)
    pred = jnp.moveaxis(pred, 0, 1)
    return jax.vmap(
        lambda rti, x0, p: ctrl.build_qp(rti, x0, goal, p, params)
    )(st.rti, st.x0, pred)

qp0 = jax.block_until_ready(build(state0))

for sb, su in pairs:
    mb = fused_vmem_bytes(spec.n_solv, spec.n_obst, sb=sb) / 2**20
    @jax.jit
    def qponly(qp, _sb=sb, _su=su):
        def body(q, _):
            sol = solve_ocp_qp_fused(q, iters=ITERS, tau=opts.ip_tau,
                                     sublane_batch=_sb, stage_unroll=_su)
            q = q._replace(dx0=q.dx0 + 1e-6 * sol.du[:, 0, :1])
            return q, None
        q, _ = jax.lax.scan(body, qp, None, length=TICKS)
        return q
    t0 = time.time()
    out = jax.block_until_ready(qponly(qp0))
    comp = time.time() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = jax.block_until_ready(qponly(qp0))
        best = min(best, time.perf_counter() - t0)
    print(f"sb={sb} su={su}: {best/TICKS*1e3:7.3f} ms/solve "
          f"({B/(best/TICKS):,.0f}/s)  vmem~{mb:.1f}MB compile {comp:.0f}s",
          flush=True)
