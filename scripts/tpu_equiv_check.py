"""Production-path solution-quality check: fused Pallas IP vs f64 oracle.

Builds REAL production QPs (``RtiController.build_qp`` along a short
closed-loop rollout, so active sets and slack weights are representative),
solves every one on the TPU with both f32 backends — the whole-solve fused
Pallas kernel (the benchmark/production backend) and the pure-XLA interior
point — and arbitrates BOTH against a converged float64 ``solve_ocp_qp``
run on the host CPU (the oracle validated against dense-KKT and scipy in
tests/test_ip_qp.py).

Why arbitration instead of backend-vs-backend matching: two f32 interior
points do not agree to 1e-3 on these QPs even when both are correct — the
1e4 slack penalties leave ~1e-2-scale f32 solution noise, and rare rows are
genuinely hard (measured: the f32 XLA path returns du=0.13 where scipy, the
f64 oracle and the fused kernel all agree on -7.68). The meaningful claim
for the production backend is therefore relative: **the fused kernel's
error against the f64 truth is no worse than the validated XLA f32 path's**
(in median and at the 95th percentile), not that two noisy solvers coincide.

Exit code 0 and a one-line JSON verdict on success; nonzero on regression.
Driven by ``tests/test_tpu_equiv.py`` whenever a TPU is reachable.
"""

import json
import sys

sys.path.insert(0, ".")

import jax

import numpy as np
import jax.numpy as jnp

from doa_mpc_tpu.config import SolverOptions, WorldSpec, default_cost_params
from doa_mpc_tpu.ops.ip_pallas import solve_ocp_qp_fused
from doa_mpc_tpu.ops.ip_qp import solve_ocp_qp
from doa_mpc_tpu.sim.closed_loop import init_loop_state, make_batched_tick
from doa_mpc_tpu.sim.obstacles import predict_trajectory, robot_start_goal
from doa_mpc_tpu.solver.sqp_rti import (
    UNICYCLE_QP_STRUCTURE, make_rti_controller,
)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 10
WARM_TICKS = 5   # diversify states/active sets before the probe solve
ORACLE_ITERS = 80

dtype = jnp.float32
spec = WorldSpec(tf=2.0, n_solv=20, n_obst=5, qp_iter=ITERS)
opts = SolverOptions(qp_iter=ITERS, integrator="rk4")
ctrl = make_rti_controller(spec, opts, dtype=dtype)
params = default_cost_params(spec, dtype=dtype)
start, goal = robot_start_goal(spec)
start, goal = start.astype(dtype), goal.astype(dtype)
st = init_loop_state(jax.random.PRNGKey(7), ctrl, start, goal, "RANDOM",
                     batch_shape=(B,))

# a few xla-backend ticks so the QPs probed are mid-flight, not cold-start
tick = jax.jit(make_batched_tick(ctrl, goal, params, backend="xla"))
for _ in range(WARM_TICKS):
    st = tick(st)

pred = predict_trajectory(st.obst, spec, spec.n_solv,
                          compat_pred_bug=opts.compat_pred_bug)
pred = jnp.moveaxis(pred, 0, 1)
qp = jax.jit(jax.vmap(
    lambda rti, x0, p: ctrl.build_qp(rti, x0, goal, p, params)
))(st.rti, st.x0, pred)

# f64 oracle on the host CPU (converged: 80 iterations). x64 is scoped to
# this block only — enabling it globally changes Pallas loop-index types
# and breaks the fused kernel's Mosaic lowering.
cpu = jax.devices("cpu")[0]
with jax.enable_x64(True):
    qp64 = jax.tree.map(
        lambda a: jax.device_put(np.asarray(a).astype(np.float64), cpu), qp)
    with jax.default_device(cpu):
        sol_ref = jax.jit(
            lambda q: solve_ocp_qp(q, iters=ORACLE_ITERS,
                                   tau=opts.ip_tau))(qp64)
    du_ref = np.asarray(sol_ref.du)
assert du_ref.dtype == np.float64

quant = lambda e, p: float(np.quantile(e, p))
verdict = {"check": "fused-vs-f64-oracle", "B": B,
           "N": spec.n_solv, "M": spec.n_obst,
           "oracle_iters": ORACLE_ITERS,
           "du_scale": float(np.abs(du_ref).max()), "budgets": {}}
ok = True
# two budgets: the production iteration count (partial convergence — RTI
# warm-starting makes the closed loop robust to it, results/iter_sweep_r3/)
# and a converged one, which pins the f32 solution floor.
for iters in (ITERS, 50):
    sol_x = jax.jit(lambda q: solve_ocp_qp(q, iters=iters,
                                           tau=opts.ip_tau))(qp)
    sol_f = jax.jit(lambda q: solve_ocp_qp_fused(
        q, iters=iters, tau=opts.ip_tau,
        structure=UNICYCLE_QP_STRUCTURE))(qp)
    err_f = np.abs(np.asarray(sol_f.du) - du_ref).max(axis=(1, 2))
    err_x = np.abs(np.asarray(sol_x.du) - du_ref).max(axis=(1, 2))
    row = {"fused_med_err": quant(err_f, 0.5),
           "fused_p95_err": quant(err_f, 0.95),
           "fused_max_err": float(err_f.max()),
           "xla_med_err": quant(err_x, 0.5),
           "xla_p95_err": quant(err_x, 0.95),
           "xla_max_err": float(err_x.max())}
    # the fused production kernel must track the f64 truth at least as
    # well as the validated XLA f32 path (2x slack for solver noise)
    row["ok"] = bool(
        row["fused_med_err"] <= max(2 * row["xla_med_err"], 1e-3)
        and row["fused_p95_err"] <= max(2 * row["xla_p95_err"], 1e-2))
    ok = ok and row["ok"]
    verdict["budgets"][str(iters)] = row
verdict["ok"] = ok
verdict["fused_med_err"] = verdict["budgets"][str(ITERS)]["fused_med_err"]
verdict["xla_med_err"] = verdict["budgets"][str(ITERS)]["xla_med_err"]
print(json.dumps(verdict), flush=True)
sys.exit(0 if ok else 1)
