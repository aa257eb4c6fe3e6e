"""Bisect the round-1 bench TPU kernel fault.

Usage: python scripts/tpu_crash_bisect.py <phase>
Phases (each runs in a fresh process so a worker crash doesn't poison later ones):
  qp_sb1   single fused QP solve, B=128, sb=1
  qp_sb2   single fused QP solve, B=256, sb=2
  qp_big   fused QP solve, B=4096, auto sb
  tick1    one full batched tick, B=4096
  scan20   bench.py's exact scan of 20 ticks, B=4096
"""

import sys
import time

import jax
import jax.numpy as jnp


def build_qp(B, dtype=jnp.float32):
    from doa_mpc_tpu.config import SolverOptions, WorldSpec, default_cost_params
    from doa_mpc_tpu.sim.closed_loop import init_loop_state
    from doa_mpc_tpu.sim.obstacles import robot_start_goal
    from doa_mpc_tpu.solver.sqp_rti import make_rti_controller
    spec = WorldSpec(tf=2.0, n_solv=20, qp_iter=20)
    opts = SolverOptions(qp_iter=20, integrator="rk4")
    ctrl = make_rti_controller(spec, opts, dtype=dtype)
    params = default_cost_params(spec, dtype=dtype)
    start, goal = robot_start_goal(spec)
    state = init_loop_state(jax.random.PRNGKey(0), ctrl,
                            start.astype(dtype), goal.astype(dtype),
                            "RANDOM", batch_shape=(B,))
    return ctrl, params, state, goal.astype(dtype)


def main():
    phase = sys.argv[1]
    print("phase", phase, flush=True)
    t0 = time.time()

    if phase.startswith("qp"):
        from doa_mpc_tpu.ops.ip_pallas import solve_ocp_qp_fused
        from doa_mpc_tpu.sim.obstacles import predict_trajectory
        B = {"qp_sb1": 128, "qp_sb2": 256, "qp_big": 4096}[phase]
        sb = {"qp_sb1": 1, "qp_sb2": 2, "qp_big": None}[phase]
        ctrl, params, state, goal = build_qp(B)

        @jax.jit
        def lin(st):
            pred = predict_trajectory(st.obst, ctrl.spec, ctrl.spec.n_solv)
            pred = jnp.moveaxis(pred, 0, 1)
            return jax.vmap(
                lambda rti, x0, p: ctrl.build_qp(rti, x0, goal, p, params)
            )(st.rti, st.x0, pred)

        qp = lin(state)
        jax.block_until_ready(qp)
        print("qp built", time.time() - t0, flush=True)
        sol = solve_ocp_qp_fused(qp, iters=20, sublane_batch=sb)
        v = float(jnp.sum(sol.du[:, 0]))
        print("OK", phase, "sum_du0", v, time.time() - t0, flush=True)
        return

    from doa_mpc_tpu.sim.closed_loop import make_batched_tick
    ctrl, params, state, goal = build_qp(4096)
    tick = make_batched_tick(ctrl, goal, params, backend="fused")
    if phase == "tick1":
        st = jax.jit(tick)(state)
        v = float(jnp.sum(st.x0))
        print("OK tick1", v, time.time() - t0, flush=True)
        return

    @jax.jit
    def run(st):
        def body(s, _):
            return tick(s), None
        final, _ = jax.lax.scan(body, st, None, length=20)
        return final, jnp.sum(final.x0)

    final, chk = run(state)
    print("OK scan20 warm", float(chk), time.time() - t0, flush=True)
    t1 = time.time()
    final, chk = run(state)
    float(chk)
    print("OK scan20 timed", time.time() - t1, flush=True)


if __name__ == "__main__":
    main()
