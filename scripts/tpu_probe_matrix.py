"""Hardware bisect of the fused IP kernel config space.

Usage: python scripts/tpu_probe_matrix.py <generic|unicycle> <sb> [B] [iters]

Runs one fused QP solve built from the real controller linearization (so the
QP data honors UNICYCLE_QP_STRUCTURE's claims) under the given structure
declaration and sublane_batch, and prints a checksum. Run each config in its
own process under `timeout` — a Mosaic hang or fault takes the whole TPU
worker down and can wedge the device for minutes.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def main():
    which = sys.argv[1]
    sb = int(sys.argv[2])
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 5

    from doa_mpc_tpu.config import SolverOptions, WorldSpec, default_cost_params
    from doa_mpc_tpu.ops.ip_pallas import (GENERIC_STRUCTURE,
                                           fused_vmem_bytes,
                                           solve_ocp_qp_fused)
    from doa_mpc_tpu.sim.closed_loop import init_loop_state
    from doa_mpc_tpu.sim.obstacles import predict_trajectory, robot_start_goal
    from doa_mpc_tpu.solver.sqp_rti import (UNICYCLE_QP_STRUCTURE,
                                            make_rti_controller)

    print("imports done; devices:", jax.devices(), flush=True)
    st_map = {"generic": GENERIC_STRUCTURE, "unicycle": UNICYCLE_QP_STRUCTURE}
    structure = st_map[which]
    spec = WorldSpec(tf=2.0, n_solv=20, qp_iter=iters)
    opts = SolverOptions(qp_iter=iters, integrator="rk4")
    ctrl = make_rti_controller(spec, opts, dtype=jnp.float32)
    params = default_cost_params(spec, dtype=jnp.float32)
    start, goal = robot_start_goal(spec)
    start, goal = start.astype(jnp.float32), goal.astype(jnp.float32)
    state = jax.block_until_ready(
        init_loop_state(jax.random.PRNGKey(0), ctrl, start, goal,
                        "RANDOM", batch_shape=(B,)))
    print("loop state ready", flush=True)

    mb = fused_vmem_bytes(spec.n_solv, spec.n_obst, sb=sb,
                          structure=structure) / 2**20
    print(f"config {which} sb={sb} B={B} iters={iters}: est VMEM {mb:.1f} MB",
          flush=True)

    @jax.jit
    def lin(st):
        pred = predict_trajectory(st.obst, ctrl.spec, ctrl.spec.n_solv)
        pred = jnp.moveaxis(pred, 0, 1)
        return jax.vmap(
            lambda rti, x0, p: ctrl.build_qp(rti, x0, goal, p, params)
        )(st.rti, st.x0, pred)

    qp = jax.block_until_ready(lin(state))
    print("qp built", flush=True)

    # compile and execute as separate, separately-timed phases so a timeout
    # is attributable: Mosaic compile happens on the host, a runtime hang
    # wedges the device
    t0 = time.time()
    solve = jax.jit(lambda q: solve_ocp_qp_fused(
        q, iters=iters, sublane_batch=sb, structure=structure))
    compiled = solve.lower(qp).compile()
    print(f"compiled in {time.time() - t0:.1f}s", flush=True)

    t0 = time.time()
    sol = compiled(qp)
    v = float(jnp.sum(sol.du[:, 0]))
    print(f"OK {which} sb={sb}: sum_du0={v:.6f} mu[:3]={sol.mu[:3]} "
          f"(run {time.time() - t0:.2f}s)", flush=True)


if __name__ == "__main__":
    main()
