"""Scaling-efficiency report over a device mesh.

The north star asks for solves/s scaling efficiency at 1 chip / multiple
devices (SURVEY.md section 7 step 7). With one physical TPU available, the
multi-device path is validated on the virtual CPU mesh
(``--xla_force_host_platform_device_count``), which exercises the identical
shard_map + psum program the pod would run; on a real multi-chip slice the
same script reports ICI scaling.

Usage:
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/scaling_report.py --devices 1 2 4 8 --batch 64
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")

import jax

# honor JAX_PLATFORMS even when a sitecustomize pre-registered a TPU plugin
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--devices", nargs="+", type=int, default=[1, 2, 4, 8])
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--ticks", type=int, default=5)
    p.add_argument("--qp-iter", type=int, default=10)
    p.add_argument("--n-solv", type=int, default=10)
    p.add_argument("--out", default=None,
                   help="write the report rows as a JSON artifact")
    p.add_argument("--strong", action="store_true",
                   help="strong scaling: keep the TOTAL batch fixed at "
                        "--batch and split it across devices. With "
                        "devices <= physical cores this isolates the SPMD "
                        "program's own overhead (sharding + collectives) "
                        "from host-core contention — the weak-scaling "
                        "efficiencies beyond the core count only measure "
                        "contention on a virtual CPU mesh.")
    args = p.parse_args()

    from doa_mpc_tpu.config import SolverOptions, WorldSpec, default_cost_params
    from doa_mpc_tpu.parallel.mesh import (
        make_data_mesh, make_sharded_rollout, shard_leading_axis)
    from doa_mpc_tpu.sim.closed_loop import init_loop_state, make_batched_rollout
    from doa_mpc_tpu.sim.obstacles import robot_start_goal
    from doa_mpc_tpu.solver.sqp_rti import make_rti_controller

    dtype = jnp.float32
    spec = WorldSpec(tf=1.0, n_solv=args.n_solv, qp_iter=args.qp_iter)
    opts = SolverOptions(qp_iter=args.qp_iter, integrator="rk4")
    ctrl = make_rti_controller(spec, opts, dtype=dtype)
    params = default_cost_params(spec, dtype=dtype)
    start, goal = robot_start_goal(spec)
    start, goal = start.astype(dtype), goal.astype(dtype)

    results = {}
    rows = []
    for n_dev in args.devices:
        if n_dev > len(jax.devices()):
            continue
        # weak scaling: fixed work per device; strong: fixed total work
        B = args.batch if args.strong else args.batch * n_dev
        st = init_loop_state(jax.random.PRNGKey(0), ctrl, start, goal,
                             "RANDOM", batch_shape=(B,))
        mesh = make_data_mesh(jax.devices()[:n_dev])
        st = shard_leading_axis(st, mesh)
        rollout = make_batched_rollout(ctrl, goal, params,
                                       max_iter=args.ticks)
        fn = jax.jit(make_sharded_rollout(rollout, mesh))
        final, stats = fn(st)
        float(stats["n"])                # force
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            final, stats = fn(st)
            float(stats["n"])
            best = min(best, time.perf_counter() - t0)
        solves = B * args.ticks
        results[n_dev] = solves / best
        d0 = min(results)
        if args.strong:
            # speedup vs the 1-device run of the SAME total work
            eff = (results[n_dev] / results[d0]) * (d0 / n_dev)
            key = "strong_scaling_efficiency"
        else:
            per_dev0 = results[d0] / d0
            eff = (results[n_dev] / n_dev) / per_dev0
            key = "weak_scaling_efficiency"
        row = {
            "devices": n_dev, "batch": B,
            "solves_per_s": round(results[n_dev], 1),
            key: round(eff, 3),
        }
        rows.append(row)
        print(json.dumps(row))
    if jax.devices()[0].platform == "cpu":
        print("# note: virtual CPU devices share one host's cores - weak "
              "scaling here validates the SPMD program, not ICI bandwidth")
    if args.out:
        with open(args.out, "w") as f:
            json.dump({
                "platform": jax.devices()[0].platform,
                "n_devices_avail": len(jax.devices()),
                "host_cores": os.cpu_count(),
                "ticks": args.ticks, "qp_iter": args.qp_iter,
                "n_solv": args.n_solv,
                "mode": "strong-scaling" if args.strong else "weak-scaling",
                "note": (f"virtual CPU devices share {os.cpu_count()} "
                         "physical host cores, which caps aggregate "
                         "throughput; efficiency beyond that core count "
                         "measures host contention, not the SPMD program. "
                         "This artifact validates that the sharded program "
                         "runs and scales to the host's core limit; ICI "
                         "scaling needs a real multi-chip slice.")
                if jax.devices()[0].platform == "cpu" else "real devices",
                "rows": rows,
            }, f, indent=1)


if __name__ == "__main__":
    main()
