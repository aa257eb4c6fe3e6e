"""Production (fused) backend under a device mesh on the real chip.

VERDICT r4 item 3: every earlier multi-device artifact ran the XLA fallback
backend. This script runs the PRODUCTION path — ``make_batched_tick(
backend='fused')``, the whole-solve Pallas kernel — under ``shard_map`` on
a 1-device TPU mesh at production shapes (N=20, M=5, qp6), with the
psum-reduced Monte-Carlo stats of ``parallel/mesh.py``, and cross-checks
the sharded run against the unsharded fused tick bit-for-bit. Proves the
Mosaic kernel composes with the sharded SPMD program; the multi-device
composition of the same ``shard_map`` code is covered by the 8-virtual-
device leg (tests/test_parallel.py::test_fused_kernel_under_shard_map_*).

Writes results/multichip_fused_r5.json.
"""

import json
import os
import sys
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from doa_mpc_tpu.config import SolverOptions, WorldSpec, default_cost_params
from doa_mpc_tpu.parallel.mesh import make_data_mesh, shard_leading_axis
from doa_mpc_tpu.sim.closed_loop import (
    init_loop_state, make_batched_tick, metrics_of)
from doa_mpc_tpu.sim.obstacles import robot_start_goal
from doa_mpc_tpu.solver.sqp_rti import make_rti_controller

B = 1024
TICKS = 20


def main():
    devs = jax.devices()
    mesh = make_data_mesh(devs)
    spec = WorldSpec(tf=2.0, n_solv=20, qp_iter=6)
    opts = SolverOptions(qp_iter=6, integrator="rk4")
    ctrl = make_rti_controller(spec, opts, dtype=jnp.float32)
    params = default_cost_params(spec, dtype=jnp.float32)
    start, goal = robot_start_goal(spec)
    st0 = init_loop_state(jax.random.PRNGKey(0), ctrl,
                          start.astype(np.float32), goal, "RANDOM",
                          batch_shape=(B,))
    tick = make_batched_tick(ctrl, goal, params, backend="fused")

    @partial(jax.shard_map, mesh=mesh, in_specs=(P("data"),),
             out_specs=(P("data"), P()), check_vma=False)
    def sharded_run(st):
        def body(s, _):
            return tick(s), None
        fin, _ = jax.lax.scan(body, st, None, length=TICKS)
        m = jax.vmap(metrics_of)(fin)
        stats = {
            "reached": jax.lax.psum(jnp.sum(m.reached.astype(jnp.float32)),
                                    "data"),
            "hit": jax.lax.psum(jnp.sum(m.hit.astype(jnp.float32)), "data"),
            "min_margin": jax.lax.pmin(jnp.min(m.min_margin), "data"),
        }
        return fin, stats

    @jax.jit
    def plain_run(st):
        def body(s, _):
            return tick(s), None
        fin, _ = jax.lax.scan(body, st, None, length=TICKS)
        return fin

    st_sh = shard_leading_axis(st0, mesh)
    fin_sh, stats = jax.jit(sharded_run)(st_sh)
    fin = plain_run(st0)
    dev = float(jnp.max(jnp.abs(fin_sh.x0 - fin.x0)))
    out = {
        "n_devices": len(devs),
        "platform": devs[0].platform,
        "backend": "fused",
        "batch": B,
        "ticks": TICKS,
        "config": {"n_solv": 20, "n_obst": 5, "qp_iter": 6},
        "stats": {k: float(v) for k, v in stats.items()},
        "max_x0_dev_vs_unsharded": dev,
        "ok": bool(np.isfinite(dev) and dev == 0.0
                   and np.isfinite(float(stats["min_margin"]))),
    }
    os.makedirs("results", exist_ok=True)
    with open("results/multichip_fused_r5.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
