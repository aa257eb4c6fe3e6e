import sys; sys.path.insert(0, "."); sys.path.insert(0, "tests")
import os, time
import numpy as np
import jax, jax.numpy as jnp
print("devices:", jax.devices(), flush=True)

from test_ip_qp import _make_qp
from doa_mpc_tpu.ops.ip_qp import solve_ocp_qp
from doa_mpc_tpu.ops.ip_pallas import solve_ocp_qp_fused

rng = np.random.default_rng(0)
qps = [_make_qp(rng, N=20, M=5) for _ in range(8)]
qp = jax.tree.map(lambda *xs: jnp.stack(xs).astype(jnp.float32), *qps)
# tile batch to 128
qp = jax.tree.map(lambda x: jnp.tile(x, (16,) + (1,) * (x.ndim - 1)), qp)
print("batch:", qp.A.shape[0], flush=True)

ref = solve_ocp_qp(qp, iters=10)
print("xla mu:", np.asarray(ref.mu)[:4], flush=True)

sb = int(sys.argv[1]) if len(sys.argv) > 1 else 1
fus = solve_ocp_qp_fused(qp, iters=10, sublane_batch=sb)
mu = np.asarray(fus.mu)
print(f"fused sb={sb} mu:", mu[:4], flush=True)
print("max |dx diff|:", np.abs(np.asarray(fus.dx) - np.asarray(ref.dx)).max(), flush=True)
