import sys; sys.path.insert(0, "."); sys.path.insert(0, "tests")
import importlib.util
import inspect
import numpy as np
import jax, jax.numpy as jnp

path = sys.argv[1]
sb = int(sys.argv[2]) if len(sys.argv) > 2 else 1
spec_ = importlib.util.spec_from_file_location("ipp_probe", path)
mod = importlib.util.module_from_spec(spec_)
spec_.loader.exec_module(mod)

from test_ip_qp import _make_qp
from doa_mpc_tpu.ops.ip_qp import solve_ocp_qp

rng = np.random.default_rng(0)
qps = [_make_qp(rng, N=20, M=5) for _ in range(8)]
qp = jax.tree.map(lambda *xs: jnp.stack(xs).astype(jnp.float32), *qps)
qp = jax.tree.map(lambda x: jnp.tile(x, (16,) + (1,) * (x.ndim - 1)), qp)

ref = solve_ocp_qp(qp, iters=10)
print("xla mu:", np.asarray(ref.mu)[:4], flush=True)
# decide from the signature whether this (possibly historical) module
# takes sublane_batch — catching TypeError around the call would also
# swallow TypeErrors raised *inside* the solve and mislabel the result
kw = dict(iters=10)
if "sublane_batch" in inspect.signature(mod.solve_ocp_qp_fused).parameters:
    kw["sublane_batch"] = sb
fus = mod.solve_ocp_qp_fused(qp, **kw)
print(f"fused({path}) sb={sb} mu:", np.asarray(fus.mu)[:4], flush=True)
print("max |dx diff|:", np.abs(np.asarray(fus.dx) - np.asarray(ref.dx)).max(), flush=True)
