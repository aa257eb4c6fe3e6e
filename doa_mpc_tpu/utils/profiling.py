"""Performance accounting: FLOP counts, roofline, speed-of-light ratios.

The reference never measures anything (its one acados timing call is
commented out, ``robot_ocp_problem.py:262-263``). Here every hot component
has an analytic FLOP/byte model so measured throughput can be compared
against the hardware ceiling (SURVEY.md section 5 / north-star requirement).

Timing through remote-tunneled platforms: ``jax.block_until_ready`` may not
actually synchronize, so :func:`time_fn` chains the function inside one
jitted scan and fetches a dependent scalar — wall / reps is the true
steady-state latency.
"""

from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp


# TPU v5e (1 chip) public specs; used for speed-of-light ratios.
TPU_V5E_F32_FLOPS = 98e12 / 2        # bf16 peak ~197 TFLOP/s, f32 ~ half of half
TPU_V5E_HBM_GBS = 819.0
# VPU issue ceiling: the vector unit is an (8, 128) 2D machine with 4
# independent ALUs per element slot (public "How to Scale Your Model"
# appendix); at the ~1.5 GHz clock implied by the published bf16 peak
# (197e12 = 2 * 4 MXUs * 128*128 * clock) that is 8*128*4*1.5e9 ~= 6.1e12
# single-cycle f32 ops/s. Divides/rsqrts issue slower; treat as a ceiling.
TPU_V5E_VPU_OPS = 8 * 128 * 4 * 1.5e9


def tick_flops(spec, qp_iter: int, batch: int) -> dict:
    """Analytic FLOP model of one batched control tick.

    Components (per scenario):
      linearize : N stages x RK4-with-jacfwd  (~8 tangents x ~40 flops x 4)
      riccati   : per IP iteration, backward factorize ~ N x (4 matmuls
                  nx^3-ish + chol) + 2 back-substitutions
      ip_misc   : residuals/sigmas/steps over ~2(N+1)(nbx+M) + 2N*nu pairs
    """
    N, nx, nu, M = spec.n_solv, spec.nx, spec.nu, spec.n_obst
    lin = N * 8 * 40 * 4
    mm = 2 * nx * nx * nx
    fact = N * (4 * mm + 3 * nx * nu * nu + 20)
    solve = N * (4 * nx * nx + 6 * nx * nu)
    per_iter = fact + 2 * solve + 40 * (N + 1) * (2 * M + nx + nu)
    total = lin + qp_iter * per_iter
    return {
        "per_scenario_flops": total,
        "per_tick_flops": total * batch,
        "linearize_flops": lin * batch,
        "per_ip_iter_flops": per_iter * batch,
    }


def fused_hbm_bytes(spec, batch: int, structure=None) -> int:
    """EXACT per-tick HBM traffic of the fused interior-point kernel.

    The whole solve runs in one Pallas launch: QP data is DMA'd into VMEM
    ONCE per solve (not per IP iteration) and the dx/du/s/mu/stat outputs
    are DMA'd out once (``ops/ip_pallas.py`` layouts; the round-4 verdict
    flagged the old 2-passes-per-iteration model as stale for this path).
    """
    from doa_mpc_tpu.ops.ip_pallas import _layouts
    from doa_mpc_tpu.solver.sqp_rti import UNICYCLE_QP_STRUCTURE

    structure = structure or UNICYCLE_QP_STRUCTURE
    qpx, qpu, _, _, _ = _layouts(spec.nx, spec.nu, spec.n_obst,
                                 4, structure)
    st = spec.n_solv + 1
    floats_in = st * qpx.width + spec.n_solv * qpu.width + spec.nx
    floats_out = (st * spec.nx + spec.n_solv * spec.nu  # dx, du
                  + st * spec.n_obst + 2)               # s, mu/stat
    return 4 * batch * (floats_in + floats_out)


def speed_of_light_report(spec, qp_iter: int, batch: int,
                          measured_tick_s: float,
                          backend: str = "fused") -> dict:
    """Roofline accounting of one batched control tick.

    ``backend='fused'``: HBM traffic is one QP read + one result write per
    SOLVE (the production kernel keeps all state in VMEM); the relevant
    compute ceiling is the VPU issue rate — at nx=5 the batch-lanes layout
    does every multiply-add on the VPU by design (the MXU wants >=128-wide
    contractions; a 5-wide one would waste 96% of the systolic array), so
    the MXU f32 peak is reported only as context.
    ``backend='xla'``: the legacy model — the unfused IP loop re-reads QP
    data ~2x per iteration from HBM.
    """
    f = tick_flops(spec, qp_iter, batch)
    achieved = f["per_tick_flops"] / measured_tick_s
    if backend == "fused":
        hbm_bytes = fused_hbm_bytes(spec, batch)
        hbm_time = hbm_bytes / (TPU_V5E_HBM_GBS * 1e9)
    else:
        hbm_bytes = batch * 4 * (
            spec.n_solv * (2 * spec.nx * spec.nx + spec.nx * spec.nu
                           + spec.nx + spec.nu)
            + (spec.n_solv + 1) * (spec.n_obst * (spec.nx + 3) + 10))
        hbm_bytes *= 2 * qp_iter
        hbm_time = hbm_bytes / (TPU_V5E_HBM_GBS * 1e9)
    vpu_time = f["per_tick_flops"] / TPU_V5E_VPU_OPS
    return {
        **f,
        "backend": backend,
        "achieved_tflops": achieved / 1e12,
        "mxu_sol_ratio": achieved / TPU_V5E_F32_FLOPS,
        "vpu_issue_ratio": achieved / TPU_V5E_VPU_OPS,
        "vpu_bound_tick_s": vpu_time,
        "hbm_bytes": hbm_bytes,
        "hbm_bound_tick_s": hbm_time,
        "hbm_fraction_of_tick": hbm_time / measured_tick_s,
        "measured_tick_s": measured_tick_s,
    }


def time_fn(fn, state0, reps: int = 10) -> float:
    """Steady-state per-call latency of ``fn`` (state -> state)."""

    @jax.jit
    def run(s0):
        def body(s, _):
            return fn(s), None
        sN, _ = jax.lax.scan(body, s0, None, length=reps)
        return sN, jnp.sum(jax.tree.leaves(sN)[0])

    out, chk = run(state0)
    float(chk)                       # force execution (compile + warmup)
    t0 = time.perf_counter()
    out, chk = run(state0)
    float(chk)
    return (time.perf_counter() - t0) / reps


@dataclasses.dataclass
class Timer:
    """Accumulating section timer for host-side phases."""

    sections: dict = dataclasses.field(default_factory=dict)

    def section(self, name):
        timer = self

        class _Ctx:
            def __enter__(self):
                self.t0 = time.perf_counter()

            def __exit__(self, *a):
                timer.sections[name] = (timer.sections.get(name, 0.0)
                                        + time.perf_counter() - self.t0)

        return _Ctx()
