"""Profiling utilities: FLOP model sanity + timing helper."""

import jax.numpy as jnp

from doa_mpc_tpu.config import WorldSpec
from doa_mpc_tpu.utils.profiling import (
    speed_of_light_report, tick_flops, time_fn, Timer,
)


def test_tick_flops_scales():
    spec = WorldSpec(tf=2.0, n_solv=20)
    f1 = tick_flops(spec, qp_iter=20, batch=1)
    f2 = tick_flops(spec, qp_iter=20, batch=4096)
    assert f2["per_tick_flops"] == 4096 * f1["per_tick_flops"]
    f3 = tick_flops(spec, qp_iter=40, batch=1)
    assert f3["per_scenario_flops"] > 1.8 * f1["per_scenario_flops"]


def test_speed_of_light_report_fields():
    spec = WorldSpec(tf=2.0, n_solv=20)
    # fused (production): HBM traffic is one QP read + one write per SOLVE
    rep = speed_of_light_report(spec, qp_iter=6, batch=4096,
                                measured_tick_s=0.000935)
    assert rep["achieved_tflops"] > 0
    assert 0 < rep["mxu_sol_ratio"] < 1
    assert 0 < rep["vpu_issue_ratio"] < 1
    assert rep["hbm_bound_tick_s"] > 0
    # the fused kernel's traffic must NOT scale with qp_iter...
    rep2 = speed_of_light_report(spec, qp_iter=12, batch=4096,
                                 measured_tick_s=0.000935)
    assert rep2["hbm_bytes"] == rep["hbm_bytes"]
    # ...while the legacy XLA path re-reads per iteration
    repx = speed_of_light_report(spec, qp_iter=6, batch=4096,
                                 measured_tick_s=0.000935, backend="xla")
    repx2 = speed_of_light_report(spec, qp_iter=12, batch=4096,
                                  measured_tick_s=0.000935, backend="xla")
    assert repx2["hbm_bytes"] == 2 * repx["hbm_bytes"]
    assert repx["hbm_bytes"] > rep["hbm_bytes"]


def test_fused_hbm_bytes_exact():
    """The fused-path byte count equals the packed-layout widths the
    kernel actually DMAs (ops/ip_pallas._layouts), not a guess."""
    from doa_mpc_tpu.ops.ip_pallas import _layouts
    from doa_mpc_tpu.solver.sqp_rti import UNICYCLE_QP_STRUCTURE
    from doa_mpc_tpu.utils.profiling import fused_hbm_bytes

    spec = WorldSpec(tf=2.0, n_solv=20)
    qpx, qpu, _, _, _ = _layouts(5, 2, 5, 4, UNICYCLE_QP_STRUCTURE)
    per_scen = (21 * qpx.width + 20 * qpu.width + 5      # inputs
                + 21 * 5 + 20 * 2 + 21 * 5 + 2)          # dx, du, s, mu/stat
    assert fused_hbm_bytes(spec, batch=7) == 7 * 4 * per_scen


def test_time_fn_runs():
    def step(x):
        return x * 1.000001 + 1e-6

    dt = time_fn(step, jnp.ones((64,)), reps=3)
    assert dt >= 0


def test_timer_sections():
    t = Timer()
    with t.section("a"):
        sum(range(1000))
    with t.section("a"):
        sum(range(1000))
    assert t.sections["a"] > 0
