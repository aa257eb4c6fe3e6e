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
    rep = speed_of_light_report(spec, qp_iter=20, batch=4096,
                                measured_tick_s=0.0208)
    assert rep["achieved_tflops"] > 0
    assert 0 < rep["compute_sol_ratio"] < 1
    assert rep["hbm_bound_tick_s"] > 0


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
