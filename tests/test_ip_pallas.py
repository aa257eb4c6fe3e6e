"""Fused whole-solve IP kernel vs the batch-native XLA solver.

The interpreter-mode run of this kernel is slow on CPU (every scratch access
becomes an interpreted op), so the equivalence test is gated behind
RUN_SLOW_TESTS=1. The kernel's correctness is additionally covered by:
(a) TPU-side A/B runs against the per-iteration fused kernel it replaced
(max |dx| diff 7e-8 at 1 iteration, identical final mu at 20 iterations),
(b) identical results across stage_unroll factors on TPU (bitwise: max
|dx| diff 0.0), and (c) the fused-backend closed-loop quality runs in
results/.

Tolerance note: the fused kernel and the XLA solver produce slightly
different *iterates* (~1e-4 after one iteration) because the
fraction-to-boundary rule is evaluated as min(1, tau*min_k(v/-dv)) versus
min over tau*v/-dv per pair, and mu_aff is accumulated in a different
association order; the centering power sigma = (mu_aff/mu)^3 amplifies
those last-ulp differences. Both remain valid centered IP steps and both
paths converge to the same KKT point (same mu, matching primals) — the
multi-iteration check below asserts that.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

slow = pytest.mark.skipif(os.environ.get("RUN_SLOW_TESTS") != "1",
                          reason="interpret-mode fused kernel is slow")


def _batched(n_qp=4, **kw):
    from test_ip_qp import _make_qp

    rng = np.random.default_rng(0)
    qps = [_make_qp(rng, **kw) for _ in range(n_qp)]
    return jax.tree.map(lambda *xs: jnp.stack(xs).astype(jnp.float32), *qps)


@slow
def test_fused_iteration_matches_xla_interpret():
    from doa_mpc_tpu.ops.ip_qp import solve_ocp_qp
    from doa_mpc_tpu.ops.ip_pallas import solve_ocp_qp_fused

    batched = _batched(N=4, M=2, seed_scale=2.0)
    ref = solve_ocp_qp(batched, iters=1)
    fus = solve_ocp_qp_fused(batched, iters=1, interpret=True)
    np.testing.assert_allclose(np.asarray(fus.dx), np.asarray(ref.dx),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(fus.du), np.asarray(ref.du),
                               atol=5e-4)
    # mu is computed from the pre-update state -> exactly the same path
    np.testing.assert_allclose(np.asarray(fus.mu), np.asarray(ref.mu),
                               rtol=1e-6)


@slow
def test_fused_converges_to_same_solution_interpret():
    from doa_mpc_tpu.ops.ip_qp import solve_ocp_qp
    from doa_mpc_tpu.ops.ip_pallas import solve_ocp_qp_fused

    batched = _batched(N=4, M=2, seed_scale=2.0)
    ref = solve_ocp_qp(batched, iters=25)
    fus = solve_ocp_qp_fused(batched, iters=25, interpret=True)
    assert float(jnp.max(fus.mu)) < 1e-6
    np.testing.assert_allclose(np.asarray(fus.dx), np.asarray(ref.dx),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(fus.du), np.asarray(ref.du),
                               atol=2e-3)


def test_fused_block_sublane_widths_are_tile_aligned():
    """Every DMA'd / output / scratch sublane width must be a multiple of 8.

    The Mosaic toolchain faults the TPU worker (or hangs it) when a manual
    DMA target or an output block has a sublane width that is not a whole
    number of f32 (8, 128) tiles — this killed the round-1 bench. Trace the
    wrapper and assert the invariant on the lowered pallas_call shapes.
    """
    from doa_mpc_tpu.ops import ip_pallas

    recorded = []
    orig = ip_pallas.pl.pallas_call

    def spy(kernel, *, grid, in_specs, out_specs, out_shape, scratch_shapes,
            **kw):
        for s in out_shape:
            recorded.append(("out", s.shape))
        for s in scratch_shapes:
            shape = getattr(s, "shape", None)
            if shape is not None:
                recorded.append(("scratch", tuple(shape)))
        return orig(kernel, grid=grid, in_specs=in_specs,
                    out_specs=out_specs, out_shape=out_shape,
                    scratch_shapes=scratch_shapes, **kw)

    batched = _batched(N=3, M=2, seed_scale=2.0)
    ip_pallas.pl.pallas_call = spy
    try:
        jax.eval_shape(lambda qp: ip_pallas.solve_ocp_qp_fused(
            qp, iters=1, interpret=True), batched)
    finally:
        ip_pallas.pl.pallas_call = orig

    assert recorded, "pallas_call was never reached"
    for kind, shape in recorded:
        sublane = shape[-2]
        assert sublane % 8 == 0, (kind, shape)


def _controller_qp(n_scen=4, N=6, M=3):
    """Batched QP from the real controller's build_qp (satisfies the
    declared unicycle structure by construction)."""
    from doa_mpc_tpu.config import SolverOptions, WorldSpec, default_cost_params
    from doa_mpc_tpu.sim.closed_loop import init_loop_state
    from doa_mpc_tpu.sim.obstacles import predict_trajectory, robot_start_goal
    from doa_mpc_tpu.solver.sqp_rti import make_rti_controller

    spec = WorldSpec(tf=0.1 * N, n_solv=N, n_obst=M, qp_iter=10)
    opts = SolverOptions(qp_iter=10, integrator="rk4")
    ctrl = make_rti_controller(spec, opts, dtype=jnp.float32)
    params = default_cost_params(spec, dtype=jnp.float32)
    start, goal = robot_start_goal(spec)
    state = init_loop_state(jax.random.PRNGKey(7), ctrl, start, goal,
                            "RANDOM", batch_shape=(n_scen,))
    pred = predict_trajectory(state.obst, spec, N)
    pred = jnp.moveaxis(pred, 0, 1)
    return jax.vmap(
        lambda rti, x0, p: ctrl.build_qp(rti, x0, goal, p, params)
    )(state.rti, state.x0, pred)


def test_build_qp_satisfies_declared_unicycle_structure():
    """The structure declaration is a CONTRACT: the fused kernel never
    reads the entries declared trivial, so build_qp must actually produce
    them as exact zeros / exact identity columns."""
    from doa_mpc_tpu.solver.sqp_rti import UNICYCLE_QP_STRUCTURE as ST

    qp = _controller_qp()
    nx = qp.A.shape[-1]

    assert ST.q_diag and ST.r_diag and ST.s_zero and ST.zl_eq_zl2
    offdiag = np.asarray(qp.Q) * (1 - np.eye(nx))
    np.testing.assert_array_equal(offdiag, 0.0)
    offdiag_r = np.asarray(qp.R) * (1 - np.eye(qp.R.shape[-1]))
    np.testing.assert_array_equal(offdiag_r, 0.0)
    np.testing.assert_array_equal(np.asarray(qp.S), 0.0)
    np.testing.assert_array_equal(np.asarray(qp.zl), np.asarray(qp.Zl))

    dropped_c = [j for j in range(nx) if j not in ST.c_cols]
    np.testing.assert_array_equal(np.asarray(qp.C[..., dropped_c]), 0.0)

    eye = np.eye(nx, dtype=np.float32)
    for j in ST.a_unit_cols:
        np.testing.assert_array_equal(
            np.asarray(qp.A[..., :, j]),
            np.broadcast_to(eye[:, j], qp.A.shape[:-1]))


@slow
def test_fused_structured_matches_generic_interpret():
    """Declaring the structure must not change the math: structured and
    generic fused solves agree on controller-built QPs. (Kept tiny —
    interpret mode costs minutes per solve; TPU-side A/B at the production
    config showed bitwise-equal chained-solve checksums, see
    scripts/tpu_qp_sweep.py.)"""
    from doa_mpc_tpu.ops.ip_pallas import solve_ocp_qp_fused
    from doa_mpc_tpu.solver.sqp_rti import UNICYCLE_QP_STRUCTURE

    qp = _controller_qp(n_scen=2, N=3, M=2)
    gen = solve_ocp_qp_fused(qp, iters=2, interpret=True)
    st = solve_ocp_qp_fused(qp, iters=2, interpret=True,
                            structure=UNICYCLE_QP_STRUCTURE)
    np.testing.assert_allclose(np.asarray(st.dx), np.asarray(gen.dx),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(st.du), np.asarray(gen.du),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(st.mu), np.asarray(gen.mu),
                               rtol=1e-5)


def test_sublane_batch_autoselection_points():
    """Pin the shipped auto-selection outcomes: the production N=20/M=5
    problem must pick sublane_batch=8 (full VPU sublane occupancy — the
    round-4 1.8x lever) and the long-horizon N=40/M=8 config must degrade
    to sb=2 within the 14.5 MB budget. A kernel-layout edit that silently
    changes either shows up here before it shows up as a throughput
    regression on the chip (the bracketing of the estimate itself against
    Mosaic's scoped accounting is tests/test_vmem_guard.py)."""
    from doa_mpc_tpu.ops.ip_pallas import fused_vmem_bytes
    from doa_mpc_tpu.solver.sqp_rti import UNICYCLE_QP_STRUCTURE

    budget = 14.5 * 2**20

    def auto_sb(N, M):
        for cand in (8, 4, 2):
            if fused_vmem_bytes(N, M, sb=cand,
                                structure=UNICYCLE_QP_STRUCTURE) <= budget:
                return cand
        return 1

    assert auto_sb(20, 5) == 8
    assert auto_sb(40, 8) == 2
