"""Checkpoint/resume: exactness of snapshot-resumed rollouts."""

import numpy as np
import jax
import jax.numpy as jnp

from doa_mpc_tpu.config import WorldSpec, SolverOptions, default_cost_params
from doa_mpc_tpu.sim.checkpoint import (
    load_state, rollout_with_checkpoints, save_state,
)
from doa_mpc_tpu.sim.closed_loop import (
    init_loop_state, make_batched_rollout, metrics_of,
)
from doa_mpc_tpu.sim.obstacles import robot_start_goal
from doa_mpc_tpu.solver.sqp_rti import make_rti_controller

SPEC = WorldSpec(tf=0.5, n_solv=5, n_obst=3, qp_iter=6)
OPTS = SolverOptions(qp_iter=6, integrator="rk4")


def _setup(B=4):
    ctrl = make_rti_controller(SPEC, OPTS, dtype=jnp.float64)
    params = default_cost_params(SPEC, dtype=jnp.float64)
    start, goal = robot_start_goal(SPEC)
    st = init_loop_state(jax.random.PRNGKey(0), ctrl, start, goal, "RANDOM",
                         batch_shape=(B,))
    return ctrl, params, goal, st


def test_save_load_roundtrip(tmp_path):
    _, _, _, st = _setup()
    path = str(tmp_path / "ck.npz")
    save_state(path, st, {"note": "test"})
    st2, meta = load_state(path, st)
    assert meta["note"] == "test"
    for a, b in zip(jax.tree.leaves(st), jax.tree.leaves(st2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_chunked_resume_is_exact(tmp_path):
    ctrl, params, goal, st = _setup()
    chunk = jax.jit(make_batched_rollout(ctrl, goal, params, max_iter=5))
    path = str(tmp_path / "roll.npz")

    # straight-through reference: 4 chunks of 5 ticks
    ref = st
    for _ in range(4):
        ref = chunk(ref)

    # run 2 chunks, "crash", resume for the remaining 2
    out = rollout_with_checkpoints(chunk, st, 2, path)
    resumed = rollout_with_checkpoints(chunk, st, 4, path, resume=True)
    mr = metrics_of(jax.tree.map(lambda a: a, ref))
    mo = metrics_of(resumed)
    np.testing.assert_allclose(np.asarray(mo.dist), np.asarray(mr.dist),
                               atol=1e-12)
    np.testing.assert_array_equal(np.asarray(mo.steps), np.asarray(mr.steps))


def test_shape_mismatch_rejected(tmp_path):
    _, _, _, st = _setup(B=4)
    path = str(tmp_path / "ck.npz")
    save_state(path, st)
    _, _, _, other = _setup(B=8)
    import pytest
    with pytest.raises(ValueError):
        load_state(path, other)
