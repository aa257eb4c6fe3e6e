"""Golden-trace regression test.

The reference's de-facto regression mechanism is its bundled seeded CSV data
(SURVEY.md section 4 — ``src/simulation/test_data/``). The acados toolchain
is not installable here, so cross-engine golden traces are impossible;
instead this pins OUR engine's f64 closed-loop trajectory for a fixed seed.
Any unintended numerical change to dynamics, linearization, QP solver, or
the closed loop shows up as a diff against the stored snapshot
(``tests/golden/closed_loop_seed42.npz``; regenerate deliberately via the
snippet in its git history when semantics change on purpose).

Self-reference caveat, and its answer: a snapshot of our own engine
cannot catch a bug present at snapshot time. The INDEPENDENT end-to-end
oracle is ``test_native.py::test_native_closed_loop_oracle`` — a
from-scratch C++ implementation of the whole loop that free-runs against
the JAX engine to ~1e-10 — and, at the statistics level, the
seed-matched parity matrices vs the reference's own bundled runs
(``results/parity_r5/``). This file's job is cheap drift DETECTION;
those two provide the ground truth.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp

from doa_mpc_tpu.config import WorldSpec, SolverOptions, default_cost_params
from doa_mpc_tpu.sim.closed_loop import init_loop_state, make_rollout, metrics_of
from doa_mpc_tpu.sim.obstacles import robot_start_goal
from doa_mpc_tpu.solver.sqp_rti import make_rti_controller

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "closed_loop_seed42.npz")


def test_closed_loop_matches_golden():
    data = np.load(GOLDEN)
    spec = WorldSpec(tf=1.0, n_solv=10, qp_iter=15)
    opts = SolverOptions(qp_iter=15, integrator="rk4")
    ctrl = make_rti_controller(spec, opts, dtype=jnp.float64)
    params = default_cost_params(spec, dtype=jnp.float64)
    start, goal = robot_start_goal(spec)
    st = init_loop_state(jax.random.PRNGKey(42), ctrl, start, goal, "RANDOM")
    rollout = jax.jit(make_rollout(ctrl, goal, params, max_iter=40,
                                   collect=True))
    fin, (xs, obs, pred) = rollout(st)
    m = metrics_of(fin)
    # the collected prediction horizon has the show_pred shape (:237-241)
    assert pred.shape == (40, spec.n_solv + 1, 5)
    # trajectory within the north-star control-trace tolerance (1e-3),
    # checked much tighter here since it is the same engine
    np.testing.assert_allclose(np.asarray(xs), data["xs"], atol=1e-9)
    np.testing.assert_allclose(np.asarray(obs), data["obs"], atol=1e-9)
    np.testing.assert_allclose(float(m.min_margin), float(data["min_margin"]),
                               atol=1e-9)
    assert int(m.steps) == int(data["steps"])
