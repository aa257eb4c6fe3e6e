"""Cost weights as a batch axis.

The reference sweeps configuration by rewriting its config source file and
re-executing (run_multiple_experiments.py:8-21). Here CostParams is a traced
input of the parametric tick, so a weight sweep (or RL-proposed weights,
BASELINE.json config 4) is just one more vmapped axis — no recompilation,
no processes.
"""

import numpy as np
import jax
import jax.numpy as jnp

from doa_mpc_tpu.config import WorldSpec, SolverOptions, default_cost_params
from doa_mpc_tpu.sim.closed_loop import init_loop_state, make_parametric_tick
from doa_mpc_tpu.sim.obstacles import robot_start_goal
from doa_mpc_tpu.solver.sqp_rti import make_rti_controller

SPEC = WorldSpec(tf=0.5, n_solv=5, n_obst=3, qp_iter=8)
OPTS = SolverOptions(qp_iter=8, integrator="rk4")


def test_batched_weights_match_singles():
    ctrl = make_rti_controller(SPEC, OPTS, dtype=jnp.float64)
    start, goal = robot_start_goal(SPEC)
    base = default_cost_params(SPEC, dtype=jnp.float64)
    # three weight settings: default, heavy control penalty, heavy LM
    # damping. (Scaling q up/down does not discriminate here: with the
    # acados-placement LM the default controller saturates the control
    # bounds for the whole 5-tick window this test runs, and any nonzero
    # goal pull from 19.8 m away saturates them identically.)
    variants = [
        base,
        base.__class__(**{**base.__dict__, "r_diag": base.r_diag * 2000.0}),
        base.__class__(**{**base.__dict__, "lm_reg": base.lm_reg * 10.0}),
    ]
    params_b = jax.tree.map(lambda *xs: jnp.stack(xs), *variants)

    st = init_loop_state(jax.random.PRNGKey(0), ctrl, start, goal,
                         batch_shape=(3,))
    tick = make_parametric_tick(ctrl)
    vtick = jax.jit(jax.vmap(tick, in_axes=(0, None, 0)))
    stb = st
    for _ in range(5):
        stb = vtick(stb, goal, params_b)
    # singles
    for i, p in enumerate(variants):
        s = jax.tree.map(lambda a: a[i], st)
        one = jax.jit(lambda s, p=p: tick(s, goal, p))
        for _ in range(5):
            s = one(s)
        np.testing.assert_allclose(np.asarray(stb.x0[i]), np.asarray(s.x0),
                                   atol=1e-9)
    # the weight settings actually change behavior
    assert float(jnp.max(jnp.abs(stb.x0[0] - stb.x0[1]))) > 1e-4
    assert float(jnp.max(jnp.abs(stb.x0[0] - stb.x0[2]))) > 1e-4
