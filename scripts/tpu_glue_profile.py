"""Time the non-QP ("glue") phases of the batched tick individually.

Each phase is scan-chained TICKS times inside one jit with a dependent
scalar fetched (the only reliable timing method through the remote tunnel).
Phases:
  forecast   closed-form obstacle trajectory prediction
  buildqp    GN linearization + QP assembly (includes forecast input)
  world      noisy obstacle world step incl. per-row PRNG key splits
  plant      RK4 plant integration
  noqp       the full glue tick (zero QP step) for reference

Usage: python scripts/tpu_glue_profile.py [B]
"""

import sys
sys.path.insert(0, ".")

import time

import jax
import jax.numpy as jnp

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
TICKS = 20

from doa_mpc_tpu.config import SolverOptions, WorldSpec, default_cost_params
from doa_mpc_tpu.sim.closed_loop import init_loop_state, make_batched_tick
from doa_mpc_tpu.sim.obstacles import (
    ObstacleState, obstacle_step, predict_trajectory, robot_start_goal,
)
from doa_mpc_tpu.solver.sqp_rti import make_rti_controller

dtype = jnp.float32
spec = WorldSpec(tf=2.0, n_solv=20, qp_iter=10)
opts = SolverOptions(qp_iter=10, integrator="rk4")
ctrl = make_rti_controller(spec, opts, dtype=dtype)
params = default_cost_params(spec, dtype=dtype)
start, goal = robot_start_goal(spec)
start, goal = start.astype(dtype), goal.astype(dtype)
st0 = init_loop_state(jax.random.PRNGKey(0), ctrl, start, goal, "RANDOM",
                      batch_shape=(B,))


LONG = 200


def timeit(name, fn_short, fn_long, *args):
    """RTT-cancelled per-tick time: difference a LONG and a TICKS chain,
    each forcing completion with a dependent-scalar fetch (the tunnel's
    dispatch modes make block_until_ready-only timing fictional; see
    docs/DESIGN.md section 3)."""
    def best_of(jf):
        out = jf(*args)
        _ = float(jnp.sum(jax.tree.leaves(out)[0]))
        best = float("inf")
        for _i in range(4):
            t0 = time.perf_counter()
            out = jf(*args)
            _ = float(jnp.sum(jax.tree.leaves(out)[0]))
            best = min(best, time.perf_counter() - t0)
        return best
    t = max(best_of(fn_long) - best_of(fn_short), 1e-12) / (LONG - TICKS)
    print(f"{name:10s}: {t * 1e3:7.4f} ms/tick", flush=True)


def chain(step):
    def make(n):
        @jax.jit
        def run(carry):
            def body(c, _):
                return step(c), None
            final, _ = jax.lax.scan(body, carry, None, length=n)
            return final
        return run
    return make(TICKS), make(LONG)


# forecast: obstacles -> predicted trajectories, fed back via a dep that
# covers the WHOLE forecast (pred[0] alone is the identity fold at t=0 and
# lets XLA dead-code-eliminate the remaining N steps)
def f_forecast(carry):
    pos, vel = carry
    pred = predict_trajectory(ObstacleState(pos, vel), spec, spec.n_solv)
    return pos + 1e-6 * jnp.mean(pred, axis=0), vel

timeit("forecast", *chain(f_forecast), (st0.obst.pos, st0.obst.vel))


# buildqp: forecast + GN linearize + assemble. The obstacle state is part of
# the carry (a closure over st0.obst is loop-invariant and hoists out of the
# scan) and the dependency sums EVERY QP leaf so nothing is DCE-able.
def f_buildqp(carry):
    x0, rti, pos, vel = carry
    pred = predict_trajectory(ObstacleState(pos, vel), spec, spec.n_solv)
    pred = jnp.moveaxis(pred, 0, 1)
    qp = jax.vmap(
        lambda r, x, p: ctrl.build_qp(r, x, goal, p, params)
    )(rti, x0, pred)
    dep = sum(jnp.sum(leaf, axis=tuple(range(1, leaf.ndim)))
              for leaf in jax.tree.leaves(qp))
    return x0 + 1e-6 * dep[:, None], rti, pos + 1e-9 * dep[:, None, None], vel

timeit("buildqp", *chain(f_buildqp),
       (st0.x0, st0.rti, st0.obst.pos, st0.obst.vel))


# world: per-row key split + noisy obstacle bounce step
def f_world(carry):
    key, pos, vel = carry
    keys = jax.vmap(jax.random.split)(key)
    key, sub = keys[:, 0], keys[:, 1]
    ob = jax.vmap(
        lambda k, p, v: obstacle_step(k, ObstacleState(p, v), spec)
    )(sub, pos, vel)
    return key, ob.pos, ob.vel

timeit("world", *chain(f_world), (st0.key, st0.obst.pos, st0.obst.vel))


# plant: RK4 integration of the robot
def f_plant(carry):
    x0 = carry
    u = 0.01 * x0[:, :2]
    return ctrl.integrate(x0, u)

timeit("plant", *chain(f_plant), st0.x0)


# full glue for reference
tick = make_batched_tick(ctrl, goal, params, backend="zero")
timeit("noqp", *chain(tick), st0)
