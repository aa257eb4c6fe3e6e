"""Batched subgoal environment: MPC rollouts as the RL transition kernel.

The reference's training loop (``/root/reference/src/train.py:10-20``)
drives a missing ``GridWorld`` env whose design intent (presentation
"Synergies" slide; the ``set_subgoal`` hook at robot_ocp_problem.py:279-284
and the xN extraction "for training the RL agend" at :230-232) is: the agent
proposes (x, y) subgoals, the RTI MPC controller executes them, and the
agent is rewarded for safe progress toward the final goal.

This implements that env, batched: B scenarios advance in lockstep; each
``step(actions)`` runs ``k_ticks`` MPC control ticks toward the proposed
subgoals in one ``lax.scan``. Observations are the normalized robot pose
plus per-obstacle positions + clearance — 3*(n_obst+1) numbers, matching
the reference's ``num_inputs = 3 * (args.n_obst + 1)`` (train.py:27).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from doa_mpc_tpu.config import CostParams, SolverOptions, WorldSpec
from doa_mpc_tpu.sim.closed_loop import (
    LoopState, init_loop_state, make_parametric_tick,
)
from doa_mpc_tpu.sim.obstacles import robot_start_goal
from doa_mpc_tpu.solver.sqp_rti import make_rti_controller


class EnvState(NamedTuple):
    loop: LoopState          # batched closed-loop state
    goal: jnp.ndarray        # (B, 2) final goals
    prev_dist: jnp.ndarray   # (B,) distance to final goal at last step
    t: jnp.ndarray           # (B,) env steps taken
    done: jnp.ndarray        # (B,) episode finished


class SubgoalEnv:
    """Batched MPC subgoal environment.

    Rewards (our design; the reference never materialized one):
      progress        + (prev_dist - dist)            dense shaping
      goal reached    + 100
      collision       - 100, episode ends
      per step        - 0.5                           time pressure
    """

    def __init__(self, spec: WorldSpec | None = None,
                 opts: SolverOptions | None = None,
                 params: CostParams | None = None,
                 batch: int = 64, k_ticks: int = 10, max_steps: int = 40,
                 scenario: str = "RANDOM", dtype=jnp.float32):
        from doa_mpc_tpu.config import default_cost_params

        self.spec = spec or WorldSpec(tf=2.0, n_solv=20, qp_iter=10)
        self.opts = opts or SolverOptions(qp_iter=10, integrator="rk4")
        self.scenario = scenario
        self.ctrl = make_rti_controller(self.spec, self.opts, dtype=dtype)
        self.params = params or default_cost_params(self.spec, dtype=dtype)
        self.batch = batch
        self.k_ticks = k_ticks
        self.max_steps = max_steps
        self.dtype = dtype
        self.obs_dim = 3 * (self.spec.n_obst + 1)
        self.act_dim = 2
        self._tick = make_parametric_tick(self.ctrl)

    # -- observation ----------------------------------------------------
    def _obs(self, st: EnvState) -> jnp.ndarray:
        sc = 1.0 / self.spec.x_max
        robot = jnp.stack([st.loop.x0[..., 0] * sc, st.loop.x0[..., 1] * sc,
                           st.loop.x0[..., 2] / jnp.pi], -1)   # (B, 3)
        rel = st.loop.obst.pos - st.loop.x0[..., None, :2]
        clearance = (jnp.linalg.norm(rel, axis=-1)
                     - (self.spec.r_obst + self.spec.r_robot))
        per_obst = jnp.concatenate(
            [st.loop.obst.pos * sc, clearance[..., None] * sc], -1)  # (B,M,3)
        return jnp.concatenate(
            [robot, per_obst.reshape(per_obst.shape[:-2] + (-1,))], -1)

    # -- reset ----------------------------------------------------------
    def reset(self, key, scenario: str | None = None) -> Tuple[EnvState, jnp.ndarray]:
        scenario = self.scenario if scenario is None else scenario
        start, goal = robot_start_goal(self.spec)
        start, goal = start.astype(self.dtype), goal.astype(self.dtype)
        loop = init_loop_state(key, self.ctrl, start, goal, scenario,
                               batch_shape=(self.batch,))
        goals = jnp.broadcast_to(goal, (self.batch, 2))
        dist0 = jnp.linalg.norm(loop.x0[:, :2] - goals, axis=-1)
        st = EnvState(loop=loop, goal=goals, prev_dist=dist0,
                      t=jnp.zeros((self.batch,), jnp.int32),
                      done=jnp.zeros((self.batch,), bool))
        return st, self._obs(st)

    # -- step -----------------------------------------------------------
    def step(self, st: EnvState, actions: jnp.ndarray):
        """Run k_ticks MPC ticks toward per-row subgoals.

        The MPC's internal goal-reaching flag refers to the *subgoal*; the
        episode's termination refers to the final goal — so the loop's done
        mask is rebased around each env step (a subgoal reached mid-chunk
        just parks the robot there, as the reference's ``step``+
        ``set_subgoal`` interplay would).
        """
        loop = st.loop._replace(done=st.loop.done & False)  # clear subgoal-done
        hit_before = loop.min_margin <= 0.0

        def body(lp, _):
            lp2 = jax.vmap(self._tick, in_axes=(0, 0, None))(
                lp, actions, self.params)
            return lp2, None

        loop, _ = jax.lax.scan(body, loop, None, length=self.k_ticks)

        dist = jnp.linalg.norm(loop.x0[:, :2] - st.goal, axis=-1)
        reached = dist <= self.spec.tol
        hit_now = (loop.min_margin <= 0.0) & ~hit_before
        t = st.t + 1
        done = st.done | reached | hit_now | (t >= self.max_steps)

        reward = ((st.prev_dist - dist)
                  + 100.0 * reached.astype(self.dtype)
                  - 100.0 * hit_now.astype(self.dtype)
                  - 0.5)
        reward = jnp.where(st.done, 0.0, reward)

        new = EnvState(loop=loop, goal=st.goal, prev_dist=dist, t=t,
                       done=done)
        # frozen rows keep their old loop state
        new = jax.tree.map(
            lambda old, upd: jnp.where(
                jnp.reshape(st.done, st.done.shape + (1,) * (upd.ndim - 1)),
                old, upd),
            st, new)
        return new, self._obs(new), reward, new.done
