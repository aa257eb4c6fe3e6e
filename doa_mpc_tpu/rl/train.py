"""DDPG subgoal training loop.

A working realization of ``/root/reference/src/train.py`` (whose own
imports are missing from the repo — SURVEY.md C12): the same
reset -> act -> env.step -> buffer -> update structure (train.py:10-20) and
the same argparse surface (train.py:32-55), but batched — every env step
advances B scenarios through k MPC ticks on device, and updates are jitted.
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

from doa_mpc_tpu.config import SolverOptions, WorldSpec
from doa_mpc_tpu.rl.ddpg import DDPG, DDPGConfig, ReplayBuffer, Transition
from doa_mpc_tpu.rl.env import SubgoalEnv


def train(env: SubgoalEnv, agent: DDPG, num_episodes: int,
          seed: int = 0, updates_per_step: int = 1, warmup_steps: int = 5,
          verbose: bool = True):
    """The train.py:10-20 loop, batched over env.batch scenarios."""
    key = jax.random.PRNGKey(seed)
    key, k0 = jax.random.split(key)
    state = agent.init(k0)
    buf = ReplayBuffer.create(agent.cfg)
    update = jax.jit(agent.update)
    act = jax.jit(lambda s, o, k: agent.act(s, o, k, noise=True))
    step_env = jax.jit(env.step)

    history = []
    total_steps = 0
    for ep in range(num_episodes):
        key, kreset = jax.random.split(key)
        est, obs = jax.jit(env.reset)(kreset)
        ep_reward = jnp.zeros((env.batch,))
        for t in range(env.max_steps):
            key, ka, ks = jax.random.split(key, 3)
            if total_steps < warmup_steps:
                actions = jax.random.uniform(
                    ka, (env.batch, env.act_dim),
                    minval=-agent.cfg.act_limit, maxval=agent.cfg.act_limit)
            else:
                actions = act(state, obs, ka)
            new_est, new_obs, reward, done = step_env(est, actions)
            buf = buf.add_batch(Transition(
                obs=obs, act=actions, rew=reward, next_obs=new_obs,
                done=done.astype(jnp.float32)))
            ep_reward = ep_reward + reward
            est, obs = new_est, new_obs
            total_steps += 1
            if total_steps >= warmup_steps:
                for _ in range(updates_per_step):
                    key, kb = jax.random.split(key)
                    batch = buf.sample(kb, agent.cfg.batch_size)
                    state, info = update(state, batch)
            if bool(jnp.all(done)):
                break
        mean_r = float(jnp.mean(ep_reward))
        reached = float(jnp.mean(est.prev_dist <= env.spec.tol))
        history.append({"episode": ep, "reward": mean_r, "reached": reached})
        if verbose:
            print(f"episode {ep}: mean_reward={mean_r:.2f} "
                  f"reached={reached:.2%}")  # train.py:20's episode print
    return state, history


def main(argv=None):
    """Argparse surface mirroring train.py:32-55."""
    p = argparse.ArgumentParser()
    p.add_argument("--env", default="SubgoalEnv")
    p.add_argument("--render", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--timesteps", type=int, default=40)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--n_obst", type=int, default=5)
    p.add_argument("--gamma", type=float, default=0.99)
    p.add_argument("--tau", type=float, default=0.01)
    p.add_argument("--noise_stddev", type=float, default=0.1)
    p.add_argument("--hidden_size", nargs=2, type=int, default=[128, 128])
    p.add_argument("--episodes", type=int, default=10)
    p.add_argument("--k_ticks", type=int, default=10)
    args = p.parse_args(argv)

    spec = WorldSpec(tf=2.0, n_solv=20, n_obst=args.n_obst, qp_iter=10)
    opts = SolverOptions(qp_iter=10, integrator="rk4")
    env = SubgoalEnv(spec=spec, opts=opts, batch=args.batch,
                     k_ticks=args.k_ticks, max_steps=args.timesteps)
    cfg = DDPGConfig(obs_dim=env.obs_dim, act_dim=env.act_dim,
                     hidden=tuple(args.hidden_size), gamma=args.gamma,
                     tau=args.tau, noise_std=args.noise_stddev)
    agent = DDPG(cfg)
    t0 = time.time()
    _, history = train(env, agent, args.episodes, seed=args.seed)
    print(f"trained {args.episodes} episodes in {time.time() - t0:.1f}s")
    return history


if __name__ == "__main__":
    main()
