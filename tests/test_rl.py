"""RL subsystem tests: DDPG mechanics + the MPC subgoal environment."""

import numpy as np
import jax
import jax.numpy as jnp

from doa_mpc_tpu.config import SolverOptions, WorldSpec
from doa_mpc_tpu.rl.ddpg import DDPG, DDPGConfig, ReplayBuffer, Transition
from doa_mpc_tpu.rl.env import SubgoalEnv


def _cfg():
    return DDPGConfig(obs_dim=12, act_dim=2, hidden=(32, 32),
                      buffer_size=512, batch_size=32)


def test_actor_within_limits():
    cfg = _cfg()
    agent = DDPG(cfg)
    st = agent.init(jax.random.PRNGKey(0))
    obs = jax.random.normal(jax.random.PRNGKey(1), (16, cfg.obs_dim))
    a = agent.act(st, obs)
    assert a.shape == (16, cfg.act_dim)
    assert float(jnp.max(jnp.abs(a))) <= cfg.act_limit + 1e-6
    a_n = agent.act(st, obs, jax.random.PRNGKey(2), noise=True)
    assert float(jnp.max(jnp.abs(a_n))) <= cfg.act_limit + 1e-6
    assert not np.allclose(np.asarray(a), np.asarray(a_n))


def test_replay_buffer_ring():
    cfg = _cfg()
    buf = ReplayBuffer.create(cfg)
    B = 100
    tr = Transition(
        obs=jnp.ones((B, cfg.obs_dim)), act=jnp.ones((B, cfg.act_dim)),
        rew=jnp.arange(B, dtype=jnp.float32),
        next_obs=jnp.ones((B, cfg.obs_dim)), done=jnp.zeros((B,)))
    for i in range(6):
        buf = buf.add_batch(tr)
    assert int(buf.size) == 512
    assert int(buf.ptr) == 600 % 512
    batch = buf.sample(jax.random.PRNGKey(0), 32)
    assert batch.obs.shape == (32, cfg.obs_dim)


def test_update_reduces_critic_loss():
    cfg = _cfg()
    agent = DDPG(cfg)
    st = agent.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(3)
    batch = Transition(
        obs=jax.random.normal(key, (64, cfg.obs_dim)),
        act=jax.random.normal(key, (64, cfg.act_dim)),
        rew=jax.random.normal(key, (64,)),
        next_obs=jax.random.normal(key, (64, cfg.obs_dim)),
        done=jnp.zeros((64,)))
    update = jax.jit(agent.update)
    losses = []
    for _ in range(30):
        st, info = update(st, batch)
        losses.append(float(info["critic_loss"]))
    assert losses[-1] < losses[0]


def test_env_step_shapes_and_rewards():
    spec = WorldSpec(tf=0.5, n_solv=5, n_obst=3, qp_iter=6)
    opts = SolverOptions(qp_iter=6, integrator="rk4")
    env = SubgoalEnv(spec=spec, opts=opts, batch=4, k_ticks=3, max_steps=5,
                     dtype=jnp.float64)
    st, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (4, env.obs_dim)
    assert env.obs_dim == 3 * (spec.n_obst + 1)
    # aim straight at the final goal
    actions = jnp.broadcast_to(jnp.asarray([6.0, 6.0]), (4, 2))
    step = jax.jit(env.step)
    st2, obs2, r, done = step(st, actions)
    assert obs2.shape == obs.shape and r.shape == (4,) and done.shape == (4,)
    # moving toward the goal must earn positive progress reward (minus the
    # 0.5 step cost) for at least some rows
    assert float(jnp.max(r)) > -0.5
    # robot actually moved
    assert float(jnp.max(jnp.abs(st2.loop.x0[:, :2] - st.loop.x0[:, :2]))) > 0.05


def test_env_episode_terminates():
    spec = WorldSpec(tf=0.5, n_solv=5, n_obst=3, qp_iter=6)
    opts = SolverOptions(qp_iter=6, integrator="rk4")
    env = SubgoalEnv(spec=spec, opts=opts, batch=2, k_ticks=2, max_steps=3,
                     dtype=jnp.float64)
    st, obs = env.reset(jax.random.PRNGKey(1))
    step = jax.jit(env.step)
    actions = jnp.zeros((2, 2))
    for _ in range(3):
        st, obs, r, done = step(st, actions)
    assert bool(jnp.all(done))  # max_steps reached
    # frozen rows: another step changes nothing and pays zero reward
    st2, _, r2, _ = step(st, actions)
    np.testing.assert_allclose(np.asarray(r2), 0.0)
    np.testing.assert_allclose(np.asarray(st2.loop.x0), np.asarray(st.loop.x0))
