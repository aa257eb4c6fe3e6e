"""Obstacle world tests: bounce geometry, noise clamping, prediction.

The reference has no tests; these property-test the semantics of
``src/utils/visualization.py:20-79`` and ``src/utils/obstacle_generator.py``
against an independent numpy transliteration.
"""

import numpy as np
import jax
import jax.numpy as jnp

from doa_mpc_tpu.config import WorldSpec
from doa_mpc_tpu.sim.obstacles import (
    ObstacleState, bounce_step, generate_obstacles, obstacle_step,
    predict_trajectory,
)

SPEC = WorldSpec()


def _np_predict_step(x, vx, y, vy, dt, xmin, xmax, ymin, ymax):
    """Independent transliteration of visualization.py:25-60 (noise-free)."""
    if vx < 0:
        t_hit_x = (x - xmin) / abs(vx)
    elif vx > 0:
        t_hit_x = (xmax - x) / abs(vx)
    else:
        t_hit_x = np.inf
    if t_hit_x <= dt:
        x += vx * t_hit_x - vx * (dt - t_hit_x)
        vx = -vx
    else:
        x += vx * dt
    if vy < 0:
        t_hit_y = (y - ymin) / abs(vy)
    elif vy > 0:
        t_hit_y = (ymax - y) / abs(vy)
    else:
        t_hit_y = np.inf
    if t_hit_y <= dt:
        y += vy * t_hit_y - vy * (dt - t_hit_y)
        vy = -vy
    else:
        y += vy * dt
    return x, vx, y, vy


def test_bounce_matches_reference_transliteration():
    rng = np.random.default_rng(0)
    n = 256
    pos = rng.uniform(-7.9, 7.9, (n, 1, 2))
    vel = rng.uniform(-2, 2, (n, 1, 2))
    # include exact-zero velocities and wall-grazing cases
    vel[:8] = 0.0
    pos[8:16, 0, 0] = 7.999
    state = ObstacleState(jnp.asarray(pos), jnp.asarray(vel))
    out = bounce_step(state, SPEC)
    for i in range(n):
        x, vx, y, vy = _np_predict_step(
            pos[i, 0, 0], vel[i, 0, 0], pos[i, 0, 1], vel[i, 0, 1],
            SPEC.dt, SPEC.x_min, SPEC.x_max, SPEC.y_min, SPEC.y_max)
        np.testing.assert_allclose(np.asarray(out.pos[i, 0]), [x, y], atol=1e-12)
        np.testing.assert_allclose(np.asarray(out.vel[i, 0]), [vx, vy], atol=1e-12)


def test_bounce_stays_in_bounds_many_steps():
    key = jax.random.PRNGKey(1)
    state = generate_obstacles(key, SPEC, "RANDOM", batch_shape=(64,))
    for _ in range(200):
        state = bounce_step(state, SPEC)
    assert bool(jnp.all(jnp.abs(state.pos) <= 8.0 + 1e-9))


def test_noise_clamped_to_vmax():
    key = jax.random.PRNGKey(2)
    state = generate_obstacles(key, SPEC, "RANDOM", batch_shape=(32,))
    for i in range(50):
        key, sub = jax.random.split(key)
        state = obstacle_step(sub, state, SPEC, random_move=True)
    assert bool(jnp.all(jnp.abs(state.vel) <= SPEC.v_max_obst + 1e-9))
    assert bool(jnp.all(jnp.abs(state.pos) <= 8.0 + 1e-9))


def test_predict_trajectory_matches_rollout():
    # noise-free prediction must equal actually rolling bounce_step
    key = jax.random.PRNGKey(3)
    state = generate_obstacles(key, SPEC, "RANDOM", dtype=jnp.float64)
    traj = predict_trajectory(state, SPEC, 20)
    assert traj.shape == (21, SPEC.n_obst, 2)
    s = state
    np.testing.assert_allclose(np.asarray(traj[0]), np.asarray(state.pos))
    for i in range(20):
        s = bounce_step(s, SPEC)
        np.testing.assert_allclose(np.asarray(traj[i + 1]), np.asarray(s.pos), atol=1e-12)


def test_predict_compat_bug_uses_vy_for_vx():
    # with the compat flag, prediction treats vx as vy (visualization.py:69)
    pos = jnp.array([[0.0, 0.0]])
    vel = jnp.array([[1.5, -0.5]])
    state = ObstacleState(pos, vel)
    traj_bug = predict_trajectory(state, SPEC, 1, compat_pred_bug=True)
    np.testing.assert_allclose(
        np.asarray(traj_bug[1, 0]),
        [-0.5 * SPEC.dt, -0.5 * SPEC.dt], atol=1e-12)
    traj_fix = predict_trajectory(state, SPEC, 1)
    np.testing.assert_allclose(
        np.asarray(traj_fix[1, 0]), [1.5 * SPEC.dt, -0.5 * SPEC.dt], atol=1e-12)


def test_scenarios():
    key = jax.random.PRNGKey(4)
    r = generate_obstacles(key, SPEC, "RANDOM", (16,))
    lo, hi, _, _ = SPEC.obst_box
    assert bool(jnp.all((r.pos >= lo) & (r.pos <= hi)))
    c = generate_obstacles(key, SPEC, "CENTER")
    assert bool(jnp.all(c.pos == 0.0))
    e = generate_obstacles(key, SPEC, "EDGE")
    assert bool(jnp.all(e.pos == 7.0))
    for s in (r, c, e):
        assert bool(jnp.all(jnp.abs(s.vel) <= SPEC.v_max_obst))


def test_predict_closed_form_matches_scan_many_bounces():
    # the closed-form triangle-wave fold must track the explicit step
    # recursion through MANY wall reflections (n=400 at v~2 crosses the
    # 16-wide box multiple times), in production f32
    from doa_mpc_tpu.sim.obstacles import _predict_trajectory_scan

    key = jax.random.PRNGKey(9)
    state = generate_obstacles(key, SPEC, "RANDOM", batch_shape=(16,),
                               dtype=jnp.float32)
    fold = predict_trajectory(state, SPEC, 400)
    scan = _predict_trajectory_scan(state, SPEC, 400)
    np.testing.assert_allclose(np.asarray(fold), np.asarray(scan), atol=2e-4)
    assert bool(jnp.all(fold >= -8.0)) and bool(jnp.all(fold <= 8.0))
