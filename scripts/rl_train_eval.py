"""Train the DDPG subgoal policy and evaluate it against the fixed-goal
controller on matched seeds — the round-4 "RL learns something" artifact.

The reference's RL layer never ran (its imports don't exist in the repo,
/root/reference/src/train.py:3-7); its design intent — the agent proposes
(x, y) subgoals, the MPC executes them (set_subgoal,
robot_ocp_problem.py:279-284) — is realized by rl/env.py. This driver:

1. trains for a real budget (rl/train.py loop) and records the learning
   curve,
2. evaluates the greedy policy vs the "subgoal = final goal" baseline
   (identical env mechanics, identical reset seeds — the baseline IS the
   plain fixed-goal controller expressed as a constant policy),
3. persists results/rl_r4/{history.json,eval.json,summary.md}.

Usage: python scripts/rl_train_eval.py [--episodes 40] [--batch 128]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from doa_mpc_tpu.config import SolverOptions, WorldSpec
from doa_mpc_tpu.rl.ddpg import DDPG, DDPGConfig
from doa_mpc_tpu.rl.env import SubgoalEnv
from doa_mpc_tpu.rl.train import train


def evaluate(env: SubgoalEnv, policy, key, episodes: int = 3):
    """Greedy closed-loop evaluation; returns per-episode aggregates plus
    the per-scenario outcome vectors (for matched-seed pairing)."""
    rows = []
    per_row = {"reached": [], "hit": []}
    for ep in range(episodes):
        key, kreset = jax.random.split(key)
        st, obs = jax.jit(env.reset)(kreset)
        step_env = jax.jit(env.step)
        for _ in range(env.max_steps):
            actions = policy(obs)
            st, obs, _, done = step_env(st, actions)
            if bool(jnp.all(done)):
                break
        hit = np.asarray(st.loop.min_margin <= 0.0)
        reached = np.asarray(st.prev_dist <= env.spec.tol)
        per_row["reached"].append(reached)
        per_row["hit"].append(hit)
        rows.append({
            "reached": float(reached.mean()),
            "hit": float(hit.mean()),
            "mean_final_dist": float(np.asarray(st.prev_dist).mean()),
            "mean_env_steps": float(np.asarray(st.t).mean()),
        })
    agg = {k: float(np.mean([r[k] for r in rows])) for k in rows[0]}
    agg["episodes"] = episodes
    agg["batch"] = env.batch
    vecs = {k: np.concatenate(v) for k, v in per_row.items()}
    return agg, rows, vecs


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--episodes", type=int, default=40)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--k-ticks", type=int, default=10)
    ap.add_argument("--max-steps", type=int, default=40)
    ap.add_argument("--qp-iter", type=int, default=10)
    ap.add_argument("--eval-episodes", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="results/rl_r4")
    ap.add_argument("--scenario", default="RANDOM",
                    choices=["RANDOM", "CENTER", "EDGE"],
                    help="world scenario for train AND eval. EDGE piles "
                         "every obstacle on the goal corner — the regime "
                         "where the fixed-goal baseline struggles "
                         "(VERDICT r4 item 6)")
    ap.add_argument("--n-obst", type=int, default=5)
    args = ap.parse_args(argv)

    os.makedirs(args.out, exist_ok=True)
    spec = WorldSpec(tf=2.0, n_solv=20, n_obst=args.n_obst,
                     qp_iter=args.qp_iter)
    opts = SolverOptions(qp_iter=args.qp_iter, integrator="rk4")
    env = SubgoalEnv(spec=spec, opts=opts, batch=args.batch,
                     k_ticks=args.k_ticks, max_steps=args.max_steps,
                     scenario=args.scenario)
    # act_limit 7.2 (not the 6.0 default): the final goal sits at (7, 7),
    # and a tanh-limited policy must be ABLE to propose it — otherwise the
    # terminal reward is unreachable by construction and the comparison
    # with the fixed-goal baseline is rigged against the policy.
    cfg = DDPGConfig(obs_dim=env.obs_dim, act_dim=env.act_dim,
                     act_limit=7.2)
    agent = DDPG(cfg)

    t0 = time.time()
    state, history = train(env, agent, args.episodes, seed=args.seed)
    train_s = time.time() - t0
    print(f"trained {args.episodes} episodes x {args.batch} scenarios "
          f"in {train_s:.0f}s", flush=True)
    with open(os.path.join(args.out, "history.json"), "w") as f:
        json.dump({"episodes": history, "train_seconds": train_s,
                   "batch": args.batch, "k_ticks": args.k_ticks,
                   "max_steps": args.max_steps,
                   "qp_iter": args.qp_iter}, f, indent=1)

    # --- matched-seed evaluation ---------------------------------------
    key = jax.random.PRNGKey(args.seed + 1000)
    greedy = jax.jit(lambda o: agent.act(state, o, jax.random.PRNGKey(0),
                                         noise=False))
    goal_actions = None

    def baseline(obs):
        # "subgoal = final goal" == the plain fixed-goal controller
        nonlocal goal_actions
        if goal_actions is None:
            from doa_mpc_tpu.sim.obstacles import robot_start_goal
            _, goal = robot_start_goal(spec)
            goal_actions = jnp.broadcast_to(
                jnp.asarray(goal, jnp.float32), (args.batch, 2))
        return goal_actions

    pol_agg, pol_rows, pol_vec = evaluate(env, lambda o: greedy(o), key,
                                          episodes=args.eval_episodes)
    base_agg, base_rows, base_vec = evaluate(env, baseline, key,
                                             episodes=args.eval_episodes)

    def paired(name, pol, base, better_when_true):
        """Matched-seed McNemar stats: the reset key sequence is identical
        for both arms, so row i of episode e is the SAME world."""
        pol = pol.astype(bool)
        base = base.astype(bool)
        b = int((pol & ~base).sum())     # policy-only successes/failures
        c = int((~pol & base).sum())
        z = abs(b - c) / np.sqrt(b + c) if (b + c) else 0.0
        n = len(pol)
        delta = (pol.mean() - base.mean())
        # binomial (Wald) CI on the paired delta: var = (b + c - (b-c)^2/n)/n^2
        se = np.sqrt(max(b + c - (b - c) ** 2 / n, 0.0)) / n
        return {"metric": name, "n": n,
                "policy_rate": float(pol.mean()),
                "baseline_rate": float(base.mean()),
                "delta": float(delta),
                "delta_ci95": [float(delta - 1.96 * se),
                               float(delta + 1.96 * se)],
                "discordant_policy_only": b, "discordant_baseline_only": c,
                "mcnemar_z": float(z),
                "significant_2sigma": bool(z > 2.0),
                "policy_better": bool((delta > 0) == better_when_true)}

    pairs = [paired("reached", pol_vec["reached"], base_vec["reached"], True),
             paired("hit", pol_vec["hit"], base_vec["hit"], False)]
    result = {"scenario": args.scenario, "n_obst": args.n_obst,
              "policy": pol_agg, "baseline_fixed_goal": base_agg,
              "paired_stats": pairs,
              "policy_episodes": pol_rows, "baseline_episodes": base_rows,
              "note": "identical reset key sequence for both arms"}
    with open(os.path.join(args.out, "eval.json"), "w") as f:
        json.dump(result, f, indent=1)

    first = np.mean([h["reward"] for h in history[:5]])
    last = np.mean([h["reward"] for h in history[-5:]])
    with open(os.path.join(args.out, "summary.md"), "w") as f:
        f.write("# DDPG subgoal policy: training + matched-seed eval\n\n")
        f.write(f"{args.episodes} episodes x {args.batch} scenarios, "
                f"k_ticks={args.k_ticks}, max_steps={args.max_steps}, "
                f"qp_iter={args.qp_iter} ({train_s:.0f}s on device)\n\n")
        f.write(f"Learning curve: mean reward first-5 episodes "
                f"{first:.1f} -> last-5 {last:.1f}\n\n")
        f.write("| arm | reached | hit | mean final dist | env steps |\n")
        f.write("|---|---|---|---|---|\n")
        for name, a in (("subgoal policy", pol_agg),
                        ("fixed-goal baseline", base_agg)):
            f.write(f"| {name} | {a['reached']:.1%} | {a['hit']:.1%} | "
                    f"{a['mean_final_dist']:.2f} | "
                    f"{a['mean_env_steps']:.1f} |\n")
    print("policy   :", pol_agg, flush=True)
    print("baseline :", base_agg, flush=True)
    print(f"learning curve: first5 {first:.1f} -> last5 {last:.1f}",
          flush=True)


if __name__ == "__main__":
    main()
