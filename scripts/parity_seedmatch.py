"""Seed-matched parity vs the reference's bundled baselines.

Unlike scripts/parity_matrix.py (same configs, DIFFERENT random worlds),
this driver replays each bundled cell with the reference's EXACT MT19937
streams (sim/compat_rng.py): seed-for-seed identical obstacle placements,
velocities, and per-tick velocity noise (np.random.seed(i) draw order,
/root/reference/src/simulation/experiments.py:33). The remaining difference
between our per-seed outcomes and the bundled CSV rows is then solver
behavior alone — the controlled experiment VERDICT r3 asked for (the
noise-stream confound is gone).

Per cell writes ``<stamp>_<scenario>_ours.csv`` (reference schema, row i =
seed i) and appends to summary.json/summary.md: aggregate rates, gaps,
and per-seed agreement (fraction of seeds with the same reached/hit
outcome as the reference run).

Usage (TPU, one cell at a time to stay under the tunnel's budget):
    python scripts/parity_seedmatch.py --only 215846 --backend fused
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from parity_matrix import load_reference_cells  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-iter", type=int, default=400)
    ap.add_argument("--backend", default="fused",
                    choices=["xla", "pallas", "fused"])
    ap.add_argument("--integrator", default="irk", choices=["irk", "rk4"])
    ap.add_argument("--fail-mu", type=float, default=1e-7)
    ap.add_argument("--fail-stat", type=float, default=1e-4)
    ap.add_argument("--out", default="results/parity_r4_seedmatch")
    ap.add_argument("--only", default=None)
    ap.add_argument("--f64", action="store_true",
                    help="run the controller in float64 (xla backend) — "
                         "isolates f32 accuracy from algorithmic gaps "
                         "(CPU only: the TPU has no f64 hardware)")
    ap.add_argument("--qp-iter-override", type=int, default=None,
                    help="run the cell with this IP iteration budget "
                         "instead of the bundled QP_ITER (accuracy probe)")
    ap.add_argument("--no-status4", action="store_true",
                    help="disable the status-4 reset analogue. REQUIRED "
                         "when overriding qp_iter far below the bundled "
                         "cell's budget: the analogue's fail criterion is "
                         "'not converged to (fail_mu, fail_stat)', which "
                         "at qp_iter=6 fires every tick (constant warm-"
                         "start resets + compat plant braking) and is NOT "
                         "what the reference's QP_ITER=50+ HPIPM did")
    ap.add_argument("--slack-mult", type=float, default=None,
                    help="multiply the slack penalty scale (diagnostic for "
                         "the acados slack-cost convention: x2 tests "
                         "whether HPIPM's effective quadratic term is "
                         "twice ours)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from doa_mpc_tpu.config import SolverOptions, WorldSpec, default_cost_params
    from doa_mpc_tpu.sim.closed_loop import (
        init_loop_state, make_batched_rollout, metrics_of)
    from doa_mpc_tpu.sim.compat_rng import mt_experiment_batch
    from doa_mpc_tpu.sim.obstacles import robot_start_goal
    from doa_mpc_tpu.solver.sqp_rti import make_rti_controller

    os.makedirs(args.out, exist_ok=True)
    cells = load_reference_cells()
    if args.only:
        cells = [c for c in cells
                 if args.only in c["stamp"] or args.only in c["scenario"]]

    rows = []
    for c in cells:
        ref = np.loadtxt(os.path.join(
            "/root/reference/src/simulation/test_data",
            f"{c['stamp']}_experiment_data.csv"), delimiter=";")
        n_runs = ref.shape[0]
        spec = WorldSpec(tf=c["tf"], n_solv=c["n_solv"], n_obst=c["n_obst"],
                         qp_iter=c["qp_iter"])
        opts = SolverOptions(
            qp_iter=args.qp_iter_override or c["qp_iter"],
            integrator=args.integrator,
            compat_pred_bug=True,
            init_guess_when_error=not args.no_status4,
            compat_brake_bug=not args.no_status4,
            fail_mu_tol=args.fail_mu, fail_stat_tol=args.fail_stat,
            init_guess="interpolate" if c["interpolate"] else "current")
        dtype = jnp.float64 if args.f64 else jnp.float32
        if args.f64:
            jax.config.update("jax_enable_x64", True)
        ctrl = make_rti_controller(spec, opts, dtype=dtype)
        params = default_cost_params(spec, dtype=dtype)
        if args.slack_mult:
            import dataclasses
            params = dataclasses.replace(
                params, slack_scale=params.slack_scale * args.slack_mult)
        start, goal = robot_start_goal(spec)

        obst, noise = mt_experiment_batch(
            range(n_runs), spec, c["scenario"], max_iter=args.max_iter,
            dtype=np.float64 if args.f64 else np.float32)
        st0 = init_loop_state(jax.random.PRNGKey(0), ctrl,
                              jnp.asarray(start, dtype), goal,
                              batch_shape=(n_runs,), obst=obst)
        roll = jax.jit(make_batched_rollout(
            ctrl, goal, params, max_iter=args.max_iter,
            backend=args.backend, use_noise_traj=True))
        fin = roll(st0, jnp.asarray(noise))
        m = jax.vmap(metrics_of)(fin)
        data = np.stack([
            np.asarray(m.hit, np.float64),
            np.asarray(m.reached, np.float64),
            np.asarray(m.min_margin, np.float64),
            np.asarray(m.dist, np.float64),
            np.asarray(m.steps, np.float64),
            np.asarray(m.oob, np.float64)], axis=1)
        np.savetxt(os.path.join(
            args.out, f"{c['stamp']}_{c['scenario']}_ours.csv"),
            data, delimiter=";")

        hit, reached, oob = (data[:, 0].mean(), data[:, 1].mean(),
                             data[:, 5].mean())
        agree_r = float((data[:, 1] == ref[:, 1]).mean())
        agree_h = float((data[:, 0] == ref[:, 0]).mean())
        # same worlds -> the gap's only sampling noise is per-seed solver
        # disagreement; report McNemar-style discordant counts
        disc_we = int(((data[:, 1] == 1) & (ref[:, 1] == 0)).sum())
        disc_ref = int(((data[:, 1] == 0) & (ref[:, 1] == 1)).sum())
        row = dict(c, hit=float(hit), reached=float(reached),
                   oob=float(oob),
                   reached_gap=float(reached - c["ref_reached"]),
                   hit_gap=float(hit - c["ref_hit"]),
                   agree_reached=agree_r, agree_hit=agree_h,
                   reached_we_only=disc_we, reached_ref_only=disc_ref,
                   runs=n_runs, seedmatched=True)
        rows.append(row)
        print(f"{c['stamp']} {c['scenario']:6s} TF={c['tf']} "
              f"qp={c['qp_iter']:3d}{' interp' if c['interpolate'] else ''}"
              f" | ours hit/reach {hit:.1%}/{reached:.1%}"
              f" | ref {c['ref_hit']:.1%}/{c['ref_reached']:.1%}"
              f" | agree reached {agree_r:.0%} hit {agree_h:.0%}"
              f" | discordant +{disc_we}/-{disc_ref}", flush=True)

    spath = os.path.join(args.out, "summary.json")
    merged = {}
    if os.path.exists(spath):
        with open(spath) as f:
            for r in json.load(f).get("cells", []):
                merged[(r["stamp"], r["scenario"])] = r
    for r in rows:
        merged[(r["stamp"], r["scenario"])] = r
    rows = sorted(merged.values(), key=lambda r: (r["stamp"], r["scenario"]))
    meta = {"backend": args.backend, "integrator": args.integrator,
            "seedmatched": True, "fail_mu_tol": args.fail_mu,
            "fail_stat_tol": args.fail_stat, "cells": rows}
    with open(spath, "w") as f:
        json.dump(meta, f, indent=1)
    with open(os.path.join(args.out, "summary.md"), "w") as f:
        f.write("# Seed-matched parity (exact MT19937 worlds + noise)\n\n")
        f.write(f"backend={args.backend}, integrator={args.integrator}; "
                "row i of each cell uses the reference's np.random.seed(i) "
                "streams verbatim.\n\n")
        f.write("| cell | scenario | TF | qp | init | ours hit | ref hit | "
                "ours reached | ref reached | agree reached | agree hit | "
                "discordant (+ours/-ref) |\n"
                "|---|---|---|---|---|---|---|---|---|---|---|---|\n")
        for r in rows:
            f.write(f"| {r['stamp']} | {r['scenario']} | {r['tf']} | "
                    f"{r['qp_iter']} | "
                    f"{'interp' if r['interpolate'] else 'current'} | "
                    f"{r['hit']:.1%} | {r['ref_hit']:.1%} | "
                    f"{r['reached']:.1%} | {r['ref_reached']:.1%} | "
                    f"{r['agree_reached']:.0%} | {r['agree_hit']:.0%} | "
                    f"+{r['reached_we_only']}/-{r['reached_ref_only']} |\n")


if __name__ == "__main__":
    main()
