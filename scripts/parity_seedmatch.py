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
    ap.add_argument("--status4", action="store_true",
                    help="ARM the status-4 reset analogue (off by default "
                         "since round 5): its 'not converged to (fail_mu, "
                         "fail_stat)' criterion fires 9-49x/run at the "
                         "bundled budgets — far beyond anything HPIPM did "
                         "— and the resulting mid-traffic plant braking "
                         "was the whole round-3/4 collision excess "
                         "(results/parity_r5/forensics.md)")
    ap.add_argument("--no-status4", action="store_true",
                    help="deprecated (the default since round 5); kept so "
                         "recorded round-4/5 command lines still run")
    ap.add_argument("--slack-mult", type=float, default=None,
                    help="multiply the slack penalty scale (diagnostic for "
                         "the acados slack-cost convention: x2 tests "
                         "whether HPIPM's effective quadratic term is "
                         "twice ours)")
    ap.add_argument("--slack-unscaled", action="store_true",
                    help="do NOT dt-scale the slack penalties zl/Zl "
                         "(slack_scale_dt=False): tests the convention "
                         "where acados cost_scaling excludes the slack "
                         "terms — 10x stronger avoidance at TF=2/N=20 "
                         "(VERDICT r4 item 1c)")
    ap.add_argument("--cost-unscaled", action="store_true",
                    help="no dt scaling of the stage cost at all "
                         "(cost_scale_dt=False): the convention where the "
                         "reference's acados never scaled by time steps")
    ap.add_argument("--lm-raw", action="store_true",
                    help="add Levenberg-Marquardt raw (lm_scale_dt=False) "
                         "on top of the scaled Hessian — acados' "
                         "add-after-cost-module placement")
    ap.add_argument("--seeds", type=int, default=None,
                    help="use only the first K of the cell's 100 seeds "
                         "(bounds the f64 CPU leg's runtime)")
    ap.add_argument("--fix-pred-bug", action="store_true",
                    help="run with the reference's obstacle-prediction "
                         "vx=vy typo (visualization.py:69) FIXED — the "
                         "framework default — on the reference's identical "
                         "worlds, quantifying how much of its published "
                         "collision rate is that bug")
    args = ap.parse_args()

    import os as _os
    if args.f64:
        # f64 must run on CPU: the axon TPU has no f64 hardware and an f64
        # program CRASHES the shared tunnel worker. The baked sitecustomize
        # force-registers the axon platform (overriding JAX_PLATFORMS from
        # the caller's env), so force the platform via jax.config like
        # tests/conftest.py does.
        _os.environ["JAX_PLATFORMS"] = "cpu"

    import jax
    if args.f64:
        jax.config.update("jax_platforms", "cpu")
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
        if args.seeds:
            ref = ref[:args.seeds]
        n_runs = ref.shape[0]
        spec = WorldSpec(tf=c["tf"], n_solv=c["n_solv"], n_obst=c["n_obst"],
                         qp_iter=c["qp_iter"])
        opts = SolverOptions(
            qp_iter=args.qp_iter_override or c["qp_iter"],
            integrator=args.integrator,
            compat_pred_bug=not args.fix_pred_bug,
            cost_scale_dt=not args.cost_unscaled,
            slack_scale_dt=not args.slack_unscaled,
            lm_scale_dt=not (args.lm_raw or args.cost_unscaled),
            init_guess_when_error=args.status4,
            compat_brake_bug=args.status4,
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
        # column 6 (beyond the reference's 6-column schema): status-4
        # analogue firings per seed — VERDICT r4 weak #2 asked for the
        # firing rate to be ON the record
        data = np.stack([
            np.asarray(m.hit, np.float64),
            np.asarray(m.reached, np.float64),
            np.asarray(m.min_margin, np.float64),
            np.asarray(m.dist, np.float64),
            np.asarray(m.steps, np.float64),
            np.asarray(m.oob, np.float64),
            np.asarray(fin.resets, np.float64)], axis=1)
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
        hit_we = int(((data[:, 0] == 1) & (ref[:, 0] == 0)).sum())
        hit_ref = int(((data[:, 0] == 0) & (ref[:, 0] == 1)).sum())
        # McNemar z on the hit discordants: |b-c|/sqrt(b+c); within 2 sigma
        # == the judge's "hit-gap within 2 sigma" acceptance criterion
        hit_z = (abs(hit_we - hit_ref) / np.sqrt(hit_we + hit_ref)
                 if (hit_we + hit_ref) else 0.0)
        # paired quality stats on co-reached seeds (the faster-AND-safer
        # forensics of VERDICT r4 weak #1)
        both = (data[:, 1] == 1) & (ref[:, 1] == 1)
        steps_ours = float(data[both, 4].mean()) if both.any() else None
        steps_ref = float(ref[both, 4].mean()) if both.any() else None
        marg_ours = float(data[both, 2].mean()) if both.any() else None
        marg_ref = float(ref[both, 2].mean()) if both.any() else None
        row = dict(c, hit=float(hit), reached=float(reached),
                   oob=float(oob),
                   reached_gap=float(reached - c["ref_reached"]),
                   hit_gap=float(hit - c["ref_hit"]),
                   agree_reached=agree_r, agree_hit=agree_h,
                   reached_we_only=disc_we, reached_ref_only=disc_ref,
                   hit_we_only=hit_we, hit_ref_only=hit_ref,
                   hit_mcnemar_z=float(hit_z),
                   coreached_steps_ours=steps_ours,
                   coreached_steps_ref=steps_ref,
                   coreached_margin_ours=marg_ours,
                   coreached_margin_ref=marg_ref,
                   resets_mean=float(data[:, 6].mean()),
                   resets_max=int(data[:, 6].max()),
                   runs=n_runs, seedmatched=True)
        rows.append(row)
        print(f"{c['stamp']} {c['scenario']:6s} TF={c['tf']} "
              f"qp={c['qp_iter']:3d}{' interp' if c['interpolate'] else ''}"
              f" | ours hit/reach {hit:.1%}/{reached:.1%}"
              f" | ref {c['ref_hit']:.1%}/{c['ref_reached']:.1%}"
              f" | hit discord +{hit_we}/-{hit_ref} z={hit_z:.1f}"
              f" | steps {steps_ours and round(steps_ours, 1)}"
              f" vs {steps_ref and round(steps_ref, 1)}"
              f" | marg {marg_ours and round(marg_ours, 2)}"
              f" vs {marg_ref and round(marg_ref, 2)}"
              f" | resets mean {data[:, 6].mean():.1f}", flush=True)

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
            "fail_stat_tol": args.fail_stat,
            "status4": args.status4,
            "slack_scale_dt": not args.slack_unscaled,
            "cost_scale_dt": not args.cost_unscaled,
            "lm_scale_dt": not (args.lm_raw or args.cost_unscaled),
            "slack_mult": args.slack_mult, "f64": bool(args.f64),
            "seeds": args.seeds, "cells": rows}
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
