"""CLI smoke tests (the reference's main.py / demo.py / robot_sim.py entry
points, exercised end-to-end at tiny sizes)."""

import json
import os

import numpy as np

from doa_mpc_tpu.cli import main


def test_experiment_command(tmp_path):
    out = str(tmp_path / "exp")
    main(["experiment", "--tf", "0.5", "--n-solv", "5", "--n-obst", "3",
          "--qp-iter", "6", "--runs", "4", "--max-iter", "10",
          "--out", out, "--scenarios", "RANDOM", "--f64"])
    files = os.listdir(out)
    assert any(f.endswith("_data.csv") for f in files)
    assert any(f.endswith("_spec.json") for f in files)


def test_evaluate_command(tmp_path, capsys):
    out = str(tmp_path / "exp")
    main(["experiment", "--tf", "0.5", "--n-solv", "5", "--n-obst", "3",
          "--qp-iter", "6", "--runs", "4", "--max-iter", "10",
          "--out", out, "--scenarios", "RANDOM", "EDGE", "--f64"])
    main(["evaluate", "--data", out, "--out", str(tmp_path)])
    captured = capsys.readouterr().out
    assert "RANDOM" in captured
    assert os.path.exists(str(tmp_path / "plot_collision_rate_seperate.svg"))


def test_sim_command(capsys):
    main(["sim", "--steps", "5"])
    out = capsys.readouterr().out
    assert "[" in out  # printed trajectory (robot_sim.py:57 analogue)


def test_demo_command(tmp_path):
    gif = str(tmp_path / "demo.gif")
    main(["demo", "--tf", "0.5", "--n-solv", "5", "--n-obst", "3",
          "--qp-iter", "6", "--seed", "1", "--max-iter", "15",
          "--gif", gif, "--f64"])
    assert os.path.exists(gif)
