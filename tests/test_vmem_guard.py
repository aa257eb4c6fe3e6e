"""TPU-gated guard for the fused kernel's VMEM estimator.

VERDICT r4 item 8: ``fused_vmem_bytes`` drives the sublane-batch
auto-selection; if a kernel edit drifts the estimate away from the real
scoped footprint, production either OOMs at compile or silently under-packs
sublanes. ``scripts/tpu_vmem_guard.py`` compiles the ACTUAL kernel at the
shipped (N, M, sb) corners with Mosaic's scoped-VMEM limit derived from the
estimate itself: compile must SUCCEED at estimate*1.15 (estimate not
materially under) and FAIL at estimate*0.70 (not wildly over). Follows the
tests/test_tpu_equiv.py clean-subprocess pattern; skips without a TPU.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GUARD = os.path.join(REPO, "scripts", "tpu_vmem_guard.py")


def _clean_env():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    return env


def _tpu_present():
    try:
        res = subprocess.run(
            [sys.executable, "-c",
             "import jax; d = jax.devices(); "
             "import sys; sys.exit(0 if d[0].platform != 'cpu' else 1)"],
            env=_clean_env(), timeout=120, capture_output=True)
        return res.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def test_vmem_estimate_brackets_reality():
    if not _tpu_present():
        pytest.skip("no healthy TPU reachable")
    res = subprocess.run(
        [sys.executable, GUARD], cwd=REPO, env=_clean_env(),
        timeout=560, capture_output=True, text=True)
    assert res.returncode == 0, f"vmem guard failed:\n{res.stdout[-2000:]}"
    verdict = json.loads(res.stdout.strip().splitlines()[-1])
    assert verdict["ok"], verdict
