"""
Opt-in hardware test: Pallas kernels vs the XLA path on a real chip.

The regular suite runs on the virtual CPU mesh (conftest.py), where the
Pallas kernels execute in interpret mode — their DMA pipelines
(double-buffered pack loads, strip write/carry rolls, the degrid
out-DMA ring) are never actually raced. Setting ``CIP_HW_TESTS=1``
runs ``scripts/hw_accuracy_probe.py`` in a subprocess on whatever
accelerator jax exposes there (takes ~1-2 min including compiles;
requires a TPU-visible environment, hence opt-in).

Mirrors the reference's split between fast unit tests and its
cluster-exercising integration test
(reference: tests/test_dask_invert_measurement_set.py:1-34).
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent


@pytest.mark.skipif(
    os.environ.get("CIP_HW_TESTS") != "1",
    reason="hardware test; set CIP_HW_TESTS=1 with a TPU attached",
)
def test_pallas_matches_xla_on_hardware():
    env = dict(os.environ)
    # Deliberately do NOT force the CPU backend here.
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in (str(REPO_ROOT), env.get("PYTHONPATH")) if p
    )
    result = subprocess.run(
        [sys.executable, str(REPO_ROOT / "scripts" / "hw_accuracy_probe.py")],
        capture_output=True,
        text=True,
        timeout=1200,
        env=env,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    report = json.loads(result.stdout.strip().splitlines()[-1])
    assert report["ok"], report
    assert report["predict_max_rel"] < 1e-4
    assert report["invert_max_rel"] < 1e-4
