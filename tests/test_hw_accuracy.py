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


def _hw_env() -> dict:
    env = dict(os.environ)
    # Deliberately do NOT force the CPU backend here.
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in (str(REPO_ROOT), env.get("PYTHONPATH")) if p
    )
    return env


@pytest.mark.skipif(
    os.environ.get("CIP_HW_TESTS") != "1",
    reason="hardware test; set CIP_HW_TESTS=1 with a TPU attached",
)
def test_pallas_matches_xla_on_hardware():
    result = subprocess.run(
        [sys.executable, str(REPO_ROOT / "scripts" / "hw_accuracy_probe.py")],
        capture_output=True,
        text=True,
        timeout=1200,
        env=_hw_env(),
    )
    assert result.returncode == 0, result.stderr[-2000:]
    report = json.loads(result.stdout.strip().splitlines()[-1])
    assert report["ok"], report
    assert report["predict_max_rel"] < 1e-4
    assert report["invert_max_rel"] < 1e-4


@pytest.mark.skipif(
    os.environ.get("CIP_HW_TESTS") != "1",
    reason="hardware test; set CIP_HW_TESTS=1 with a TPU attached",
)
def test_compiled_pallas_inside_shard_map_on_hardware():
    """
    The production composition — shard_map(pallas_call) + psum —
    COMPILED on a real chip, vs the plain single-device invert at the
    reference's sharded-vs-local tolerance (1e-5, reference:
    tests/test_dask_invert_measurement_set.py:31-34). The CPU suite
    only proves this composition in interpret mode.
    """
    result = subprocess.run(
        [sys.executable, str(REPO_ROOT / "scripts" / "hw_shardmap_probe.py")],
        capture_output=True,
        text=True,
        timeout=1800,
        env=_hw_env(),
    )
    assert result.returncode == 0, result.stderr[-2000:]
    report = json.loads(result.stdout.strip().splitlines()[-1])
    assert report["ok"], report
    assert report["max_rel"] < 1e-5
