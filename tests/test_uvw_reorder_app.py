"""
Reorder CLI end-to-end (reference: tests for the reorder app are via
run_program; see tests/test_pipeline_app.py pattern).
"""

import json

import pytest

from ska_sdp_cip_tpu.apps.uvw_reorder_app import (
    resolve_run_id,
    run_program,
)


def test_reorder_cli(dataset_path, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    outdir = tmp_path / "tiles"
    run_program(
        [
            str(dataset_path),
            "-t",
            "3000",
            "3000",
            "6000",
            "-o",
            str(outdir),
            "-n",
            "2",
            "-m",
            "10000",
            "-j",
            "2",
        ]
    )
    chunks = list(outdir.glob("tile_iu*chunk*.npz"))
    assert chunks
    tasks = json.loads((tmp_path / "task-list.json").read_text())
    assert tasks[0]["name"] == "reorder_by_uvw_tile"


def test_resolve_run_id(monkeypatch):
    """Multi-host runs never fall back to a colliding constant id."""
    monkeypatch.delenv("CIP_RUN_ID", raising=False)
    monkeypatch.delenv("SLURM_JOB_ID", raising=False)
    assert resolve_run_id("abc", 4) == "abc"
    assert resolve_run_id(None, 1) == "run"
    with pytest.raises(SystemExit, match="run-id"):
        resolve_run_id(None, 2)
    monkeypatch.setenv("SLURM_JOB_ID", "123456")
    assert resolve_run_id(None, 2) == "123456"
    monkeypatch.setenv("CIP_RUN_ID", "launch-7")
    assert resolve_run_id(None, 2) == "launch-7"
