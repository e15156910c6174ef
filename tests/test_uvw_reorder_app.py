"""
Reorder CLI end-to-end (reference: tests for the reorder app are via
run_program; see tests/test_pipeline_app.py pattern).
"""

import json

from ska_sdp_cip_tpu.apps.uvw_reorder_app import run_program


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
