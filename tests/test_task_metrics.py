"""
Task metrics records and JSON export — same schema/semantics the
reference tests pin down (reference: tests/test_task_metrics.py:10-142),
plus the TaskRecorder replacement for the dask task stream.
"""

import json

import pytest

from ska_sdp_cip_tpu.utils.task_metrics import (
    SCHEMA_KEYS,
    TaskRecorder,
    record_from_spans,
    save_tasks_json,
    task_record,
    tasks_to_json,
)

TASK_STREAM_DATA = [
    {
        "key": "load_chunk-abc123",
        "worker": "tcp://127.0.0.1:40000",
        "status": "OK",
        "startstops": (
            {"action": "compute", "start": 100.0, "stop": 103.0},
        ),
    },
    {
        "key": "grid_chunk-def456",
        "worker": "tcp://127.0.0.1:40001",
        "status": "OK",
        "startstops": (
            {"action": "transfer", "start": 104.0, "stop": 105.0},
            {"action": "compute", "start": 105.5, "stop": 110.0},
        ),
    },
]


def test_record_from_spans_duration_covers_transfer_and_compute():
    """
    start = min over spans, stop = max over spans — transfer time counts
    toward duration (reference: task_metrics.py:67-86,
    tests/test_task_metrics.py:60-76).
    """
    record = record_from_spans(TASK_STREAM_DATA[1])
    assert record["start"] == 104.0
    assert record["stop"] == 110.0
    assert record["duration"] == 6.0
    assert record["name"] == "grid_chunk"
    assert record["worker"] == "tcp://127.0.0.1:40001"


def test_record_name_strips_trailing_hash():
    record = task_record("a-b-c-123abc", "w", "OK", 0.0, 1.0)
    assert record["name"] == "a-b-c"


def test_tasks_to_json_schema():
    data = json.loads(tasks_to_json(TASK_STREAM_DATA))
    assert len(data) == 2
    assert data[0] == {
        "key": "load_chunk-abc123",
        "worker": "tcp://127.0.0.1:40000",
        "status": "OK",
        "start": 100.0,
        "stop": 103.0,
        "name": "load_chunk",
        "duration": 3.0,
    }


def test_save_tasks_json_pandas_loadable(tmp_path):
    import pandas as pd

    path = tmp_path / "task-list.json"
    save_tasks_json(TASK_STREAM_DATA, path)
    frame = pd.read_json(path)
    assert list(frame.columns) == list(SCHEMA_KEYS)
    assert len(frame) == 2


def test_task_recorder_records_steps(tmp_path):
    recorder = TaskRecorder(worker="test-worker")
    with recorder.step("load"):
        pass
    with recorder.step("grid"):
        pass
    with pytest.raises(RuntimeError):
        with recorder.step("boom"):
            raise RuntimeError("expected")

    tasks = recorder.tasks
    assert [t["name"] for t in tasks] == ["load", "grid", "boom"]
    assert [t["status"] for t in tasks] == ["OK", "OK", "error"]
    assert all(t["worker"] == "test-worker" for t in tasks)
    assert all(t["duration"] >= 0 for t in tasks)

    path = tmp_path / "task-list.json"
    recorder.save_json(path)
    assert len(json.loads(path.read_text())) == 3
