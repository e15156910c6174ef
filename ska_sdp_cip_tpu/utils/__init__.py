from .chunking import balanced_chunk_bounds, balanced_chunk_sizes
from .task_metrics import (
    TaskRecorder,
    record_from_spans,
    save_tasks_json,
    task_record,
    tasks_to_json,
)

__all__ = [
    "balanced_chunk_sizes",
    "balanced_chunk_bounds",
    "TaskRecorder",
    "task_record",
    "record_from_spans",
    "tasks_to_json",
    "save_tasks_json",
]
