from .chunking import balanced_chunk_bounds, balanced_chunk_sizes
from .task_metrics import Task, TaskMetrics, TaskRecorder

__all__ = [
    "balanced_chunk_sizes",
    "balanced_chunk_bounds",
    "Task",
    "TaskMetrics",
    "TaskRecorder",
]
