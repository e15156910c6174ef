"""
Per-step task metrics with the reference's pandas-loadable JSON schema.

The reference parses the dask task stream into a list of task dicts with
keys ``key, worker, status, start, stop, name, duration``
(reference: src/ska_sdp_cip/task_metrics.py:10-135). There is no dask
scheduler here — steps of the SPMD program are recorded host-side via
:class:`TaskRecorder` — but the exported ``task-list.json`` schema is
identical so downstream analysis (``pandas.read_json``) keeps working.
"""

from __future__ import annotations

import collections.abc
import json
import os
import time
from contextlib import contextmanager
from dataclasses import dataclass, field
from typing import Iterator, Union


@dataclass
class Task:
    """
    Information about a single executed task / pipeline step.

    Schema matches the reference (src/ska_sdp_cip/task_metrics.py:10-86):
    ``name`` is the key minus the trailing ``-<hash>`` segment, and
    ``duration = stop - start``.
    """

    key: str
    """Unique identifier of the task."""

    worker: str
    """Identifier of the worker/device/host that ran the task."""

    status: str
    """Return status ("OK" or an error string)."""

    start: float
    """Start time as a UNIX timestamp."""

    stop: float
    """Stop time as a UNIX timestamp."""

    name: str = field(init=False)
    """Task key with the trailing "-<suffix>" stripped."""

    duration: float = field(init=False)
    """Total duration in seconds."""

    def __post_init__(self) -> None:
        self.name = self.key.rsplit("-", maxsplit=1)[0]
        self.duration = self.stop - self.start

    def as_dict(self) -> dict:
        """Convert to a plain dictionary."""
        keys = ["key", "worker", "status", "start", "stop", "name", "duration"]
        return {key: getattr(self, key) for key in keys}

    @classmethod
    def from_spans(cls, entry: dict) -> Task:
        """
        Build from a dict with key/worker/status plus a ``startstops``
        tuple of ``{"action", "start", "stop"}`` spans (the dask task
        stream entry layout, reference: task_metrics.py:67-86): start is
        the min span start, stop the max span stop, so transfer + compute
        spans both count toward the duration.
        """
        spans = entry["startstops"]
        return cls(
            key=entry["key"],
            worker=entry["worker"],
            status=entry["status"],
            start=min(span["start"] for span in spans),
            stop=max(span["stop"] for span in spans),
        )


class TaskMetrics(collections.abc.Sequence):
    """
    A sequence of :class:`Task` with JSON export, loadable with
    ``pandas.read_json()`` (reference: task_metrics.py:88-135).

    Accepts either pre-built :class:`Task` objects or raw task-stream
    style dicts carrying ``startstops`` spans.
    """

    def __init__(self, tasks: list) -> None:
        self._task_list = [
            task if isinstance(task, Task) else Task.from_spans(task)
            for task in tasks
        ]

    def __len__(self) -> int:
        return len(self._task_list)

    def __getitem__(self, index: int) -> Task:
        return self._task_list[index]

    def to_json(self, **kwargs) -> str:
        """JSON representation; kwargs forwarded to ``json.dumps``."""
        return json.dumps([task.as_dict() for task in self], **kwargs)

    def save_json(self, path: Union[str, os.PathLike], **kwargs) -> None:
        """Write the JSON representation to ``path``."""
        with open(path, "w", encoding="utf-8") as file:
            file.write(self.to_json(**kwargs))


class TaskRecorder:
    """
    Host-side recorder of pipeline steps — the TPU-native replacement for
    wrapping runs in dask's ``get_task_stream()``
    (reference: apps/pipeline_app.py:94-107).

    Use :meth:`step` around each pipeline stage; the recorded tasks carry
    the executing process/device identity as ``worker``. Completed runs
    export through :meth:`metrics` / :meth:`save_json`.
    """

    def __init__(self, worker: str | None = None) -> None:
        if worker is None:
            import jax

            device = jax.devices()[0]
            worker = (
                f"process{jax.process_index()}/"
                f"{device.platform}:{device.id}"
            )
        self.worker = worker
        self._tasks: list[Task] = []
        self._counter = 0

    @contextmanager
    def step(self, name: str) -> Iterator[None]:
        """Record one named step; exceptions are recorded then re-raised."""
        key = f"{name}-{self._counter:06d}"
        self._counter += 1
        start = time.time()
        status = "OK"
        try:
            yield
        except Exception:
            status = "error"
            raise
        finally:
            self._tasks.append(
                Task(
                    key=key,
                    worker=self.worker,
                    status=status,
                    start=start,
                    stop=time.time(),
                )
            )

    @property
    def tasks(self) -> list[Task]:
        """Recorded tasks so far."""
        return list(self._tasks)

    def metrics(self) -> TaskMetrics:
        """The recorded tasks as a :class:`TaskMetrics` sequence."""
        return TaskMetrics(self._tasks)

    def save_json(self, path: Union[str, os.PathLike], **kwargs) -> None:
        """Export recorded tasks to ``path`` in the reference schema."""
        self.metrics().save_json(path, **kwargs)
