"""
Host allocator tuning for large staging buffers.

The planning/staging path allocates many large (tens-to-hundreds of MB)
short-lived host arrays. glibc serves allocations above the mmap
threshold with fresh mmap'd pages and returns them to the kernel on
free, so every temporary pays first-touch page faults again — on
virtualized hosts with lazily-faulted memory (as in cloud TPU VMs)
that degrades host staging to tens of MB/s while warm pages run at
GB/s (measured 100x: 8 s vs 0.05 s for one 200 MB elementwise op).

``enable_malloc_reuse`` switches glibc to keep large blocks in the
arena (``M_MMAP_MAX=0``) and never trim freed memory back to the OS
(``M_TRIM_THRESHOLD=-1``), so page faults are paid once per high-water
mark instead of once per allocation. Called on package import; opt out
with ``CIP_MALLOC_REUSE=0`` (the process will hold its peak host
memory footprint for its lifetime — the right trade for a pipeline
process, not necessarily for a shared notebook kernel).

The reference leaves this to dask worker processes whose arenas stay
warm across tasks (reference: src/ska_sdp_cip/invert.py:256-268); a
single-process SPMD driver must arrange it explicitly.
"""

from __future__ import annotations

import ctypes
import mmap as _mmap
import os

import numpy as np

_M_TRIM_THRESHOLD = -1
_M_MMAP_MAX = -4

_enabled: bool | None = None


def enable_malloc_reuse() -> bool:
    """
    Configure glibc malloc to retain and reuse large freed blocks.
    Returns True when active (idempotent; False on non-glibc platforms
    or when disabled via ``CIP_MALLOC_REUSE=0``).
    """
    global _enabled
    if _enabled is not None:
        return _enabled
    if os.environ.get("CIP_MALLOC_REUSE", "1") != "1":
        _enabled = False
        return False
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        ok_mmap = libc.mallopt(_M_MMAP_MAX, 0)
        ok_trim = libc.mallopt(_M_TRIM_THRESHOLD, -1)
        _enabled = bool(ok_mmap and ok_trim)
    except Exception:
        _enabled = False
    return _enabled


def alloc_populated(count: int, dtype) -> np.ndarray:
    """
    A fresh 1-D numpy array of ``count`` elements backed by
    pre-faulted (``MAP_POPULATE``) anonymous memory.

    ``np.empty`` maps pages lazily; on hosts with lazily-backed VM
    memory, first-touch faults are erratically slow (measured
    45-500 MB/s) while kernel pre-faulting stays at GB/s. Use for
    large, immediately-and-fully-written staging buffers. Contents
    are zeroed (kernel pages). Falls back to ``np.empty`` where
    MAP_POPULATE is unavailable.
    """
    nbytes = int(count) * np.dtype(dtype).itemsize
    if nbytes < _mmap.PAGESIZE:
        return np.empty(int(count), dtype)
    try:
        flags = (
            _mmap.MAP_PRIVATE | _mmap.MAP_ANONYMOUS | _mmap.MAP_POPULATE
        )
        buf = _mmap.mmap(-1, nbytes, flags=flags)
    except (AttributeError, OSError, ValueError):
        return np.empty(int(count), dtype)
    arr = np.frombuffer(buf, dtype=dtype, count=int(count))
    arr.flags.writeable = True
    return arr
