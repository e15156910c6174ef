"""
Distributed-vs-local numerical equivalence — the correctness oracle of
the reference (reference: tests/test_dask_invert_measurement_set.py:
12-34): the sharded SPMD invert over the 8-device CPU mesh must match
the single-device invert within epsilon=1e-5.
"""

import numpy as np
import pytest

from ska_sdp_cip_tpu import invert_dataset, sharded_invert_dataset
from ska_sdp_cip_tpu.parallel.mesh import make_device_mesh
from ska_sdp_cip_tpu.utils.task_metrics import TaskRecorder

NUM_PIXELS = 128
PIXEL_SIZE_ASEC = 30.0
TOLERANCE = 1e-5


def test_sharded_matches_local(reader):
    local = invert_dataset(reader, NUM_PIXELS, PIXEL_SIZE_ASEC)

    mesh = make_device_mesh(8)
    recorder = TaskRecorder(worker="test")
    sharded = sharded_invert_dataset(
        reader,
        NUM_PIXELS,
        PIXEL_SIZE_ASEC,
        mesh=mesh,
        row_chunks=2,
        freq_chunks=4,
        recorder=recorder,
    )

    assert sharded.shape == local.shape
    np.testing.assert_allclose(
        sharded,
        local,
        atol=TOLERANCE * np.abs(local).max(),
        rtol=TOLERANCE,
    )
    # Tracing recorded every pipeline stage
    names = [t["name"] for t in recorder.tasks]
    assert names == [
        "load_shards",
        "plan_shards",
        "stage_shards",
        "grid_fft_reduce",
    ]


def test_sharded_default_chunking(reader):
    """Defaults mirror the reference: freq chunks = min(nchan, ndev)."""
    mesh = make_device_mesh(8)
    image = sharded_invert_dataset(
        reader, 64, PIXEL_SIZE_ASEC, mesh=mesh
    )
    assert image.shape == (64, 64)


def test_sharded_invalid_chunking(reader):
    mesh = make_device_mesh(8)
    with pytest.raises(ValueError):
        sharded_invert_dataset(
            reader,
            64,
            PIXEL_SIZE_ASEC,
            mesh=mesh,
            row_chunks=3,
            freq_chunks=4,
        )
