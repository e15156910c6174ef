"""
Golden tests for balanced partitioning — ported semantics from
reference: tests/test_measurement_set_partition_indices.py:33-97.
"""

import pytest

from ska_sdp_cip_tpu.io.visibility_dataset import VisibilityReader
from ska_sdp_cip_tpu.utils.chunking import (
    balanced_chunk_bounds,
    balanced_chunk_sizes,
)


def test_balanced_chunk_sizes_exact():
    assert list(balanced_chunk_sizes(10, 3)) == [4, 3, 3]
    assert list(balanced_chunk_sizes(10, 1)) == [10]
    assert list(balanced_chunk_sizes(10, 10)) == [1] * 10


def test_balanced_chunk_sizes_validation():
    with pytest.raises(ValueError):
        list(balanced_chunk_sizes(0, 1))
    with pytest.raises(ValueError):
        list(balanced_chunk_sizes(5, 0))
    with pytest.raises(ValueError):
        list(balanced_chunk_sizes(5, 6))


def test_balanced_chunk_bounds_exact():
    assert list(balanced_chunk_bounds(10, 20, 3)) == [
        (10, 14),
        (14, 17),
        (17, 20),
    ]


def test_partition_2x3(reader: VisibilityReader):
    """
    Partitioning is row-major with balanced bounds — same layout as the
    reference's golden test for (2, 3)
    (reference: tests/test_measurement_set_partition_indices.py:33-64).
    """
    num_rows = reader.num_data_rows
    num_chans = reader.num_channels
    assert num_chans == 4

    chunks = reader.partition(2, 3)
    assert len(chunks) == 6

    row_bounds = list(balanced_chunk_bounds(0, num_rows, 2))
    chan_bounds = list(balanced_chunk_bounds(0, num_chans, 3))
    expected = [
        (rb, cb) for rb in row_bounds for cb in chan_bounds
    ]
    actual = [
        ((c.row_start, c.row_end), (c.channel_start, c.channel_end))
        for c in chunks
    ]
    assert actual == expected


def test_partition_5x1(reader: VisibilityReader):
    chunks = reader.partition(5, 1)
    assert len(chunks) == 5
    # Chunks tile the full row range contiguously
    assert chunks[0].row_start == 0
    assert chunks[-1].row_end == reader.num_data_rows
    for prev, cur in zip(chunks, chunks[1:]):
        assert prev.row_end == cur.row_start
    for chunk in chunks:
        assert chunk.channel_start == 0
        assert chunk.channel_end == reader.num_channels


def test_partition_validation(reader: VisibilityReader):
    """
    Excessive chunk counts raise ValueError
    (reference: tests/test_measurement_set_partition_indices.py:87-97).
    """
    with pytest.raises(ValueError):
        reader.partition(reader.num_data_rows + 1, 1)
    with pytest.raises(ValueError):
        reader.partition(1, reader.num_channels + 1)
    with pytest.raises(ValueError):
        reader.partition(0, 1)
