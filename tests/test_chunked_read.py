"""
Chunked-read correctness: every partition chunk must equal the
corresponding slice of a whole read — ported property tests from
reference: tests/test_measurement_set_chunked_read.py:40-154.
"""

import numpy as np
import pytest

from ska_sdp_cip_tpu.io.visibility_dataset import VisibilityReader
from ska_sdp_cip_tpu.utils.chunking import balanced_chunk_bounds

CHUNKINGS = [(1, 4), (2, 3), (7, 1)]
COLUMNS = ["visibilities", "flags", "weights", "uvw", "channel_frequencies"]


@pytest.mark.parametrize("column", COLUMNS)
@pytest.mark.parametrize("row_chunks,freq_chunks", CHUNKINGS)
def test_chunked_read_equals_whole_read(
    reader: VisibilityReader, column: str, row_chunks: int, freq_chunks: int
):
    whole = getattr(reader, column)()
    chunks = reader.partition(row_chunks, freq_chunks)

    row_bounds = list(
        balanced_chunk_bounds(0, reader.num_data_rows, row_chunks)
    )
    chan_bounds = list(
        balanced_chunk_bounds(0, reader.num_channels, freq_chunks)
    )

    index = 0
    for r0, r1 in row_bounds:
        for c0, c1 in chan_bounds:
            chunk_data = getattr(chunks[index], column)()
            if column == "uvw":
                expected = whole[r0:r1]
            elif column == "channel_frequencies":
                expected = whole[c0:c1]
            else:
                expected = whole[r0:r1, c0:c1]
            assert np.array_equal(chunk_data, expected), (
                f"{column} chunk {index} != whole-read slice"
            )
            index += 1
