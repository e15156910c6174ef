"""
Tiling plan partition-of-unity — ported invariant from
reference: tests/uvw_tiling/test_uvw_tiling_plan.py:7-32: with a
256-channel MeerKAT L-band frequency ramp, every (row, chan) sample
must land in exactly one tile.
"""

import numpy as np

from ska_sdp_cip_tpu.io.synth import synthetic_uvw
from ska_sdp_cip_tpu.uvw_tiling import (
    create_uvw_tile_mapping,
    merge_tile_mappings,
)

TILE_SIZE = (3000.0, 3000.0, 6000.0)


def test_every_sample_in_exactly_one_tile():
    uvw, _ = synthetic_uvw(4, 16, max_baseline_m=7000.0, seed=21)
    channel_freqs = np.linspace(856e6, 1712e6, 256)

    mapping = create_uvw_tile_mapping(uvw, TILE_SIZE, channel_freqs)

    coverage = np.zeros((len(uvw), len(channel_freqs)), dtype=int)
    for row_slices in mapping.values():
        for irow, c0, c1 in row_slices:
            coverage[irow, c0:c1] += 1
    assert (coverage == 1).all()


def test_runs_are_maximal():
    """Adjacent row slices of the same row map to different tiles."""
    uvw, _ = synthetic_uvw(2, 12, max_baseline_m=7000.0, seed=3)
    channel_freqs = np.linspace(856e6, 1712e6, 128)
    mapping = create_uvw_tile_mapping(uvw, TILE_SIZE, channel_freqs)

    # Build per-row sorted runs with their coords
    runs_by_row = {}
    for coords, row_slices in mapping.items():
        for irow, c0, c1 in row_slices:
            runs_by_row.setdefault(irow, []).append((c0, c1, coords))
    for runs in runs_by_row.values():
        runs.sort()
        for (_, stop_a, coords_a), (start_b, _, coords_b) in zip(
            runs, runs[1:]
        ):
            assert stop_a == start_b
            assert coords_a != coords_b


def test_row_offset_and_merge():
    uvw, _ = synthetic_uvw(2, 8, max_baseline_m=5000.0, seed=5)
    channel_freqs = np.linspace(856e6, 1712e6, 64)
    half = len(uvw) // 2

    whole = create_uvw_tile_mapping(uvw, TILE_SIZE, channel_freqs)
    merged = merge_tile_mappings(
        [
            create_uvw_tile_mapping(
                uvw[:half], TILE_SIZE, channel_freqs
            ),
            create_uvw_tile_mapping(
                uvw[half:], TILE_SIZE, channel_freqs, row_offset=half
            ),
        ]
    )
    assert set(whole) == set(merged)
    for coords in whole:
        assert sorted(whole[coords]) == sorted(merged[coords])
