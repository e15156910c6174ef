"""
Reorder conservation — ported invariant from
reference: tests/uvw_tiling/test_uvw_reordering.py:57-100: after a full
reorder, the multiset of per-visibility UVW-in-wavelength coordinates
recovered from the tile files equals that of the input, and the total
visibility count matches. Additionally checks weights are carried
(the Q3 fix) and chunk size limits are respected.
"""

import numpy as np

from ska_sdp_cip_tpu.invert import StokesIGridderInput
from ska_sdp_cip_tpu.io.visibility_dataset import VisibilityReader
from ska_sdp_cip_tpu.uvw_tiling import Tile, reorder_by_uvw_tile
from ska_sdp_cip_tpu.uvw_tiling.tiling_plan import SPEED_OF_LIGHT

TILE_SIZE = (3000.0, 3000.0, 6000.0)
MAX_VIS_PER_CHUNK = 10_000


def test_reorder_conserves_visibilities(dataset_path, tmp_path):
    reader = VisibilityReader(dataset_path)
    outdir = tmp_path / "tiles"

    paths = reorder_by_uvw_tile(
        reader,
        TILE_SIZE,
        outdir,
        num_time_intervals=4,
        max_vis_per_chunk=MAX_VIS_PER_CHUNK,
        max_workers=2,
    )
    assert paths, "no tile chunks written"
    assert all(p.name.startswith("tile_iu") for p in paths)
    # Pass-1 interval files were deleted by pass 2
    assert not list(outdir.glob("*interval*.npz"))

    # Collect per-visibility uvw (in wavelengths), vis, and weights
    freqs = reader.channel_frequencies()
    scale = freqs / SPEED_OF_LIGHT

    got_uvw = []
    got_vis = []
    got_wgt = []
    for path in paths:
        tile = Tile.load_npz(path)
        assert tile.num_visibilities <= MAX_VIS_PER_CHUNK
        for row in range(tile.num_rows):
            c0 = int(tile.channel_start_indices[row])
            c1 = int(tile.channel_stop_indices[row])
            offset = int(
                (
                    tile.channel_stop_indices[:row]
                    - tile.channel_start_indices[:row]
                ).sum()
            )
            for k, chan in enumerate(range(c0, c1)):
                got_uvw.append(tile.uvw[row] * scale[chan])
                got_vis.append(tile.visibilities[offset + k])
                got_wgt.append(tile.weights[offset + k])

    gridder_input = StokesIGridderInput.from_reader(reader)
    expected_uvw = (
        reader.uvw()[:, None, :] * scale[None, :, None]
    ).reshape(-1, 3)
    expected_vis = gridder_input.visibilities.ravel()
    expected_wgt = gridder_input.effective_weights().ravel()

    assert len(got_uvw) == len(expected_uvw)

    # Compare as sorted multisets (reorder permutes samples)
    def _sort(arr):
        arr = np.asarray(arr)
        flat = arr.reshape(len(arr), -1)
        return flat[np.lexsort(flat.T[::-1])]

    np.testing.assert_allclose(
        _sort(got_uvw), _sort(expected_uvw), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.sort(np.abs(np.asarray(got_vis))),
        np.sort(np.abs(expected_vis)),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.sort(np.asarray(got_wgt)),
        np.sort(expected_wgt.astype(np.float32)),
        rtol=1e-5,
    )


def test_multihost_reorder_striding(dataset_path, tmp_path):
    """
    Two hosts sharing a filesystem split intervals (pass 1) and tile
    groups (pass 2) by stride; the union of their outputs equals a
    single-host run's coverage (same totals).
    """
    from ska_sdp_cip_tpu.uvw_tiling.reorder import (
        reorder_pass1,
        reorder_pass2,
    )

    reader = VisibilityReader(dataset_path)
    outdir = tmp_path / "tiles_mh"

    # Pass 1 on both hosts, barrier, pass 2 on both hosts
    for host_index in range(2):
        reorder_pass1(
            reader,
            TILE_SIZE,
            outdir,
            num_time_intervals=4,
            max_workers=2,
            num_hosts=2,
            host_index=host_index,
        )
    paths = []
    for host_index in range(2):
        paths += reorder_pass2(
            outdir,
            max_vis_per_chunk=MAX_VIS_PER_CHUNK,
            max_workers=2,
            num_hosts=2,
            host_index=host_index,
        )
    total_multihost = sum(
        Tile.load_npz(p).num_visibilities for p in paths
    )

    outdir_single = tmp_path / "tiles_single"
    single_paths = reorder_by_uvw_tile(
        reader,
        TILE_SIZE,
        outdir_single,
        num_time_intervals=4,
        max_vis_per_chunk=MAX_VIS_PER_CHUNK,
        max_workers=2,
    )
    total_single = sum(
        Tile.load_npz(p).num_visibilities for p in single_paths
    )
    assert total_multihost == total_single
    assert {p.name for p in paths} == {p.name for p in single_paths}


def test_tile_npz_roundtrip(tmp_path):
    tile = Tile(
        coords=(1, -2, 0),
        uvw=np.arange(6, dtype=float).reshape(2, 3),
        visibilities=np.array([1 + 2j, 3 - 4j, 5j], np.complex64),
        channel_start_indices=np.array([0, 1]),
        channel_stop_indices=np.array([2, 2]),
        weights=np.array([1.0, 0.5, 2.0], np.float32),
    )
    path = tmp_path / "tile.npz"
    tile.save_npz(path)
    loaded = Tile.load_npz(path)
    assert loaded.coords == (1, -2, 0)
    np.testing.assert_array_equal(loaded.uvw, tile.uvw)
    np.testing.assert_array_equal(loaded.visibilities, tile.visibilities)
    np.testing.assert_array_equal(loaded.weights, tile.weights)


def test_reference_format_without_weights_loads(tmp_path):
    """Reference-written npz files (no weights) load with unit weights."""
    path = tmp_path / "ref_tile.npz"
    np.savez(
        path,
        coords=np.array([0, 0, 0]),
        uvw=np.zeros((1, 3)),
        visibilities=np.array([1 + 1j], np.complex64),
        channel_start_indices=np.array([0]),
        channel_stop_indices=np.array([1]),
    )
    tile = Tile.load_npz(path)
    np.testing.assert_array_equal(tile.weights, [1.0])
