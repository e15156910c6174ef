"""
Reader basics — ported semantics from
reference: tests/test_measurement_set.py:7-52.
"""

import numpy as np
import pytest

from ska_sdp_cip_tpu.io.synth import MKT_NANO_CHAN_FREQS
from ska_sdp_cip_tpu.io.visibility_dataset import (
    UnsupportedLayout,
    VisibilityReader,
    write_vz_dataset,
)


def test_path_is_absolute(reader: VisibilityReader):
    assert reader.path == reader.path.absolute()


def test_filenotfound_on_nonexistent_path():
    with pytest.raises(FileNotFoundError):
        VisibilityReader("definitely/does/not/exist.vz")


def test_channel_frequencies(reader: VisibilityReader):
    """
    Exact channel frequencies — the same MeerKAT L-band values the
    reference asserts (reference: tests/test_measurement_set.py:22-28).
    """
    assert np.array_equal(
        reader.channel_frequencies(),
        [959969726.5625, 960805664.0625, 961641601.5625, 962477539.0625],
    )
    assert np.array_equal(reader.channel_frequencies(), MKT_NANO_CHAN_FREQS)


def test_reading_uvw_and_visibilities(reader: VisibilityReader):
    uvw = reader.uvw()
    vis = reader.visibilities()
    assert uvw.shape == (reader.num_data_rows, 3)
    assert vis.shape == (reader.num_data_rows, 4, 4)


def test_reading_flags(reader: VisibilityReader):
    assert reader.flags().shape == (reader.num_data_rows, 4, 4)
    assert reader.flags().dtype == bool


def test_reading_weights(reader: VisibilityReader):
    assert reader.weights().shape == (reader.num_data_rows, 4, 4)


def test_weight_column_fallback(weight_column_dataset_path):
    """
    Row-level WEIGHT repeated along frequency when WEIGHT_SPECTRUM is
    absent (reference: measurement_set.py:334-358).
    """
    reader = VisibilityReader(weight_column_dataset_path)
    weights = reader.weights()
    assert weights.shape == (reader.num_data_rows, 4, 4)
    # All channels carry identical (repeated) weights
    assert np.array_equal(weights[:, 0, :], weights[:, 1, :])
    assert np.array_equal(weights[:, 0, :], weights[:, 3, :])


def test_reader_pickles_cheaply(reader: VisibilityReader):
    """
    Readers are cheap picklable views (path + bounds) — the property
    the reference relies on to ship readers to workers
    (reference: SURVEY.md section 3.4).
    """
    import pickle

    chunk = reader.partition(2, 2)[1]
    clone = pickle.loads(pickle.dumps(chunk))
    assert clone.path == chunk.path
    assert (clone.row_start, clone.row_end) == (
        chunk.row_start,
        chunk.row_end,
    )
    assert (clone.channel_start, clone.channel_end) == (
        chunk.channel_start,
        chunk.channel_end,
    )
    assert np.array_equal(clone.uvw(), chunk.uvw())


def test_layout_validation_rejects_bad_corr_types(tmp_path):
    """
    Layout restrictions are enforced
    (reference: measurement_set.py:77-105).
    """
    nrow, nchan = 4, 2
    kwargs = dict(
        uvw=np.zeros((nrow, 3)),
        visibilities=np.zeros((nrow, nchan, 4), np.complex64),
        flags=np.zeros((nrow, nchan, 4), bool),
        channel_frequencies=np.linspace(1e9, 1.1e9, nchan),
        weight_spectrum=np.ones((nrow, nchan, 4), np.float32),
    )
    path = write_vz_dataset(
        tmp_path / "bad_corr.vz", corr_types=(1, 2, 3, 4), **kwargs
    )
    with pytest.raises(UnsupportedLayout):
        VisibilityReader(path)

    path = write_vz_dataset(
        tmp_path / "circ.vz", corr_types=(5, 6, 7, 8), **kwargs
    )
    VisibilityReader(path)  # circular frame accepted


def test_layout_validation_rejects_multi_spw(tmp_path):
    nrow, nchan = 4, 2
    path = write_vz_dataset(
        tmp_path / "multispw.vz",
        uvw=np.zeros((nrow, 3)),
        visibilities=np.zeros((nrow, nchan, 4), np.complex64),
        flags=np.zeros((nrow, nchan, 4), bool),
        channel_frequencies=np.linspace(1e9, 1.1e9, nchan),
        weight_spectrum=np.ones((nrow, nchan, 4), np.float32),
        num_spectral_windows=2,
    )
    with pytest.raises(UnsupportedLayout):
        VisibilityReader(path)
