"""
Distributed major cycle == single-device major cycle (the
"distributed == local" oracle extended to the solver; BASELINE config 5).
"""

import numpy as np

from ska_sdp_cip_tpu.invert import (
    StokesIGridderInput,
    pixel_size_lm_from_asec,
)
from ska_sdp_cip_tpu.io.visibility_dataset import VisibilityReader
from ska_sdp_cip_tpu.models import MeasurementOperator, major_cycle_clean
from ska_sdp_cip_tpu.parallel.mesh import make_device_mesh
from ska_sdp_cip_tpu.parallel.sharded_clean import (
    sharded_major_cycle_clean,
)

NUM_PIXELS = 96
PIXEL_SIZE_ASEC = 40.0


def test_sharded_clean_matches_local(dataset_path):
    """
    Few, unambiguous minor-cycle iterations: deep CLEAN runs diverge
    pixel-wise between any two numerically-different gridders (argmax
    tie cascade), so the pixel-level check uses shallow cycles and the
    aggregate check below covers the deep behaviour.
    """
    reader = VisibilityReader(dataset_path)
    kwargs = dict(num_major=2, gain=0.3, minor_iter=6)

    model_sharded, residual_sharded, _psf = sharded_major_cycle_clean(
        reader,
        NUM_PIXELS,
        PIXEL_SIZE_ASEC,
        mesh=make_device_mesh(8),
        row_chunks=2,
        freq_chunks=4,
        epsilon=1e-4,
        **kwargs,
    )

    gridder_input = StokesIGridderInput.from_reader(reader)
    operator = MeasurementOperator.build(
        gridder_input.uvw,
        gridder_input.channel_frequencies,
        gridder_input.effective_weights(),
        NUM_PIXELS,
        pixel_size_lm_from_asec(PIXEL_SIZE_ASEC),
        epsilon=1e-4,
    )
    model_local, residual_local = major_cycle_clean(
        operator, gridder_input.visibilities.ravel(), **kwargs
    )

    scale = np.abs(np.asarray(residual_local)).max()
    np.testing.assert_allclose(
        model_sharded, np.asarray(model_local), atol=2e-4 * scale
    )
    np.testing.assert_allclose(
        residual_sharded,
        np.asarray(residual_local),
        atol=2e-3 * scale,
    )


def test_sharded_clean_deep_aggregate(dataset_path):
    """Deep run: aggregate CLEAN behaviour matches the local solver."""
    reader = VisibilityReader(dataset_path)
    kwargs = dict(num_major=2, gain=0.2, minor_iter=25)

    model_s, residual_s, _psf = sharded_major_cycle_clean(
        reader,
        NUM_PIXELS,
        PIXEL_SIZE_ASEC,
        mesh=make_device_mesh(8),
        row_chunks=4,
        freq_chunks=2,
        epsilon=1e-4,
        **kwargs,
    )
    gridder_input = StokesIGridderInput.from_reader(reader)
    operator = MeasurementOperator.build(
        gridder_input.uvw,
        gridder_input.channel_frequencies,
        gridder_input.effective_weights(),
        NUM_PIXELS,
        pixel_size_lm_from_asec(PIXEL_SIZE_ASEC),
        epsilon=1e-4,
    )
    model_l, residual_l = major_cycle_clean(
        operator, gridder_input.visibilities.ravel(), **kwargs
    )
    np.testing.assert_allclose(
        float(model_s.sum()), float(np.asarray(model_l).sum()), rtol=0.02
    )
    assert np.abs(residual_s).max() < 1.2 * np.abs(
        np.asarray(residual_l)
    ).max() + 1e-6
