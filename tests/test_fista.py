"""
FISTA regularized imaging: converges toward the synthetic sky (sparse
point sources), residual decreasing.
"""

import numpy as np

from ska_sdp_cip_tpu.invert import (
    StokesIGridderInput,
    pixel_size_lm_from_asec,
)
from ska_sdp_cip_tpu.models import MeasurementOperator
from ska_sdp_cip_tpu.models.fista import fista_clean

NUM_PIXELS = 96
PIXEL_SIZE_ASEC = 40.0


def test_fista_recovers_sparse_sky(reader):
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

    model, residual, trace = fista_clean(
        operator, vis, num_iter=15, lam_factor=5e-2
    )
    # Model is sparse and nonnegative
    assert model.min() >= 0.0
    assert (model > 1e-3).sum() < 0.2 * model.size
    assert model.max() > 0.1
    # Gradient magnitude decreased substantially
    assert trace[-1] < 0.7 * trace[0]
    # Residual well below the dirty peak
    assert np.abs(residual).max() < 0.8 * dirty_peak
