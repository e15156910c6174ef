"""
Deconvolution tests: measurement operator consistency, Hogbom minor
cycle behaviour, and major-cycle recovery of synthetic point sources
(the solver layer the reference lacks; north star in BASELINE.json).
"""

import numpy as np
import pytest

from ska_sdp_cip_tpu.invert import (
    StokesIGridderInput,
    pixel_size_lm_from_asec,
)
from ska_sdp_cip_tpu.models import (
    MeasurementOperator,
    hogbom_clean,
    major_cycle_clean,
)

NUM_PIXELS = 128
PIXEL_SIZE_ASEC = 30.0


@pytest.fixture(scope="module")
def operator_and_vis(reader):
    gridder_input = StokesIGridderInput.from_reader(reader)
    operator = MeasurementOperator.build(
        gridder_input.uvw,
        gridder_input.channel_frequencies,
        gridder_input.effective_weights(),
        NUM_PIXELS,
        pixel_size_lm_from_asec(PIXEL_SIZE_ASEC),
        epsilon=1e-4,
    )
    return operator, gridder_input.visibilities.ravel()


def test_dirty_image_matches_invert_dataset(reader, operator_and_vis):
    from ska_sdp_cip_tpu import invert_dataset

    operator, vis = operator_and_vis
    dirty = np.asarray(operator.dirty_image(vis))
    expected = invert_dataset(reader, NUM_PIXELS, PIXEL_SIZE_ASEC)
    np.testing.assert_allclose(
        dirty, expected, atol=1e-5 * np.abs(expected).max()
    )


def test_psf_peaks_at_center(operator_and_vis):
    operator, _ = operator_and_vis
    psf = np.asarray(operator.psf())
    assert psf.shape == (NUM_PIXELS, NUM_PIXELS)
    peak = np.unravel_index(np.argmax(psf), psf.shape)
    assert peak == (NUM_PIXELS // 2, NUM_PIXELS // 2)
    assert psf.max() == pytest.approx(1.0, rel=1e-3)


def test_hogbom_reduces_residual(operator_and_vis):
    operator, vis = operator_and_vis
    dirty = operator.dirty_image(vis)
    psf = operator.psf()
    model, residual = hogbom_clean(
        dirty, psf, gain=0.2, max_iter=50
    )
    assert np.abs(np.asarray(residual)).max() < np.abs(
        np.asarray(dirty)
    ).max()
    assert np.asarray(model).max() > 0


def test_clark_minor_matches_exact_for_compact_psf():
    """
    When the PSF is fully contained in the truncation patch, the
    Clark-style fast path (truncated subtraction + incremental block
    maxima) makes EXACTLY the same peak choices and subtractions as
    exact Hogbom — same model, same residual.
    """
    import jax.numpy as jnp

    npix = 128
    rng = np.random.default_rng(21)
    # Compact PSF: gaussian confined to the central 32x32 cells
    psf = np.zeros((npix, npix), np.float32)
    axis = np.arange(-15, 16)
    rr2 = np.add.outer(axis**2, axis**2)
    psf[
        npix // 2 - 15 : npix // 2 + 16,
        npix // 2 - 15 : npix // 2 + 16,
    ] = np.exp(-0.5 * rr2 / 9.0)
    # Dirty image: a few sources convolved with the psf + noise
    dirty = 0.01 * rng.normal(size=(npix, npix)).astype(np.float32)
    for (i, j), flux in (((30, 100), 2.0), ((90, 40), 1.1), ((64, 64), 0.7)):
        dirty[
            max(i - 15, 0) : i + 16, max(j - 15, 0) : j + 16
        ] += flux * psf[
            npix // 2 - 15 : npix // 2 + 16,
            npix // 2 - 15 : npix // 2 + 16,
        ][: dirty[max(i - 15, 0) : i + 16].shape[0]]

    exact_model, exact_res = hogbom_clean(
        jnp.asarray(dirty), jnp.asarray(psf), gain=0.2, max_iter=40
    )
    fast_model, fast_res = hogbom_clean(
        jnp.asarray(dirty),
        jnp.asarray(psf),
        gain=0.2,
        max_iter=40,
        psf_patch=64,
    )
    np.testing.assert_allclose(
        np.asarray(fast_model), np.asarray(exact_model), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(fast_res), np.asarray(exact_res), atol=1e-6
    )


def test_clark_minor_reduces_residual_with_real_psf(operator_and_vis):
    """With a full (sidelobed) PSF the truncated path still cleans."""
    operator, vis = operator_and_vis
    dirty = operator.dirty_image(vis)
    psf = operator.psf()
    model, residual = hogbom_clean(
        dirty, psf, gain=0.2, max_iter=50, psf_patch=32
    )
    assert np.abs(np.asarray(residual)).max() < np.abs(
        np.asarray(dirty)
    ).max()
    assert np.asarray(model).max() > 0


def test_pick_psf_patch_thresholds():
    from ska_sdp_cip_tpu.models.clean import pick_psf_patch

    assert pick_psf_patch(2048) is None
    assert pick_psf_patch(10240) == 2048


def test_major_cycle_recovers_sources(operator_and_vis):
    """
    CLEAN model flux concentrates near the synthetic sources and the
    residual drops well below the dirty peak.
    """
    operator, vis = operator_and_vis
    dirty_peak = float(np.abs(np.asarray(operator.dirty_image(vis))).max())
    model, residual = major_cycle_clean(
        operator, vis, num_major=2, gain=0.2, minor_iter=60
    )
    model = np.asarray(model)
    residual = np.asarray(residual)
    assert model.sum() > 0
    assert np.abs(residual).max() < 0.6 * dirty_peak


def test_gradient_zero_at_consistent_model(operator_and_vis):
    """
    If v = G(I), then the gradient at I vanishes (up to gridder
    epsilon) — exercises forward/adjoint consistency end-to-end.
    """
    operator, _ = operator_and_vis
    rng = np.random.default_rng(11)
    image = np.zeros((NUM_PIXELS, NUM_PIXELS), np.float32)
    image[64, 64] = 1.0
    image[40, 80] = 0.5

    model_re, model_im = operator.forward(image)
    grad = np.asarray(
        operator.residual_gradient(image, (model_re, model_im))
    )
    assert np.abs(grad).max() < 1e-3
