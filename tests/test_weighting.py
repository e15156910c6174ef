"""
Imaging weighting schemes (natural / uniform / Briggs robust) — a
capability beyond the reference's natural-only gridding
(reference: invert.py:164-183).
"""

import numpy as np
import pytest

from ska_sdp_cip_tpu import invert_dataset
from ska_sdp_cip_tpu.invert import (
    StokesIGridderInput,
    pixel_size_lm_from_asec,
)
from ska_sdp_cip_tpu.models.weighting import ImagingWeighter

NUM_PIXELS = 128
PIXEL_SIZE_LM = pixel_size_lm_from_asec(30.0)


@pytest.fixture(scope="module")
def gridder_input(reader):
    return StokesIGridderInput.from_reader(reader)


def test_natural_is_identity(gridder_input):
    weighter = ImagingWeighter(
        NUM_PIXELS, PIXEL_SIZE_LM, scheme="natural"
    )
    weights = gridder_input.effective_weights()
    out = weighter.fit(
        gridder_input.uvw, gridder_input.channel_frequencies, weights
    ).apply(
        gridder_input.uvw, gridder_input.channel_frequencies, weights
    )
    np.testing.assert_array_equal(out, weights)


def test_uniform_flattens_density(gridder_input):
    """After uniform weighting, every occupied uv cell carries (close
    to) equal summed weight."""
    weights = gridder_input.effective_weights()
    weighter = ImagingWeighter(
        NUM_PIXELS, PIXEL_SIZE_LM, scheme="uniform"
    ).fit(gridder_input.uvw, gridder_input.channel_frequencies, weights)
    out = weighter.apply(
        gridder_input.uvw, gridder_input.channel_frequencies, weights
    )

    # Re-grid the new weights (same cell assignment incl. mirror)
    check = ImagingWeighter(NUM_PIXELS, PIXEL_SIZE_LM, scheme="uniform")
    iu, iv = check._cells(
        gridder_input.uvw, gridder_input.channel_frequencies
    )
    density = np.zeros((NUM_PIXELS, NUM_PIXELS))
    np.add.at(density, (iu, iv), out.ravel())
    np.add.at(
        density, (NUM_PIXELS - 1 - iu, NUM_PIXELS - 1 - iv), out.ravel()
    )
    occupied = density[density > 1e-12]
    assert occupied.max() <= 2.0 + 1e-6  # each cell sums to ~2 (mirror)
    assert occupied.min() > 0.1


def test_robust_interpolates(gridder_input):
    """Large positive robust ~ natural; very negative ~ uniform."""
    weights = gridder_input.effective_weights()
    args = (
        gridder_input.uvw,
        gridder_input.channel_frequencies,
        weights,
    )
    natural_like = (
        ImagingWeighter(
            NUM_PIXELS, PIXEL_SIZE_LM, scheme="robust", robust=5.0
        )
        .fit(*args)
        .apply(*args)
    )
    np.testing.assert_allclose(natural_like, weights, rtol=1e-3)

    uniform_like = (
        ImagingWeighter(
            NUM_PIXELS, PIXEL_SIZE_LM, scheme="robust", robust=-5.0
        )
        .fit(*args)
        .apply(*args)
    )
    uniform = (
        ImagingWeighter(NUM_PIXELS, PIXEL_SIZE_LM, scheme="uniform")
        .fit(*args)
        .apply(*args)
    )
    ratio = uniform_like[weights > 0] / np.maximum(
        uniform[weights > 0], 1e-30
    )
    assert np.std(ratio) / np.mean(ratio) < 0.05


def test_invert_with_uniform_weighting(reader):
    """Uniform-weighted dirty image: sharper PSF, still finds sources."""
    image = invert_dataset(
        reader, NUM_PIXELS, 30.0, weighting="uniform"
    )
    assert image.shape == (NUM_PIXELS, NUM_PIXELS)
    assert np.isfinite(image).all()
    assert image.max() > 0.5


def test_unknown_scheme_raises():
    with pytest.raises(ValueError):
        ImagingWeighter(64, 1e-4, scheme="bogus")


def test_sharded_uniform_matches_local(reader):
    """Sharded == local holds under uniform weighting too (the density
    fit is global)."""
    from ska_sdp_cip_tpu import sharded_invert_dataset
    from ska_sdp_cip_tpu.parallel.mesh import make_device_mesh

    local = invert_dataset(reader, 64, 30.0, weighting="uniform")
    sharded = sharded_invert_dataset(
        reader,
        64,
        30.0,
        mesh=make_device_mesh(8),
        row_chunks=2,
        freq_chunks=4,
        weighting="uniform",
    )
    np.testing.assert_allclose(
        sharded, local, atol=1e-5 * np.abs(local).max(), rtol=1e-5
    )


def test_native_density_matches_numpy(gridder_input, monkeypatch):
    """
    The multithreaded C++ density pass must reproduce the numpy
    bincount fit (same rounding, same clipped mirror); only the f64
    summation order differs (atomic adds), hence the tight allclose.
    """
    from ska_sdp_cip_tpu import native as _native
    from ska_sdp_cip_tpu.models import weighting as wmod

    if not _native.available():
        pytest.skip("native library not built")

    weighter = wmod.ImagingWeighter(128, 2.0e-5, scheme="uniform")
    args = (
        gridder_input.uvw,
        gridder_input.channel_frequencies,
        gridder_input.effective_weights(),
    )
    native_density = weighter.accumulate_density(*args)

    monkeypatch.setattr(_native, "available", lambda: False)
    numpy_density = weighter.accumulate_density(*args, density=None)

    assert native_density.sum() > 0
    np.testing.assert_allclose(
        native_density, numpy_density, rtol=1e-12, atol=0
    )
