"""
ducc0.wgridder call-signature compatibility: the exact call the
reference makes (invert.py:170-183) runs unmodified.
"""

import numpy as np

from ska_sdp_cip_tpu import wgridder
from ska_sdp_cip_tpu.io.synth import synthetic_uvw
from ska_sdp_cip_tpu.ops.dft import dirty_image_dft


def test_reference_call_signature():
    rng = np.random.default_rng(2)
    uvw, _ = synthetic_uvw(3, 8, max_baseline_m=2000.0, seed=2)
    freqs = np.array([1.1e9, 1.15e9])
    shape = (len(uvw), 2)
    vis = (
        rng.normal(size=shape) + 1j * rng.normal(size=shape)
    ).astype(np.complex64)
    wgt = rng.uniform(0.5, 2.0, size=shape).astype(np.float32)
    num_pixels = 64
    pixel_size_lm = float(np.sin(np.radians(60.0 / 3600.0)))

    # Verbatim argument structure from the reference's ducc_invert
    image = wgridder.ms2dirty(
        uvw,
        freqs,
        vis,
        wgt,
        num_pixels,
        num_pixels,
        pixel_size_lm,
        pixel_size_lm,
        epsilon=1e-4,
        do_wstacking=True,
        nthreads=8,
        mask=None,
    )
    assert image.shape == (num_pixels, num_pixels)

    reference = dirty_image_dft(
        uvw, freqs, vis, wgt, num_pixels, pixel_size_lm, apply_w=True
    )
    error = np.max(np.abs(image - reference)) / np.max(np.abs(reference))
    assert error < 1e-4

    model_vis = wgridder.dirty2ms(
        uvw,
        freqs,
        image,
        pixsize_x=pixel_size_lm,
        pixsize_y=pixel_size_lm,
        epsilon=1e-4,
        do_wstacking=True,
    )
    assert model_vis.shape == shape
    assert np.isfinite(model_vis).all()
