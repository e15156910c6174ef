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


def _local_operator(reader):
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


def test_sharded_multiscale_matches_local(dataset_path):
    """-d --algorithm multiscale runs multiscale (round-2 verdict #4:
    it previously silently degraded to hogbom)."""
    from ska_sdp_cip_tpu.models.multiscale import multiscale_clean

    reader = VisibilityReader(dataset_path)
    kwargs = dict(num_major=2, gain=0.3, minor_iter=6)
    scales = (0.0, 2.0, 4.0)

    model_s, residual_s, _psf = sharded_major_cycle_clean(
        reader,
        NUM_PIXELS,
        PIXEL_SIZE_ASEC,
        mesh=make_device_mesh(8),
        row_chunks=2,
        freq_chunks=4,
        epsilon=1e-4,
        algorithm="multiscale",
        scales=scales,
        **kwargs,
    )
    operator, vis = _local_operator(reader)
    model_l, residual_l = multiscale_clean(
        operator, vis, scales=scales, **kwargs
    )
    scale = np.abs(np.asarray(residual_l)).max()
    np.testing.assert_allclose(
        model_s, np.asarray(model_l), atol=2e-3 * scale
    )
    np.testing.assert_allclose(
        residual_s, np.asarray(residual_l), atol=5e-3 * scale
    )


def test_sharded_fista_matches_local(dataset_path):
    from ska_sdp_cip_tpu.models.fista import fista_clean

    reader = VisibilityReader(dataset_path)
    num_iter = 8

    model_s, residual_s, _psf = sharded_major_cycle_clean(
        reader,
        NUM_PIXELS,
        PIXEL_SIZE_ASEC,
        mesh=make_device_mesh(8),
        row_chunks=2,
        freq_chunks=4,
        epsilon=1e-4,
        algorithm="fista",
        num_major=1,
        minor_iter=num_iter * 10,
    )
    operator, vis = _local_operator(reader)
    model_l, residual_l, _trace = fista_clean(
        operator, vis, num_iter=num_iter
    )
    scale = max(np.abs(model_l).max(), 1e-9)
    np.testing.assert_allclose(model_s, model_l, atol=1e-3 * scale)
    np.testing.assert_allclose(
        residual_s,
        residual_l,
        atol=1e-3 * np.abs(residual_l).max(),
    )


def test_sharded_unknown_algorithm_raises(dataset_path):
    import pytest

    reader = VisibilityReader(dataset_path)
    with pytest.raises(ValueError, match="algorithm"):
        sharded_major_cycle_clean(
            reader,
            NUM_PIXELS,
            PIXEL_SIZE_ASEC,
            mesh=make_device_mesh(8),
            algorithm="nope",
        )


def test_sharded_clean_distributed_fft_matches_replicated(dataset_path):
    """fft_mode="distributed" major cycle == replicated (shallow)."""
    reader = VisibilityReader(dataset_path)
    kwargs = dict(
        num_major=2,
        gain=0.3,
        minor_iter=6,
        mesh=make_device_mesh(8),
        row_chunks=2,
        freq_chunks=4,
        epsilon=1e-4,
    )
    model_rep, residual_rep, _ = sharded_major_cycle_clean(
        reader, NUM_PIXELS, PIXEL_SIZE_ASEC, **kwargs
    )
    model_dist, residual_dist, _ = sharded_major_cycle_clean(
        reader,
        NUM_PIXELS,
        PIXEL_SIZE_ASEC,
        fft_mode="distributed",
        **kwargs,
    )
    scale = np.abs(residual_rep).max()
    np.testing.assert_allclose(
        model_dist, model_rep, atol=2e-4 * scale
    )
    np.testing.assert_allclose(
        residual_dist, residual_rep, atol=2e-3 * scale
    )
