"""
Restoring beam fit and restored-image synthesis.
"""

import numpy as np

from ska_sdp_cip_tpu.models.restore import (
    fit_restoring_beam,
    gaussian_beam_kernel,
    restore_image,
)


def _gaussian_psf(npix, sigma_maj, sigma_min, angle):
    axis = np.arange(npix) - npix // 2
    xx, yy = np.meshgrid(axis, axis, indexing="ij")
    ca, sa = np.cos(angle), np.sin(angle)
    u = xx * ca + yy * sa
    v = -xx * sa + yy * ca
    return np.exp(-0.5 * ((u / sigma_maj) ** 2 + (v / sigma_min) ** 2))


def test_fit_recovers_gaussian_axes():
    psf = _gaussian_psf(128, 4.0, 2.0, 0.3)
    bmaj, bmin, angle = fit_restoring_beam(psf)
    assert abs(bmaj - 4.0) / 4.0 < 0.25
    assert abs(bmin - 2.0) / 2.0 < 0.25
    # angle modulo pi
    assert min(abs(angle - 0.3), abs(abs(angle - 0.3) - np.pi)) < 0.2


def test_restore_point_source():
    npix = 96
    psf = _gaussian_psf(npix, 3.0, 3.0, 0.0)
    model = np.zeros((npix, npix), np.float32)
    model[40, 60] = 2.0
    residual = np.zeros_like(model)

    restored = restore_image(model, residual, psf)
    # Peak of the restored source sits at the component with the
    # beam's unit peak preserved
    peak = np.unravel_index(np.argmax(restored), restored.shape)
    assert peak == (40, 60)
    assert abs(restored[40, 60] - 2.0) < 0.01
    # Total flux equals component flux times the FITTED beam integral
    from ska_sdp_cip_tpu.models.restore import fit_restoring_beam

    bmaj, bmin, angle = fit_restoring_beam(psf)
    kernel = gaussian_beam_kernel(bmaj, bmin, angle, 13)
    assert abs(restored.sum() - 2.0 * kernel.sum()) < 0.05 * kernel.sum()


def test_cli_writes_restored(dataset_path, tmp_path, monkeypatch):
    from ska_sdp_cip_tpu.apps.pipeline_app import run_program

    monkeypatch.chdir(tmp_path)
    out = tmp_path / "img.npy"
    run_program(
        [
            str(dataset_path),
            str(out),
            "-n",
            "96",
            "-p",
            "40.0",
            "--clean",
            "1",
            "--minor-iter",
            "10",
        ]
    )
    restored = np.load(tmp_path / "img.restored.npy")
    assert restored.shape == (96, 96)
    assert np.isfinite(restored).all()


def test_cli_algorithm_variants(dataset_path, tmp_path, monkeypatch):
    from ska_sdp_cip_tpu.apps.pipeline_app import run_program

    monkeypatch.chdir(tmp_path)
    for algorithm in ("multiscale", "fista"):
        out = tmp_path / f"img_{algorithm}.npy"
        run_program(
            [
                str(dataset_path),
                str(out),
                "-n",
                "96",
                "-p",
                "40.0",
                "--clean",
                "1",
                "--minor-iter",
                "20",
                "--algorithm",
                algorithm,
            ]
        )
        model = np.load(tmp_path / f"img_{algorithm}.model.npy")
        assert model.shape == (96, 96)
        assert np.isfinite(model).all()
