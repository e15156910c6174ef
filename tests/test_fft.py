"""
Matmul four-step FFT against numpy's FFT: both axis passes, both
signs, shifted factors, and the in/out crop pruning — the complex-free
transform every invert/predict rides on (ops/fft.py).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ska_sdp_cip_tpu.ops.fft import (
    fft2_split,
    fft_first_axis,
    fft_last_axis,
    fft_plan_arrays,
    make_fft_plan,
)

N = 160  # = 10 * 16, exercises unequal four-step factors


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(13)
    x = (
        rng.normal(size=(N, N)) + 1j * rng.normal(size=(N, N))
    ).astype(np.complex64)
    return x


def _tol(ref):
    return 1e-5 * np.abs(ref).max()


@pytest.mark.parametrize("sign", [-1, +1])
def test_fft2_matches_numpy(data, sign):
    f = fft_plan_arrays(make_fft_plan(N))
    re, im = fft2_split(
        jnp.asarray(data.real), jnp.asarray(data.imag), f, sign=sign
    )
    got = np.asarray(re) + 1j * np.asarray(im)
    ref = np.fft.fft2(data) if sign == -1 else np.fft.ifft2(data) * N**2
    np.testing.assert_allclose(got, ref, atol=_tol(ref))


@pytest.mark.parametrize("sign", [-1, +1])
def test_shifted_fft2_matches_numpy(data, sign):
    f = fft_plan_arrays(make_fft_plan(N, shifted=True))
    re, im = fft2_split(
        jnp.asarray(data.real), jnp.asarray(data.imag), f, sign=sign
    )
    got = np.asarray(re) + 1j * np.asarray(im)
    shifted_in = np.fft.ifftshift(data)
    ref = np.fft.fftshift(
        np.fft.fft2(shifted_in)
        if sign == -1
        else np.fft.ifft2(shifted_in) * N**2
    )
    np.testing.assert_allclose(got, ref, atol=_tol(ref))


def test_out_crop_matches_full(data):
    f = fft_plan_arrays(make_fft_plan(N, shifted=True))
    c0, size = (N - N // 2) // 2, N // 2
    full_re, full_im = fft_last_axis(
        jnp.asarray(data.real), jnp.asarray(data.imag), f, sign=+1
    )
    crop_re, crop_im = fft_last_axis(
        jnp.asarray(data.real),
        jnp.asarray(data.imag),
        f,
        sign=+1,
        out_crop=(c0, size),
    )
    np.testing.assert_allclose(
        np.asarray(crop_re),
        np.asarray(full_re)[:, c0 : c0 + size],
        atol=_tol(np.asarray(full_re)),
    )
    np.testing.assert_allclose(
        np.asarray(crop_im),
        np.asarray(full_im)[:, c0 : c0 + size],
        atol=_tol(np.asarray(full_im)),
    )


def test_in_crop_matches_zero_padded(data):
    f = fft_plan_arrays(make_fft_plan(N, shifted=True))
    c0, size = (N - N // 2) // 2, N // 2
    padded = np.zeros((N, N), np.complex64)
    padded[c0 : c0 + size] = data[c0 : c0 + size]
    full_re, full_im = fft_first_axis(
        jnp.asarray(padded.real), jnp.asarray(padded.imag), f, sign=-1
    )
    crop_re, crop_im = fft_first_axis(
        jnp.asarray(padded.real[c0 : c0 + size]),
        jnp.asarray(padded.imag[c0 : c0 + size]),
        f,
        sign=-1,
        in_crop=(c0, size),
    )
    np.testing.assert_allclose(
        np.asarray(crop_re), np.asarray(full_re), atol=_tol(full_re)
    )
    np.testing.assert_allclose(
        np.asarray(crop_im), np.asarray(full_im), atol=_tol(full_im)
    )
