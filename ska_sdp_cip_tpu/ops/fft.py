"""
Complex-free 2-D FFT as real matrix products (four-step / Bailey FFT).

The axon TPU backend rejects every complex64 operation (UNIMPLEMENTED),
so the framework carries all spectral data as split (re, im) float32
pairs and performs DFTs with real matmuls on the MXU — which is also
where a TPU wants this work: for N = N1 * N2 the four-step
decomposition

    X[k1 + N1 k2] = sum_{n2} W_N^{n2 k1} W_{N2}^{n2 k2}
                    [ sum_{n1} x[n1 N2 + n2] W_{N1}^{n1 k1} ]

is two dense (N1, N1) / (N2, N2) matmul stages plus a twiddle —
O(N (N1 + N2)) work with tiny constant factors and perfect MXU tiling,
instead of a scalar butterfly network the VPU would crawl through.

Plans hold the cos/sin DFT factors and twiddles (f32); ``fft2_split``
applies both axes. An "xla" mode (jnp.fft on complex64) exists for
platforms with complex support and for cross-validation in tests.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax.numpy as jnp
import numpy as np

_HIGHEST = None  # set lazily to avoid importing jax at module import


def _precision():
    global _HIGHEST
    if _HIGHEST is None:
        import jax

        _HIGHEST = jax.lax.Precision.HIGHEST
    return _HIGHEST


def _near_square_factors(n: int) -> tuple[int, int]:
    """Factor n = n1 * n2 with n1 <= n2 as close to sqrt(n) as possible."""
    best = (1, n)
    for n1 in range(1, int(np.sqrt(n)) + 1):
        if n % n1 == 0:
            best = (n1, n // n1)
    return best


@dataclass(frozen=True)
class FFTPlan:
    """Four-step DFT factors for one axis length (host numpy, f32)."""

    n: int
    n1: int
    n2: int
    d1_cos: np.ndarray
    d1_sin: np.ndarray
    d2_cos: np.ndarray
    d2_sin: np.ndarray
    tw_cos: np.ndarray
    tw_sin: np.ndarray


def make_fft_plan(n: int) -> FFTPlan:
    """
    Build the factor matrices for a length-``n`` DFT with the *negative*
    exponent convention (numpy's forward fft). The inverse transform
    reuses the same plan with ``sign=+1`` (factors are conjugated by
    flipping the sine terms at apply time).
    """
    n1, n2 = _near_square_factors(n)

    # D1[k1, j1] = exp(-2 pi i j1 k1 / n1)   (applied from the left)
    a1 = 2.0 * np.pi * np.outer(np.arange(n1), np.arange(n1)) / n1
    # D2[j2, k2] = exp(-2 pi i j2 k2 / n2)   (applied from the right)
    a2 = 2.0 * np.pi * np.outer(np.arange(n2), np.arange(n2)) / n2
    # twiddle[k1, j2] = exp(-2 pi i j2 k1 / n)
    at = 2.0 * np.pi * np.outer(np.arange(n1), np.arange(n2)) / n

    return FFTPlan(
        n=n,
        n1=n1,
        n2=n2,
        d1_cos=np.cos(a1).astype(np.float32),
        d1_sin=np.sin(a1).astype(np.float32),
        d2_cos=np.cos(a2).astype(np.float32),
        d2_sin=np.sin(a2).astype(np.float32),
        tw_cos=np.cos(at).astype(np.float32),
        tw_sin=np.sin(at).astype(np.float32),
    )


def fft_plan_arrays(plan: FFTPlan, prefix: str = "fft") -> dict:
    """Plan factors as a dict of device-ready arrays."""
    return {
        f"{prefix}_d1_cos": jnp.asarray(plan.d1_cos),
        f"{prefix}_d1_sin": jnp.asarray(plan.d1_sin),
        f"{prefix}_d2_cos": jnp.asarray(plan.d2_cos),
        f"{prefix}_d2_sin": jnp.asarray(plan.d2_sin),
        f"{prefix}_tw_cos": jnp.asarray(plan.tw_cos),
        f"{prefix}_tw_sin": jnp.asarray(plan.tw_sin),
    }


def _cmatmul(ar, ai, br, bi, sign_b: float):
    """
    (ar + i ai) @ (br + sign_b * i bi) as four real matmuls (f32).
    ``sign_b = -1`` conjugates the right operand — used to flip the
    DFT direction without separate factor matrices.
    """
    precision = _precision()
    rr = jnp.matmul(ar, br, precision=precision)
    ii = jnp.matmul(ai, bi, precision=precision)
    ri = jnp.matmul(ar, bi, precision=precision)
    ir = jnp.matmul(ai, br, precision=precision)
    return rr - sign_b * ii, sign_b * ri + ir


def fft_last_axis(re, im, f, *, sign: int, prefix: str = "fft"):
    """
    DFT along the last axis of (..., n) split arrays. ``sign=-1`` is
    the forward (numpy fft) transform, ``sign=+1`` the unnormalized
    inverse (scale by 1/n yourself if needed). ``f`` is the dict from
    :func:`fft_plan_arrays`.
    """
    d1_cos = f[f"{prefix}_d1_cos"]
    d1_sin = f[f"{prefix}_d1_sin"]
    d2_cos = f[f"{prefix}_d2_cos"]
    d2_sin = f[f"{prefix}_d2_sin"]
    tw_cos = f[f"{prefix}_tw_cos"]
    tw_sin = f[f"{prefix}_tw_sin"]
    n1, n2 = d1_cos.shape[0], d2_cos.shape[0]
    n = n1 * n2
    s = float(sign)

    batch = re.shape[:-1]
    xr = re.reshape((-1, n1, n2))
    xi = im.reshape((-1, n1, n2))

    # Stage 1: A[k1, n2] = sum_{n1} D1[k1, n1] x[n1, n2]
    # (left-multiply within each batch element)
    precision = _precision()

    def lmat(cr, ci):
        # (n1, n1) @ (B, n1, n2): contract axis 1
        ar = jnp.einsum("kj,bjn->bkn", cr, xr, precision=precision)
        ai_ = jnp.einsum("kj,bjn->bkn", cr, xi, precision=precision)
        br = jnp.einsum("kj,bjn->bkn", ci, xr, precision=precision)
        bi = jnp.einsum("kj,bjn->bkn", ci, xi, precision=precision)
        # D1 = cos - sign*... : D1 = exp(sign * -? ...)
        return ar, ai_, br, bi

    # D1 = cos(a) + s_c * i sin(a) with s_c = sign (factors built with
    # the -2pi convention; sign=-1 keeps them, sign=+1 conjugates).
    # exp(sign * 2pi i ...)? Factors store angle a = +2pi jk/n so
    # D(sign)[j,k] = cos(a) + i sign * sin(... wait: forward (numpy)
    # uses exp(-i a) = cos(a) - i sin(a) => sign=-1 -> -sin.
    ar, ai_, br, bi = lmat(d1_cos, d1_sin)
    yr = ar - s * bi
    yi = ai_ + s * br

    # Twiddle: multiply by exp(sign * i * at[k1, j2])
    tr = tw_cos[None, :, :]
    ti = s * tw_sin[None, :, :]
    zr = yr * tr - yi * ti
    zi = yr * ti + yi * tr

    # Stage 2: C[k1, k2] = sum_{j2} z[k1, j2] D2[j2, k2]
    zr2 = zr.reshape((-1, n2))
    zi2 = zi.reshape((-1, n2))
    cr, ci2 = _cmatmul(zr2, zi2, d2_cos, d2_sin, sign_b=s)
    cr = cr.reshape((-1, n1, n2))
    ci2 = ci2.reshape((-1, n1, n2))

    # Output index is k1 + n1 * k2 -> transpose (k1, k2) -> (k2, k1)
    outr = jnp.swapaxes(cr, -1, -2).reshape(batch + (n,))
    outi = jnp.swapaxes(ci2, -1, -2).reshape(batch + (n,))
    return outr, outi


def fft2_split(re, im, f, *, sign: int, prefix: str = "fft"):
    """
    2-D DFT of split (re, im) square arrays via two last-axis passes
    with transposes. Unnormalized in both directions.
    """
    re, im = fft_last_axis(re, im, f, sign=sign, prefix=prefix)
    re = jnp.swapaxes(re, -1, -2)
    im = jnp.swapaxes(im, -1, -2)
    re, im = fft_last_axis(re, im, f, sign=sign, prefix=prefix)
    return jnp.swapaxes(re, -1, -2), jnp.swapaxes(im, -1, -2)
