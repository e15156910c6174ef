"""
Exponential-of-semicircle (ES) gridding kernel and its Fourier-domain
correction.

This is the same kernel family the reference's compute engine uses (the
ducc0 "improved w-stacking" wgridder invoked at
reference: src/ska_sdp_cip/invert.py:170-183 with epsilon=1e-4): the
prolate-approximating kernel ``phi(z) = exp(beta * (sqrt(1 - z^2) - 1))``
on ``|z| <= 1``. Accuracy is set by the support ``W`` (in grid cells)
and the oversampling factor ``sigma`` of the padded uv-grid.

The image-domain correction ("grid correction" / taper) is the
continuous Fourier transform of the kernel, evaluated by Gauss-Legendre
quadrature:

    c(k) = integral_{-W/2}^{W/2} phi(2 xi / W) * cos(2 pi xi k) d xi

with ``xi`` in grid cells and ``k`` the image coordinate in units of the
grid period (``k = (pixel - npix/2) / ngrid`` for the u/v axes, and
``k = dw * (n(l,m) - 1 - n_mid)`` for the w "axis" in improved
w-stacking). Everything here is cheap host-side setup math (float64
numpy) plus jnp-evaluable forms for on-device use.
"""

from __future__ import annotations

import numpy as np

try:  # jnp form used inside jitted gridding code
    import jax.numpy as jnp
except ImportError:  # pragma: no cover - jax is a hard dep in practice
    jnp = None


def kernel_support_for_epsilon(epsilon: float, sigma: float = 2.0) -> int:
    """
    Choose the kernel support (cells per axis) for a target gridding
    accuracy ``epsilon`` at oversampling ``sigma``. The ES kernel's
    aliasing error decays ~exp(-pi W sqrt(1 - 1/sigma)) per the
    FINUFFT/ducc0 analysis; normalized so sigma=2 keeps the historical
    one-decade-per-cell rule (reference epsilon=1e-4 -> W=6). Below
    sigma=1.6 one extra guard cell compensates the float32 noise
    amplified by the deeper taper-edge division (measured against the
    DFT oracle: sigma=1.5 needs W=8 for 1e-4, where the asymptotic
    rule alone gives 7).
    """
    if not 0 < epsilon < 1:
        raise ValueError("epsilon must be in (0, 1)")
    if sigma <= 1.05:
        raise ValueError("sigma must exceed 1.05")
    digits = -np.log10(epsilon)
    rate = np.sqrt(2.0 * (1.0 - 1.0 / sigma))  # decades/cell vs sigma=2
    support = int(np.ceil(digits / rate)) + 2
    if sigma < 1.6:
        support += 1
    return int(np.clip(support, 4, 16))


def es_beta(support: int, sigma: float = 2.0) -> float:
    """
    ES kernel shape parameter. The near-optimal choice for oversampling
    ``sigma`` is ``beta = gamma * pi * W * (1 - 1/(2 sigma))`` with
    ``gamma ~ 0.98`` (FINUFFT-style tuning; ~2.31*W at sigma=2).
    """
    return 0.98 * np.pi * support * (1.0 - 1.0 / (2.0 * sigma))


def es_kernel_np(z: np.ndarray, beta: float) -> np.ndarray:
    """ES kernel on |z|<=1, zero outside (numpy, float64)."""
    z = np.asarray(z)
    inside = np.abs(z) <= 1.0
    arg = np.sqrt(np.maximum(1.0 - z * z, 0.0)) - 1.0
    return np.where(inside, np.exp(beta * arg), 0.0)


def es_kernel_jnp(z, beta: float):
    """
    ES kernel on |z|<1, zero outside (jnp, works under jit).

    This sits on the VPU critical path of the gridding kernels (two
    (patch, block) evaluations per block-step), so it is written for
    minimum op count: the inside test reuses ``1 - z*z`` instead of a
    separate ``|z|`` pass, and the exponent is an fma
    (``beta*s - beta``). At ``|z| == 1`` exactly this returns 0 where
    the closed form gives ``exp(-beta)`` ~ 1e-6 — below the kernel's
    own truncation floor.
    """
    t = 1.0 - z * z
    s = jnp.sqrt(jnp.maximum(t, 0.0))
    return jnp.where(t > 0.0, jnp.exp(beta * s - beta), 0.0)


def gauss_legendre_kernel_quadrature(
    support: int, beta: float, num_points: int = 0
) -> tuple[np.ndarray, np.ndarray]:
    """
    Quadrature rule for the kernel's Fourier transform on the half
    interval, exploiting evenness:

        c(k) = W * sum_j weights[j] * cos(2 pi (W/2) nodes[j] * k)

    Returns ``(nodes, weights)`` with ``weights`` already folded with the
    kernel values ``phi(nodes)`` and Gauss-Legendre weights, float64.
    """
    if num_points <= 0:
        num_points = 2 * support + 8
    nodes, gl_weights = np.polynomial.legendre.leggauss(num_points)
    # Map from [-1, 1] to [0, 1]
    nodes = 0.5 * (nodes + 1.0)
    gl_weights = 0.5 * gl_weights
    return nodes, gl_weights * es_kernel_np(nodes, beta)


def correction_np(
    k: np.ndarray, support: int, beta: float, num_points: int = 0
) -> np.ndarray:
    """
    Fourier-domain correction ``c(k)`` (numpy float64). ``k`` in units
    of the grid period; ``c(0) = integral phi``.
    """
    nodes, folded = gauss_legendre_kernel_quadrature(support, beta, num_points)
    k = np.asarray(k, dtype=np.float64)
    angles = 2.0 * np.pi * (support / 2.0) * np.multiply.outer(k, nodes)
    return support * (np.cos(angles) @ folded)


def correction_jnp(k, nodes, folded, support: int):
    """
    Fourier-domain correction ``c(k)`` evaluated on device (jnp) with a
    precomputed quadrature rule — used for the per-pixel w correction
    where ``k`` is a 2-D array.
    """
    angles = (
        2.0 * jnp.pi * (support / 2.0) * k[..., None] * nodes[None, :]
    )
    return support * jnp.sum(jnp.cos(angles) * folded[None, :], axis=-1)
