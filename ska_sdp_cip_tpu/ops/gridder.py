"""
TPU-native wgridder: invert (visibilities -> dirty image) and predict
(image -> visibilities) measurement operators.

Replaces the reference's C++ ducc0 ``ms2dirty`` call
(reference: src/ska_sdp_cip/invert.py:152-184) with a jit-compiled XLA
program shaped for the TPU:

* **Gridding as matmuls.** For a block of B visibilities bound to one
  P x P grid patch, the scatter of separable-kernel outer products is
  exactly ``patch[r, c] = sum_k Ax[k, r] * val_k * Ay[k, c]`` — two real
  (P, B) @ (B, P) matrix products on the MXU, with ``Ax/Ay`` banded
  kernel matrices built densely on the VPU. No data-dependent scatter
  anywhere in the hot loop.
* **Improved w-stacking.** Visibilities are convolved onto w-planes
  with the same ES kernel (plane spacing from the plan), each plane is
  FFT'd and phased by its w-screen, and a single fused correction map
  (uv taper x w taper x 1/n) finishes the image.
* **Static shapes everywhere.** The plan provides per-plane
  active-block tables; the program is a ``scan`` over planes and a
  ``scan`` over block slots, masked — XLA sees fixed trip counts.

``predict`` is the exact adjoint (up to float32 rounding) built by
transposing every linear stage, which is what the major-cycle solver
needs for correct gradients. Accuracy contract: matches the explicit
DFT (ops/dft.py) to the plan's epsilon — the reference's own setting is
epsilon=1e-4 (reference: invert.py:179).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .kernels import correction_np, es_kernel_jnp
from .plan import GridderPlan, make_plan

SPEED_OF_LIGHT = 299792458.0

_HIGHEST = jax.lax.Precision.HIGHEST


def plan_device_arrays(plan: GridderPlan) -> dict:
    """
    Device-resident arrays of a plan (the non-static part of the
    gridding program's input), including precomputed image-domain maps:
    ``corr`` (fused uv-taper x w-taper x 1/n correction) and ``nm1s``
    (n(l,m) - 1 - n_mid, the w-screen argument).
    """
    npix, ngrid = plan.num_pixels, plan.ngrid

    # 1-D uv correction, host float64 for accuracy
    k = (np.arange(npix) - npix // 2) / ngrid
    cuv = correction_np(k, plan.support, plan.beta)
    corr = np.multiply.outer(cuv, cuv)

    axis = (np.arange(npix) - npix // 2) * plan.pixel_size_lm
    r2 = np.add.outer(axis**2, axis**2)
    nm1 = -r2 / (1.0 + np.sqrt(np.maximum(1.0 - r2, 0.0)))
    if plan.wstacking:
        cw = correction_np(
            plan.dw * (nm1 - plan.n_mid), plan.support, plan.beta
        )
        corr = corr * cw * (nm1 + 1.0)
    inv_corr = 1.0 / corr

    arrays = {
        "order": jnp.asarray(plan.order),
        "flip": jnp.asarray(plan.flip),
        "x0": jnp.asarray(plan.x0),
        "y0": jnp.asarray(plan.y0),
        "fx": jnp.asarray(plan.fx),
        "fy": jnp.asarray(plan.fy),
        "ws": jnp.asarray(plan.ws),
        "block_start": jnp.asarray(plan.block_start),
        "block_len": jnp.asarray(plan.block_len),
        "block_ox": jnp.asarray(plan.block_ox),
        "block_oy": jnp.asarray(plan.block_oy),
        "active_table": jnp.asarray(plan.active_table),
        "plane_w": jnp.asarray(plan.plane_w),
        "inv_corr": jnp.asarray(inv_corr, dtype=jnp.float32),
        "nm1s": jnp.asarray(nm1 - plan.n_mid, dtype=jnp.float32),
    }
    return arrays


def _prepare_sorted_vis(plan: GridderPlan, arrays: dict, vis_flat):
    """Gather to plan order, conjugate flipped rows, apply w pre-phase."""
    vis = jnp.asarray(vis_flat, dtype=jnp.complex64)[arrays["order"]]
    vis = jnp.where(arrays["flip"], jnp.conj(vis), vis)
    if plan.wstacking:
        phase = (-2.0 * np.pi * plan.n_mid) * arrays["ws"]
        vis = vis * jnp.exp(1j * phase.astype(jnp.float32))
    return vis


def _kernel_matrices(plan: GridderPlan, arrays: dict, b, ox, oy):
    """
    Banded kernel matrices Ax, Ay of shape (B, P) for block slot ``b``,
    plus per-visibility lane data (start index, lane mask, w coords).
    """
    P, B, W = plan.patch, plan.block, plan.support
    s = arrays["block_start"][b]
    length = arrays["block_len"][b]

    x0 = lax.dynamic_slice(arrays["x0"], (s,), (B,))
    y0 = lax.dynamic_slice(arrays["y0"], (s,), (B,))
    fx = lax.dynamic_slice(arrays["fx"], (s,), (B,))
    fy = lax.dynamic_slice(arrays["fy"], (s,), (B,))
    ws = lax.dynamic_slice(arrays["ws"], (s,), (B,))

    iota = jnp.arange(P, dtype=jnp.int32)
    # Footprint-relative cell index (patch cell minus footprint start):
    # exact in int32, so kernel arguments keep full f32 precision on
    # arbitrarily large grids.
    rx = iota[None, :] - (x0 - ox)[:, None]
    ry = iota[None, :] - (y0 - oy)[:, None]
    inv_half = jnp.float32(2.0 / W)
    zx = (rx.astype(jnp.float32) - fx[:, None]) * inv_half
    zy = (ry.astype(jnp.float32) - fy[:, None]) * inv_half
    ax = es_kernel_jnp(zx, plan.beta)
    ay = es_kernel_jnp(zy, plan.beta)

    lane = jnp.arange(B, dtype=jnp.int32) < length
    return ax, ay, s, lane, ws


def _fold_wraps(plan: GridderPlan, grid):
    """Fold the padded alloc frame back onto the periodic N x N grid."""
    N, W = plan.ngrid, plan.support
    g = grid[W : W + N, :]
    g = g.at[0:W, :].add(grid[W + N : N + 2 * W, :])
    g = g.at[N - W : N, :].add(grid[0:W, :])
    g2 = g[:, W : W + N]
    g2 = g2.at[:, 0:W].add(g[:, W + N : N + 2 * W])
    g2 = g2.at[:, N - W : N].add(g[:, 0:W])
    return g2


def _unfold_wraps(plan: GridderPlan, g):
    """Adjoint of :func:`_fold_wraps`: duplicate wrap edges into alloc."""
    N, W, NA = plan.ngrid, plan.support, plan.nalloc
    gx = jnp.zeros((NA, N), dtype=g.dtype)
    gx = gx.at[W : W + N, :].set(g)
    gx = gx.at[W + N : N + 2 * W, :].set(g[0:W, :])
    gx = gx.at[0:W, :].set(g[N - W : N, :])
    alloc = jnp.zeros((NA, NA), dtype=g.dtype)
    alloc = alloc.at[:, W : W + N].set(gx)
    alloc = alloc.at[:, W + N : N + 2 * W].set(gx[:, 0:W])
    alloc = alloc.at[:, 0:W].set(gx[:, N - W : N])
    return alloc


def build_invert(plan: GridderPlan):
    """
    Returns a jitted ``invert(arrays, vis_flat) -> image`` computing the
    unnormalized dirty image (float32, (npix, npix)) from flattened
    (row * chan) weighted Stokes-I visibilities. Divide by the total
    effective weight for fluxes (reference: invert.py:119-149).
    """
    P, B, W = plan.patch, plan.block, plan.support
    N, NA, npix = plan.ngrid, plan.nalloc, plan.num_pixels
    crop0 = (N - npix) // 2
    inv_whalf = 2.0 / (W * plan.dw)

    @jax.jit
    def invert(arrays: dict, vis_flat):
        vis = _prepare_sorted_vis(plan, arrays, vis_flat)
        vis_re = jnp.real(vis)
        vis_im = jnp.imag(vis)

        def plane_body(image_accum, p):
            w_p = arrays["plane_w"][p]
            active_row = arrays["active_table"][p]

            def block_body(carry, i):
                grid_re, grid_im = carry
                bidx = active_row[i]
                valid = bidx >= 0
                b = jnp.maximum(bidx, 0)
                ox = arrays["block_ox"][b]
                oy = arrays["block_oy"][b]
                ax, ay, s, lane, ws = _kernel_matrices(
                    plan, arrays, b, ox, oy
                )
                if plan.wstacking:
                    kw = es_kernel_jnp((w_p - ws) * inv_whalf, plan.beta)
                else:
                    kw = jnp.ones_like(ws)
                amp = jnp.where(lane & valid, kw, 0.0)
                val_re = lax.dynamic_slice(vis_re, (s,), (B,)) * amp
                val_im = lax.dynamic_slice(vis_im, (s,), (B,)) * amp

                patch_re = jnp.matmul(
                    ax.T, val_re[:, None] * ay, precision=_HIGHEST
                )
                patch_im = jnp.matmul(
                    ax.T, val_im[:, None] * ay, precision=_HIGHEST
                )
                cur_re = lax.dynamic_slice(grid_re, (ox, oy), (P, P))
                cur_im = lax.dynamic_slice(grid_im, (ox, oy), (P, P))
                grid_re = lax.dynamic_update_slice(
                    grid_re, cur_re + patch_re, (ox, oy)
                )
                grid_im = lax.dynamic_update_slice(
                    grid_im, cur_im + patch_im, (ox, oy)
                )
                return (grid_re, grid_im), None

            grid0 = (
                jnp.zeros((NA, NA), jnp.float32),
                jnp.zeros((NA, NA), jnp.float32),
            )
            (grid_re, grid_im), _ = lax.scan(
                block_body, grid0, jnp.arange(plan.max_active)
            )
            grid = _fold_wraps(
                plan, grid_re.astype(jnp.complex64) + 1j * grid_im
            )
            img = jnp.fft.fftshift(
                jnp.fft.ifft2(jnp.fft.ifftshift(grid))
            )[crop0 : crop0 + npix, crop0 : crop0 + npix] * (N * N)
            if plan.wstacking:
                img = img * jnp.exp(
                    (-2j * np.pi * w_p) * arrays["nm1s"]
                )
            return image_accum + img, None

        image, _ = lax.scan(
            plane_body,
            jnp.zeros((npix, npix), jnp.complex64),
            jnp.arange(plan.nplanes),
        )
        return jnp.real(image) * arrays["inv_corr"]

    return invert


def build_predict(plan: GridderPlan):
    """
    Returns a jitted ``predict(arrays, image) -> vis_flat``: the exact
    adjoint of :func:`build_invert`'s operator, i.e. the degridding /
    forward model (``dirty2ms`` analog) producing flattened
    (row * chan) complex64 visibilities from a real image.
    """
    P, B, W = plan.patch, plan.block, plan.support
    N, npix = plan.ngrid, plan.num_pixels
    crop0 = (N - npix) // 2
    inv_whalf = 2.0 / (W * plan.dw)
    num_slots = plan.num_vis
    num_out = plan.num_vis_data

    @jax.jit
    def predict(arrays: dict, image):
        img0 = jnp.asarray(image, jnp.float32) * arrays["inv_corr"]

        def plane_body(vis_sorted, p):
            w_p = arrays["plane_w"][p]
            active_row = arrays["active_table"][p]

            img_p = img0.astype(jnp.complex64)
            if plan.wstacking:
                img_p = img_p * jnp.exp(
                    (2j * np.pi * w_p) * arrays["nm1s"]
                )
            padded = jnp.zeros((N, N), jnp.complex64)
            padded = lax.dynamic_update_slice(
                padded, img_p, (crop0, crop0)
            )
            grid = jnp.fft.fftshift(
                jnp.fft.fft2(jnp.fft.ifftshift(padded))
            )
            alloc = _unfold_wraps(plan, grid)
            alloc_re = jnp.real(alloc)
            alloc_im = jnp.imag(alloc)

            def block_body(vis_sorted, i):
                bidx = active_row[i]
                valid = bidx >= 0
                b = jnp.maximum(bidx, 0)
                ox = arrays["block_ox"][b]
                oy = arrays["block_oy"][b]
                ax, ay, s, lane, ws = _kernel_matrices(
                    plan, arrays, b, ox, oy
                )
                if plan.wstacking:
                    kw = es_kernel_jnp((w_p - ws) * inv_whalf, plan.beta)
                else:
                    kw = jnp.ones_like(ws)
                amp = jnp.where(lane & valid, kw, 0.0)

                patch_re = lax.dynamic_slice(alloc_re, (ox, oy), (P, P))
                patch_im = lax.dynamic_slice(alloc_im, (ox, oy), (P, P))
                tmp_re = jnp.matmul(ax, patch_re, precision=_HIGHEST)
                tmp_im = jnp.matmul(ax, patch_im, precision=_HIGHEST)
                contrib = (
                    jnp.sum(tmp_re * ay, axis=1)
                    + 1j * jnp.sum(tmp_im * ay, axis=1)
                ) * amp
                cur = lax.dynamic_slice(vis_sorted, (s,), (B,))
                return (
                    lax.dynamic_update_slice(vis_sorted, cur + contrib, (s,)),
                    None,
                )

            vis_sorted, _ = lax.scan(
                block_body, vis_sorted, jnp.arange(plan.max_active)
            )
            return vis_sorted, None

        vis_sorted, _ = lax.scan(
            plane_body,
            jnp.zeros((num_slots,), jnp.complex64),
            jnp.arange(plan.nplanes),
        )

        if plan.wstacking:
            phase = (2.0 * np.pi * plan.n_mid) * arrays["ws"]
            vis_sorted = vis_sorted * jnp.exp(
                1j * phase.astype(jnp.float32)
            )
        vis_sorted = jnp.where(
            arrays["flip"], jnp.conj(vis_sorted), vis_sorted
        )
        # Padded slots carry order == num_vis_data and are dropped.
        return (
            jnp.zeros((num_out,), jnp.complex64)
            .at[arrays["order"]]
            .set(vis_sorted, mode="drop")
        )

    return predict


# ----------------------------------------------------------------------
# One-shot convenience wrappers (ms2dirty / dirty2ms analogs)
# ----------------------------------------------------------------------


def dirty_image(
    uvw,
    channel_frequencies,
    visibilities,
    weights,
    num_pixels: int,
    pixel_size_lm: float,
    *,
    epsilon: float = 1e-4,
    do_wstacking: bool = True,
) -> np.ndarray:
    """
    Unnormalized dirty image of weighted visibilities — the drop-in
    analog of ducc0's ``ms2dirty`` as the reference calls it
    (reference: invert.py:170-183). ``visibilities``/``weights`` have
    shape (nrow, nchan); returns a float32 (npix, npix) numpy array.
    """
    plan = make_plan(
        uvw,
        channel_frequencies,
        num_pixels,
        pixel_size_lm,
        epsilon=epsilon,
        do_wstacking=do_wstacking,
    )
    arrays = plan_device_arrays(plan)
    invert = build_invert(plan)
    weighted = (
        np.asarray(visibilities, np.complex64)
        * np.asarray(weights, np.float32)
    ).ravel()
    return np.asarray(invert(arrays, jnp.asarray(weighted)))


def predict_visibilities(
    uvw,
    channel_frequencies,
    image,
    pixel_size_lm: float,
    *,
    epsilon: float = 1e-4,
    do_wstacking: bool = True,
) -> np.ndarray:
    """
    Model visibilities from an image (``dirty2ms`` analog, the adjoint
    of :func:`dirty_image`). Returns complex64 (nrow, nchan).
    """
    image = np.asarray(image)
    num_pixels = image.shape[0]
    plan = make_plan(
        uvw,
        channel_frequencies,
        num_pixels,
        pixel_size_lm,
        epsilon=epsilon,
        do_wstacking=do_wstacking,
    )
    arrays = plan_device_arrays(plan)
    predict = build_predict(plan)
    vis_flat = np.asarray(predict(arrays, jnp.asarray(image)))
    return vis_flat.reshape(len(uvw), len(channel_frequencies))
