"""
TPU-native wgridder: invert (visibilities -> dirty image) and predict
(image -> visibilities) measurement operators.

Replaces the reference's C++ ducc0 ``ms2dirty`` call
(reference: src/ska_sdp_cip/invert.py:152-184) with a jit-compiled XLA
program shaped for the TPU:

* **Gridding as matmuls.** For a block of B visibilities bound to one
  P x P grid patch, the scatter of separable-kernel outer products is
  exactly ``patch[r, c] = sum_k Ax[k, r] * val_k * Ay[k, c]`` — real
  (P, B) @ (B, P) matrix products on the MXU, with ``Ax/Ay`` banded
  kernel matrices built densely on the VPU. No data-dependent scatter
  anywhere in the hot loop.
* **Complex-free throughout.** The TPU backend here has no complex
  support, so all spectral data is split (re, im) float32 and the
  FFT itself is the four-step matmul DFT (ops/fft.py) — which also
  happens to be the MXU-native way to do FFTs.
* **Improved w-stacking.** Visibilities are convolved onto w-planes
  with the same ES kernel (plane spacing from the plan), each plane is
  FFT'd and phased by its w-screen (only the real part is accumulated
  across planes), and a single fused correction map (uv taper x w
  taper x 1/n) finishes the image.
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

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .fft import fft_first_axis, fft_last_axis, make_fft_plan
from .kernels import es_kernel_jnp
from .plan import GridderPlan, make_plan

SPEED_OF_LIGHT = 299792458.0

_HIGHEST = jax.lax.Precision.HIGHEST

#: Blocks processed per scan step: their patch matmuls run as one
#: batched MXU contraction; their grid updates are a short inner loop.
#: Amortizes scan-step overhead ~G-fold.
BLOCK_GROUP = int(__import__("os").environ.get("CIP_BLOCK_GROUP", "8"))

#: Skip fully-inactive chunks with lax.cond. Tunable because a cond
#: wrapping the grid carry can force XLA to copy it (perf experiment
#: knob; masked work is always correct either way).
SKIP_INACTIVE = (
    __import__("os").environ.get("CIP_SKIP_INACTIVE", "1") == "1"
)


def _maybe_cond(pred, run, carry):
    if SKIP_INACTIVE:
        return lax.cond(pred, run, lambda c: c, carry)
    return run(carry)


def _padded_active(plan: GridderPlan) -> int:
    """Active-table width padded to a whole number of block groups."""
    return -(-plan.max_active // BLOCK_GROUP) * BLOCK_GROUP


def split_complex(vis) -> tuple:
    """Host-side split of a complex array into (re, im) float32."""
    vis = np.asarray(vis)
    return (
        np.ascontiguousarray(vis.real, dtype=np.float32),
        np.ascontiguousarray(vis.imag, dtype=np.float32),
    )


def _geometry_maps(plan: GridderPlan, arrays: dict) -> tuple:
    """
    Image-domain geometry maps ``(inv_corr, nm1s)``: the fused
    uv-taper x w-taper x 1/n correction and n(l,m) - 1 - n_mid (the
    w-screen argument). Traceable — called INSIDE the jitted
    invert/predict programs so the maps cost a few ms of VPU time per
    call instead of a whole extra remote compile + O(npix^2) staging
    (a separate jitted builder added ~4 minutes of relay compile to
    time-to-first-image; host-numpy quadrature took minutes at
    production sizes).
    """
    npix, ngrid = plan.num_pixels, plan.ngrid
    nodes = arrays["quad_nodes"]
    folded = arrays["quad_folded"]
    support = plan.support

    def correction(k):
        angles = (
            (2.0 * np.pi * (support / 2.0)) * k[..., None] * nodes
        )
        return support * jnp.sum(jnp.cos(angles) * folded, axis=-1)

    pix = jnp.arange(npix, dtype=jnp.float32) - npix // 2
    cuv = correction(pix / ngrid)
    corr = jnp.outer(cuv, cuv)
    axis = pix * plan.pixel_size_lm
    r2 = axis[:, None] ** 2 + axis[None, :] ** 2
    nm1 = -r2 / (1.0 + jnp.sqrt(jnp.maximum(1.0 - r2, 0.0)))
    if plan.wstacking:
        cw = correction(plan.dw * (nm1 - plan.n_mid))
        corr = corr * cw * (nm1 + 1.0)
    return 1.0 / corr, nm1 - plan.n_mid


def _quad_arrays(plan: GridderPlan) -> dict:
    """The (tiny) staged quadrature rule `_geometry_maps` reads."""
    return {
        "quad_nodes": plan.quad_nodes.astype(np.float32),
        "quad_folded": plan.quad_folded.astype(np.float32),
    }


def compute_geometry_maps(plan: GridderPlan) -> dict:
    """
    Standalone device evaluation of the geometry maps (as a dict) —
    kept for tests and host-side consumers; the hot paths compute the
    maps inline inside their own jitted programs via
    :func:`_geometry_maps` and never stage them.
    """
    arrays = {
        key: jnp.asarray(value)
        for key, value in _quad_arrays(plan).items()
    }
    inv_corr, nm1s = jax.jit(
        lambda a: _geometry_maps(plan, a)
    )(arrays)
    return {"inv_corr": inv_corr, "nm1s": nm1s}


def plan_host_arrays(
    plan: GridderPlan,
    *,
    gridder: str | None = None,
    slot_mode: bool = False,
    include_packed: bool = True,
) -> dict:
    """
    Host (numpy) arrays of a plan — the per-visibility/per-block part
    of the gridding program's input plus the matmul-FFT factors for the
    padded grid size. Cheap (no O(npix^2) work); the image-domain maps
    are device-computed by :func:`compute_geometry_maps`.

    In Pallas mode (the resolved default on accelerators) the per-slot
    coordinate columns and active tables that only the XLA fallback
    consumes are omitted — at production scale they are GBs of
    transfer/HBM the kernels never read.

    ``slot_mode=True`` additionally drops the data-order <-> slot-order
    transform columns (order, flip_sign, phase_cos, phase_sin): the
    slot-space operators (``build_invert(..., slot_input=True)`` /
    ``build_predict(..., slot_output=True)``) never read them on
    device, and they are ~115 MB of staging per 7M-slot plan. Host
    staging still gets them from :func:`plan_order_host`.
    """
    # Static per-slot w-shift phase factors (exp(-i 2 pi n_mid w_s))
    # and flip signs: precomputed by the native planner's export pass
    # when available, else one numpy pass (plan_order_host).
    arrays = {} if slot_mode else dict(plan_order_host(plan))
    arrays.update({
        "block_oy": plan.block_oy,
        "plane_w": plan.plane_w,
        # Strip-kernel step program (ops/plan.py:build_step_tables)
        "step_val": plan.step_val,
        "step_aux": plan.step_aux,
        "step_aux2": plan.step_aux2,
        "step_count": plan.step_count,
        "first_block": plan.first_block,
        "last_blocks": plan.last_blocks,
    })
    arrays.update(_quad_arrays(plan))
    if plan.plane_group > 1:
        # (num_groups, G) plane w's; a ragged final group is padded
        # with would-be planes >= nplanes, which lie outside every
        # block's ES window (zero contributions by construction).
        wg = plan.w0 + plan.dw * np.arange(
            plan.plane_group * plan.num_groups, dtype=np.float64
        )
        arrays["plane_wg"] = wg.astype(np.float32).reshape(
            -1, plan.plane_group
        )
    if resolve_gridder_mode(gridder) == "xla":
        if plan.x0 is None:
            raise ValueError(
                "plan was built without per-slot coordinate columns "
                "(export_coords=False, the Pallas default on "
                "accelerators); rebuild with "
                "make_plan(..., export_coords=True) to run the XLA "
                "gridder"
            )
        arrays.update(
            {
                "ws": plan.ws,
                "x0": plan.x0,
                "y0": plan.y0,
                "fx": plan.fx,
                "fy": plan.fy,
                "block_start": plan.block_start,
                "block_len": plan.block_len,
                "block_ox": plan.block_ox,
                "active_table": np.pad(
                    plan.active_table,
                    (
                        (0, 0),
                        (0, _padded_active(plan) - plan.max_active),
                    ),
                    constant_values=-1,
                ),
                "active_count": np.sum(
                    plan.active_table >= 0, axis=1
                ).astype(np.int32),
            }
        )
    if include_packed:
        if plan.packed is not None:
            packed4 = plan.packed
        else:
            from .pallas_gridder import pack_plan_columns

            packed4 = pack_plan_columns(plan)
        # Stage only the 3 per-slot rows (xpos, ypos, ws): the
        # block-length row is a per-BLOCK broadcast, rebuilt on device
        # from the ~KB block_len table (_kernel_dma_rows) — ~25% less
        # plan staging through the relay per 7M-slot plan.
        arrays["packed"] = packed4[:3]
    arrays["blk_lenf"] = plan.block_len.astype(np.float32)
    # Shifted factors: fftshift/ifftshift ride inside the DFT
    # matrices instead of costing full-array roll passes.
    fft_plan = make_fft_plan(plan.ngrid, shifted=True)
    arrays.update(
        {
            "fft_d1_cos": fft_plan.d1_cos,
            "fft_d1_sin": fft_plan.d1_sin,
            "fft_d2_cos": fft_plan.d2_cos,
            "fft_d2_sin": fft_plan.d2_sin,
            "fft_tw_cos": fft_plan.tw_cos,
            "fft_tw_sin": fft_plan.tw_sin,
        }
    )
    # Fused-Pallas FFT factors (~1.5 MB) whenever the sizes are
    # lane-aligned, so a build may select CIP_FFT_IMPL=pallas without
    # re-staging: "fftp" = invert's inverse transform (out-cropped),
    # "fftq" = predict's forward transform (in-cropped).
    if plan.ngrid % 128 == 0 and plan.num_pixels % 128 == 0:
        from .fft_pallas import fused_pass_host_arrays

        arrays.update(
            fused_pass_host_arrays(
                fft_plan, _fused_fft_meta(plan), sign=+1, prefix="fftp"
            )
        )
        arrays.update(
            fused_pass_host_arrays(
                fft_plan,
                _fused_fft_meta_ic(plan),
                sign=-1,
                prefix="fftq",
            )
        )
    return arrays


def _kernel_dma_rows(plan: GridderPlan, arrays: dict, re=None, im=None):
    """
    Assemble the Pallas kernels' (8, V) DMA layout on device: the 3
    staged per-slot plan rows (xpos, ypos, ws), the block-length row
    broadcast from the tiny per-block ``blk_lenf`` table (slots are
    laid out as exactly ``block`` lanes per block), the split
    visibilities for the grid direction (degrid never reads rows 4-7),
    and alignment padding to the 8-sublane tile. One fused HBM
    materialization per call.
    """
    packed = arrays["packed"]
    num_v = packed.shape[1]
    lenf = jnp.broadcast_to(
        arrays["blk_lenf"][:, None],
        (arrays["blk_lenf"].shape[0], plan.block),
    ).reshape(-1)[:num_v][None]
    rows = [packed, lenf]
    if re is None:
        rows.append(jnp.zeros((4, num_v), jnp.float32))
    else:
        rows.extend(
            [re[None], im[None], jnp.zeros((2, num_v), jnp.float32)]
        )
    return jnp.concatenate(rows, axis=0)


def plan_device_arrays(
    plan: GridderPlan, *, slot_mode: bool = False
) -> dict:
    """
    Device-resident gridding-program inputs (pure staging — the
    image-domain geometry maps are computed inside the jitted
    invert/predict programs from the staged quadrature rule).
    ``slot_mode`` as in :func:`plan_host_arrays`. Transfers go through
    concurrent chunked streams (utils/staging.py): the relay's
    single-stream bandwidth is ~2.2x lower and serial per-array
    latency dominates a ~25-array dict.
    """
    from ..utils.staging import device_put_parallel

    return device_put_parallel(
        plan_host_arrays(plan, slot_mode=slot_mode)
    )


def plan_device_arrays_host(plan: GridderPlan) -> dict:
    """
    Backwards-compatible full host dict (includes geometry maps pulled
    back from device). Prefer :func:`plan_host_arrays` +
    :func:`compute_geometry_maps`.
    """
    arrays = plan_host_arrays(plan)
    arrays.update(
        {
            key: np.asarray(value)
            for key, value in compute_geometry_maps(plan).items()
        }
    )
    return arrays


def plan_order_host(plan: GridderPlan) -> dict:
    """
    Numpy (order, flip_sign, phase_cos, phase_sin) of a plan — the
    static data-order -> slot-order transform (gather, conjugate flip,
    w-shift pre-phase) as host arrays, shared by device staging and
    :func:`stage_slot_vis`.
    """
    from .. import native as _native

    if plan.phase_cos is not None:
        phase_cos, phase_sin = plan.phase_cos, plan.phase_sin
    elif not plan.wstacking:
        # No w-stacking -> no w-shift pre-phase: identity factors, so
        # psf()/slot-space consumers that read them unconditionally
        # stay correct (staging skips the rotation in this mode).
        phase_cos = np.ones(plan.num_vis, np.float32)
        phase_sin = np.zeros(plan.num_vis, np.float32)
    else:
        factor = -2.0 * np.pi * plan.n_mid
        if _native.available() and plan.num_vis:
            phase_cos, phase_sin = _native.phase_cossin(plan.ws, factor)
        else:
            phase = factor * plan.ws.astype(np.float64)
            phase_cos = np.cos(phase).astype(np.float32)
            phase_sin = np.sin(phase).astype(np.float32)
    flip_sign = (
        plan.flip_sign
        if plan.flip_sign is not None
        else np.where(plan.flip, -1.0, 1.0).astype(np.float32)
    )
    return {
        "order": plan.order,
        "flip_sign": flip_sign,
        "phase_cos": phase_cos,
        "phase_sin": phase_sin,
    }


def stage_slot_vis(plan: GridderPlan, vis_re, vis_im) -> tuple:
    """
    Host-side staging of flattened data-order visibilities into SLOT
    order: gather by the plan's block-slot permutation (duplicating
    lane straddlers), conjugate w-flipped samples, and apply the
    static w-shift pre-phase. Returns float32 numpy ``(re, im)`` of
    length ``plan.num_vis``.

    This is the gridder-input convention ``build_invert(...,
    slot_input=True)`` consumes directly — the production pipeline
    stages data once (the UVW-tile reorder exists precisely to hold
    visibilities in gridder order) and grids many times, so the
    per-call device gather (~7 cycles/element on TPU) never runs.
    """
    from .. import native as _native

    host = plan_order_host(plan)
    if _native.available() and plan.num_vis:
        # Fused multithreaded gather + flip + pre-phase (C++); padding
        # slots (order >= num_vis_data) stage as zero there.
        return _native.stage_slot_vis(
            np.asarray(vis_re, np.float32).ravel(),
            np.asarray(vis_im, np.float32).ravel(),
            host["order"],
            host["flip_sign"],
            host["phase_cos"],
            host["phase_sin"],
            wstacking=plan.wstacking,
        )
    re = np.append(
        np.asarray(vis_re, np.float32).ravel(), np.float32(0.0)
    )
    im = np.append(
        np.asarray(vis_im, np.float32).ravel(), np.float32(0.0)
    )
    order = np.minimum(host["order"], len(re) - 1)
    re_s = re[order]
    im_s = im[order] * host["flip_sign"]
    if plan.wstacking:
        cos, sin = host["phase_cos"], host["phase_sin"]
        re_s, im_s = re_s * cos - im_s * sin, re_s * sin + im_s * cos
    return re_s, im_s


def stage_slot_weights(plan: GridderPlan, weights) -> np.ndarray:
    """
    Host-side gather of per-sample (data-order) real weights into slot
    order (no flip/phase — weights are real and positive). Padding
    slots get weight 0.
    """
    w = np.append(
        np.asarray(weights, np.float32).ravel(), np.float32(0.0)
    )
    order = plan.order
    out = w[np.minimum(order, len(w) - 1)]
    out[order >= len(w) - 1] = 0.0
    return out


# ---------------------------------------------------------------------
# Compact staging: rebuild the per-slot plan rows and slot-ordered
# visibilities ON DEVICE from the raw inputs, so the host->device
# transfer carries ~2.6x fewer bytes. The staged per-slot data shrinks
# to a delta-compressed source-index map (per-block uint16 deltas +
# int32 firsts + exception list, ~2 B/slot) plus tiny hi/lo-split uvw
# and frequency-scale tables; visibilities transfer in DATA order
# (num_vis_data, not num_slots). A jitted prologue
# (:func:`build_assemble`) re-derives the
# (3, V) packed rows with double-float (f32 hi/lo) arithmetic — ~1e-9
# cell agreement with the host f64 planner — and gathers/rotates the
# visibilities into slot order. The reference's analog is ducc0
# re-deriving grid coordinates inside every ms2dirty call
# (reference: src/ska_sdp_cip/invert.py:170-183).
# ---------------------------------------------------------------------


def compact_plan_host_arrays(
    plan: GridderPlan,
    uvw: np.ndarray,
    channel_frequencies: np.ndarray,
) -> dict:
    """
    Host staging dict for the compact path: everything
    :func:`plan_host_arrays` ``slot_mode=True`` stages EXCEPT the
    (3, num_slots) f32 ``packed`` rows, which are replaced by

    - ``oe_first``/``oe_delta``/``oe_exc_pos``/``oe_exc_val`` — the
      delta-compressed slot source-index map (per-block int32 first
      index + uint16 deltas + exact exception list; padding slots
      decode to the ``num_vis_data`` sentinel);
    - ``uvw_hi``/``uvw_lo`` (nrow, 3) f32 — hi/lo split of the f64
      baseline coordinates (meters);
    - ``scale_hi``/``scale_lo`` (nchan,) f32 — hi/lo split of
      ``freq / c`` (1/m);
    - ``cblock_ox`` (num_blocks,) int32 — per-block patch x-origin
      (``block_oy`` is already staged for the kernels).

    ``uvw``/``channel_frequencies`` must be the arrays the plan was
    built from. Consumed by :func:`build_assemble`.
    """
    arrays = plan_host_arrays(
        plan, slot_mode=True, include_packed=False
    )
    if plan.order_enc is not None:
        # Native export (export_packed=False) emits this directly.
        enc = plan.order_enc
    else:
        order = plan.order
        if plan.flip_sign is not None:
            flipped = plan.flip_sign < 0
        elif plan.flip is not None:
            flipped = plan.flip.astype(bool)
        else:
            flipped = np.zeros(len(order), bool)
        enc = np.where(
            flipped, -order.astype(np.int64) - 1, order
        ).astype(np.int32)
    # Delta-compressed transfer format (~14.5 MB instead of 28.5 MB
    # per 7.1M slots): slot source indices are sorted within each
    # block, so per-block uint16 deltas + an int32 first-index row
    # cover >99.5% of slots; out-of-range deltas (block boundaries,
    # mixed w-bins, pad tails) ride an exact exception list.
    # Conjugation flips are NOT staged: the device prologue re-derives
    # them densely from the w sign (build_assemble's dense pass).
    idx = np.where(enc < 0, -enc - 1, enc).astype(np.int64)
    num_blocks = plan.num_blocks
    block = plan.block
    blocks = idx.reshape(num_blocks, block)
    deltas = np.zeros((num_blocks, block), np.int64)
    deltas[:, 1:] = np.diff(blocks, axis=1)
    bad = (deltas < 0) | (deltas >= 65536)
    exc_pos = np.flatnonzero(bad).astype(np.int32)
    arrays["oe_first"] = blocks[:, 0].astype(np.int32)
    arrays["oe_delta"] = (
        np.where(bad, 0, deltas).astype(np.uint16).reshape(-1)
    )
    arrays["oe_exc_pos"] = exc_pos
    arrays["oe_exc_val"] = deltas.reshape(-1)[exc_pos].astype(
        np.int32
    )
    uvw64 = np.ascontiguousarray(uvw, np.float64)
    hi = uvw64.astype(np.float32)
    arrays["uvw_hi"] = hi
    arrays["uvw_lo"] = (uvw64 - hi).astype(np.float32)
    scale = (
        np.asarray(channel_frequencies, np.float64) / SPEED_OF_LIGHT
    )
    shi = scale.astype(np.float32)
    arrays["scale_hi"] = shi
    arrays["scale_lo"] = (scale - shi).astype(np.float32)
    arrays["cblock_ox"] = plan.block_ox
    return arrays


def _two_sum(a, b):
    """Knuth two-sum: (s, e) with s + e == a + b exactly."""
    s = a + b
    bb = s - a
    return s, (a - (s - bb)) + (b - bb)


def _two_prod(a, b):
    """
    Dekker/Veltkamp product: (p, e) with p + e == a * b exactly.
    Robust whether or not XLA contracts the error expression into an
    FMA (the FMA form ``fma(a, b, -p)`` is the same exact residual).
    """
    split = jnp.float32(4097.0)  # 2^12 + 1
    p = a * b
    abig = a * split
    ahi = abig - (abig - a)
    alo = a - ahi
    bbig = b * split
    bhi = bbig - (bbig - b)
    blo = b - bhi
    e = ((ahi * bhi - p) + ahi * blo + alo * bhi) + alo * blo
    return p, e


def _df_mul(ah, al, bh, bl):
    """Double-float multiply: (ah+al) * (bh+bl) to ~48-bit precision."""
    p, e = _two_prod(ah, bh)
    e = e + (ah * bl + al * bh)
    return _two_sum(p, e)


def _df_add_exact(ah, al, b):
    """Double-float plus an exactly-representable f32 value."""
    s, e = _two_sum(ah, b)
    return s, e + al


def _df_grid_coord(bh, bl, sgn, sh, sl, inv_du, ngrid, support):
    """
    Grid coordinate ``mod(coord * freq/c / du + ngrid/2, ngrid) +
    support`` in double-float, mirroring the host planner's f64 path
    (native/cip_native.cpp geometry pass; ops/plan.py:1133-1136).
    Returns an (hi, lo) pair in the alloc frame.
    """
    ih = jnp.float32(float(np.float32(inv_du)))
    il = jnp.float32(float(inv_du) - float(np.float32(inv_du)))
    xh, xl = _df_mul(bh * sgn, bl * sgn, sh, sl)
    xh, xl = _df_mul(xh, xl, ih, il)
    xh, xl = _df_add_exact(xh, xl, jnp.float32(ngrid / 2.0))
    # Wrap into [0, ngrid): k is a small integer, so k * ngrid is
    # exact in f32 and the subtraction stays double-float exact.
    k = jnp.floor(xh / ngrid)
    xh, xl = _df_add_exact(xh, xl, -k * jnp.float32(ngrid))
    over = xh >= ngrid
    xh = jnp.where(over, xh - ngrid, xh)
    under = xh < 0
    xh = jnp.where(under, xh + ngrid, xh)
    return _df_add_exact(xh, xl, jnp.float32(support))


def build_assemble(plan: GridderPlan):
    """
    Jitted device prologue for the compact staging path: rebuild the
    kernels' per-slot ``packed`` rows (patch-relative x, y, |w|) and
    gather/conjugate/pre-phase the data-order visibilities into slot
    order. Returns ``assemble(arrays, re_data, im_data, wgt_data=None)
    -> (arrays_with_packed, re_s, im_s[, wgt_s])``; feed the result
    straight to ``build_invert(plan, slot_input=True)``.

    Accuracy: positions agree with the host f64 planner to ~1e-9
    cells (double-float arithmetic), far inside the gridder's epsilon
    contract; the pre-phase trig is evaluated at f32 (phase arguments
    are O(10) rad, giving ~1e-5 absolute phase agreement).
    """
    num_data = plan.num_vis_data
    support = plan.support
    ngrid = plan.ngrid
    inv_du = 1.0 / plan.du
    factor = np.float32(-2.0 * np.pi * plan.n_mid)
    block = plan.block
    wstacking = plan.wstacking

    def assemble(arrays, re_data, im_data, wgt_data=None):
        # --- DENSE data-order pass: geometry, flip, pre-phase ------
        # Everything per-sample is computed as (nrow, nchan)
        # broadcasts — pure VPU work, no gathers — so the slot pass
        # below needs only ONE scalar gather per output row (TPU
        # scalar gathers run ~1 element/cycle; halving their count
        # halves the prologue).
        uh2 = arrays["uvw_hi"][:, :, None]
        ul2 = arrays["uvw_lo"][:, :, None]
        sh = arrays["scale_hi"][None, :]
        sl = arrays["scale_lo"][None, :]
        # flip to w >= 0 (dirty image is real): sign from the DENSE
        # w = bw * scale product, matching the host planner.
        w_hi = uh2[:, 2] * sh
        sgn_d = jnp.where(w_hi < 0, jnp.float32(-1.0), jnp.float32(1.0))
        xh, xl = _df_grid_coord(
            uh2[:, 0], ul2[:, 0], sgn_d, sh, sl,
            inv_du, ngrid, support,
        )
        yh, yl = _df_grid_coord(
            uh2[:, 1], ul2[:, 1], sgn_d, sh, sl,
            inv_du, ngrid, support,
        )
        wh, wl = _df_mul(uh2[:, 2] * sgn_d, ul2[:, 2] * sgn_d, sh, sl)
        xglob = (xh + xl).reshape(-1)
        yglob = (yh + yl).reshape(-1)
        ws_d = (wh + wl).reshape(-1)
        sgn_d = sgn_d.reshape(-1)
        re_d = re_data
        im_d = im_data * sgn_d
        if wstacking:
            theta = factor * ws_d
            cos = jnp.cos(theta)
            sin = jnp.sin(theta)
            re_d, im_d = (
                re_d * cos - im_d * sin,
                re_d * sin + im_d * cos,
            )

        # --- slot pass: ONE row gather ------------------------------
        # TPU gathers are per-index latency-bound: 7 scalar gathers of
        # 7.1M measured 383 ms while one (N, 8)-row gather moving the
        # same payload measured 130 ms (2026-08-21 chip probe). All
        # per-sample values ride one dense (N, 8) table.
        # Expand the delta-compressed slot indices (see
        # compact_plan_host_arrays): exception scatter, per-block
        # cumsum, flip bits unpacked from bytes.
        deltas = (
            arrays["oe_delta"]
            .astype(jnp.int32)
            .at[arrays["oe_exc_pos"]]
            .set(arrays["oe_exc_val"], mode="drop")
            .reshape(arrays["oe_first"].shape[0], block)
        )
        idx = (
            jnp.cumsum(deltas, axis=1)
            + arrays["oe_first"][:, None]
        ).reshape(-1)
        num_slots = idx.shape[0]
        mask = idx < num_data
        # Slots are exactly block-major: per-block origins broadcast,
        # no gather needed (same trick as _kernel_dma_rows).
        def per_block(table):
            return (
                jnp.broadcast_to(
                    table[:, None], (table.shape[0], block)
                )
                .reshape(-1)[:num_slots]
                .astype(jnp.float32)
            )

        box = per_block(arrays["cblock_ox"])
        boy = per_block(arrays["block_oy"])

        zero = jnp.zeros_like(re_d)
        table = jnp.stack(
            [
                xglob,
                yglob,
                ws_d,
                re_d,
                im_d,
                zero if wgt_data is None else wgt_data,
                zero,
                zero,
            ],
            axis=1,
        )
        g = jnp.take(table, idx, axis=0, mode="clip")

        def col(k, fill):
            return jnp.where(mask, g[:, k], fill)

        pad_pos = jnp.float32(support + 0.5)
        out = dict(arrays)
        out["packed"] = jnp.stack(
            [
                col(0, pad_pos + box) - box,
                col(1, pad_pos + boy) - boy,
                col(2, jnp.float32(0.0)),
            ]
        )
        re_s = col(3, jnp.float32(0.0))
        im_s = col(4, jnp.float32(0.0))
        if wgt_data is None:
            return out, re_s, im_s
        return out, re_s, im_s, col(5, jnp.float32(0.0))

    return assemble


def slot_duplicate_pairs(plan: GridderPlan) -> tuple:
    """
    The static (dup_a, dup_b) slot-index pairs sharing one source
    sample (lane-straddler duplication, ops/plan.py). A model
    visibility's full value is the sum over its slots — each slot's
    kernel covers only its own 128-lane window — so slot-space
    residuals need ``acc[dup_a] += acc_old[dup_b]`` and vice versa
    (see :func:`slot_group_sum`). Pairs are returned as int32 arrays;
    samples with a single slot don't appear.
    """
    order = plan.order
    perm = np.argsort(order, kind="stable")
    sorted_order = order[perm]
    eq = (sorted_order[1:] == sorted_order[:-1]) & (
        sorted_order[1:] < plan.num_vis_data
    )
    # slot_group_sum assumes each source sample occupies at most TWO
    # slots (single lane-straddle duplication today). A future plan
    # change duplicating into 3+ slots would silently produce wrong
    # pairwise group sums — fail loudly instead.
    if eq.size and np.any(eq[1:] & eq[:-1]):
        raise ValueError(
            "slot plan duplicates a source sample into >2 slots; "
            "slot_group_sum's pairwise model no longer applies"
        )
    dup_a = perm[:-1][eq].astype(np.int32)
    dup_b = perm[1:][eq].astype(np.int32)
    return dup_a, dup_b


def slot_group_sum(acc_re, acc_im, dup_a, dup_b):
    """
    Sum duplicated-slot contributions so every slot carries its source
    sample's FULL model value: ``out[i] = acc[i] + acc[partner(i)]``
    for straddler pairs, identity elsewhere. ``dup_a``/``dup_b`` may
    be padded with out-of-range indices (= num_vis): the gather clips
    (value unused) and the scatter drops them.
    """
    if dup_a.shape[0] == 0:
        return acc_re, acc_im
    pair = jnp.stack([acc_re, acc_im], axis=1)
    va = jnp.take(pair, dup_a, axis=0, mode="clip")
    vb = jnp.take(pair, dup_b, axis=0, mode="clip")
    pair = (
        pair.at[dup_a].add(vb, mode="drop")
        .at[dup_b].add(va, mode="drop")
    )
    return pair[:, 0], pair[:, 1]


def _prepare_sorted_vis(plan: GridderPlan, arrays: dict, vis_re, vis_im):
    """
    Gather to plan order, conjugate flipped rows, apply the w-shift
    pre-phase. All float32; returns (re, im).

    The gather runs as ONE row-take of an (N, 2) interleave: TPU
    element gathers serialize (~7 cycles/element — 14 ms/call at bench
    size) while short-row gathers lower to vector loads (~3x faster
    for both components together).
    """
    order = arrays["order"]
    pair = jnp.stack(
        [
            jnp.asarray(vis_re, jnp.float32),
            jnp.asarray(vis_im, jnp.float32),
        ],
        axis=1,
    )
    taken = jnp.take(pair, order, axis=0, mode="clip")
    re = taken[:, 0]
    im = taken[:, 1] * arrays["flip_sign"]
    if plan.wstacking:
        cos = arrays["phase_cos"]
        sin = arrays["phase_sin"]
        re, im = re * cos - im * sin, re * sin + im * cos
    return re, im


def _slice_group(column, starts, size):
    """Gather G dynamic windows of ``size`` from a 1-D column: (G, size)."""
    return jax.vmap(
        lambda s: lax.dynamic_slice(column, (s,), (size,))
    )(starts)


def _group_kernel_matrices(plan: GridderPlan, arrays: dict, bs):
    """
    Banded kernel matrices Ax (G, B, PX), Ay (G, B, PY) for a group of
    block slots ``bs``, plus per-block metadata: vis start indices,
    lane masks, w coords, and patch origins.
    """
    B, W = plan.block, plan.support
    s = arrays["block_start"][bs]
    length = arrays["block_len"][bs]
    ox = arrays["block_ox"][bs]
    oy = arrays["block_oy"][bs]

    x0 = _slice_group(arrays["x0"], s, B)
    y0 = _slice_group(arrays["y0"], s, B)
    fx = _slice_group(arrays["fx"], s, B)
    fy = _slice_group(arrays["fy"], s, B)
    ws = _slice_group(arrays["ws"], s, B)

    iota_x = jnp.arange(plan.patch_x, dtype=jnp.int32)
    iota_y = jnp.arange(plan.patch_y, dtype=jnp.int32)
    # Footprint-relative cell index (patch cell minus footprint start):
    # exact in int32, so kernel arguments keep full f32 precision on
    # arbitrarily large grids.
    rx = iota_x[None, None, :] - (x0 - ox[:, None])[:, :, None]
    ry = iota_y[None, None, :] - (y0 - oy[:, None])[:, :, None]
    inv_half = jnp.float32(2.0 / W)
    zx = (rx.astype(jnp.float32) - fx[:, :, None]) * inv_half
    zy = (ry.astype(jnp.float32) - fy[:, :, None]) * inv_half
    ax = es_kernel_jnp(zx, plan.beta)
    ay = es_kernel_jnp(zy, plan.beta)

    lane = jnp.arange(B, dtype=jnp.int32)[None, :] < length[:, None]
    return ax, ay, s, lane, ws, ox, oy


def _fft2_to_image(arrays, grid_re, grid_im, crop0, npix):
    """
    Centred inverse 2-D DFT of the (N, N) uv grid, pruned to the
    (npix, npix) image crop: both passes skip the stage-2 work outside
    the covering output range (~half the FFT cost at 2x padding).
    """
    re1, im1 = fft_last_axis(
        grid_re, grid_im, arrays, sign=+1, out_crop=(crop0, npix)
    )
    return fft_first_axis(
        re1, im1, arrays, sign=+1, out_crop=(crop0, npix)
    )


def resolve_fft_impl(plan: GridderPlan, fft_impl: str | None) -> str:
    """
    FFT implementation for the invert image pass: "pallas" (fused
    Pallas axis passes, ops/fft_pallas.py) or "xla" (matmul FFT,
    ops/fft.py). ``None`` defers to env ``CIP_FFT_IMPL`` (default
    "auto": pallas on TPU backends when the grid and image sizes are
    lane-aligned, else xla — CPU tests and the multichip dryrun keep
    the XLA path).
    """
    import os

    impl = fft_impl or os.environ.get("CIP_FFT_IMPL", "auto")
    if impl not in ("auto", "pallas", "xla"):
        raise ValueError(f"unknown CIP_FFT_IMPL {impl!r}")
    aligned = plan.ngrid % 128 == 0 and plan.num_pixels % 128 == 0
    if impl == "auto":
        on_tpu = jax.default_backend() not in ("cpu",)
        return "pallas" if (aligned and on_tpu) else "xla"
    if impl == "pallas" and not aligned:
        raise ValueError(
            "CIP_FFT_IMPL=pallas needs ngrid and npix to be "
            f"multiples of 128 (got {plan.ngrid}, {plan.num_pixels})"
        )
    return impl


def _fused_fft_meta(plan: GridderPlan):
    """Static geometry of the fused invert FFT passes for this plan."""
    from .fft_pallas import fused_pass_meta

    npix = plan.num_pixels
    crop0 = (plan.ngrid - npix) // 2
    return fused_pass_meta(
        make_fft_plan(plan.ngrid, shifted=True), (crop0, npix)
    )


def _fused_fft_meta_ic(plan: GridderPlan):
    """Static geometry of the fused predict (in-cropped) passes."""
    from .fft_pallas import fused_pass_meta

    npix = plan.num_pixels
    crop0 = (plan.ngrid - npix) // 2
    return fused_pass_meta(
        make_fft_plan(plan.ngrid, shifted=True),
        None,
        in_crop=(crop0, npix),
    )


def _fft2_to_image_fused_t(arrays, grid_re, grid_im, fmeta):
    """
    Fused-Pallas centred inverse 2-D DFT cropped to the image — but
    returning the TRANSPOSED image. The geometry maps (inv_corr,
    nm1s) are transpose-symmetric (square pixels, outer(c, c) taper),
    so plane contributions accumulate correctly in transposed space
    and the invert transposes ONCE after the plane scan instead of
    once per plane (~8 ms/plane at the 10240 px production config).
    """
    from .fft_pallas import fft_first_axis_fused

    interpret = jax.default_backend() == "cpu"
    a_re, a_im = fft_first_axis_fused(
        grid_re, grid_im, arrays, meta=fmeta, prefix="fftp",
        interpret=interpret,
    )
    return fft_first_axis_fused(
        a_re.T, a_im.T, arrays, meta=fmeta, prefix="fftp",
        interpret=interpret,
    )


def _fft2_from_image(arrays, img_re, img_im, crop0, ngrid):
    """
    Adjoint of :func:`_fft2_to_image`: centred forward DFT of an
    (npix, npix) image placed at the grid centre, pruned on the input
    side (zero rows/columns outside the crop never enter stage 1).
    """
    npix = img_re.shape[-1]
    re1, im1 = fft_last_axis(
        img_re, img_im, arrays, sign=-1, in_crop=(crop0, npix)
    )
    return fft_first_axis(
        re1, im1, arrays, sign=-1, in_crop=(crop0, npix)
    )


def _fold_wraps(plan: GridderPlan, grid):
    """
    Fold the padded alloc frame back onto the periodic N x N grid.
    (The ``.at[].add`` form measures faster end-to-end than a
    concatenation rewrite: XLA's copy placement here also feeds the
    FFT stage a friendlier layout.)
    """
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
    N, W = plan.ngrid, plan.support
    gx = jnp.zeros((plan.nalloc_x, N), dtype=g.dtype)
    gx = gx.at[W : W + N, :].set(g)
    gx = gx.at[W + N : N + 2 * W, :].set(g[0:W, :])
    gx = gx.at[0:W, :].set(g[N - W : N, :])
    alloc = jnp.zeros((plan.nalloc_x, plan.nalloc_y), dtype=g.dtype)
    alloc = alloc.at[:, W : W + N].set(gx)
    alloc = alloc.at[:, W + N : N + 2 * W].set(gx[:, 0:W])
    alloc = alloc.at[:, 0:W].set(gx[:, N - W : N])
    return alloc




def resolve_gridder_mode(gridder: str | None) -> str:
    """
    'pallas' | 'xla' | 'pallas_interpret'. Default ('auto'): the Pallas
    kernel on accelerators, the pure-XLA scan on CPU.
    """
    import os

    mode = gridder or os.environ.get("CIP_GRIDDER", "auto")
    if mode == "auto":
        mode = "pallas" if jax.default_backend() != "cpu" else "xla"
    if mode not in ("pallas", "xla", "pallas_interpret"):
        raise ValueError(f"Unknown gridder mode {mode!r}")
    return mode


def build_invert(
    plan: GridderPlan,
    *,
    gridder: str | None = None,
    slot_input: bool = False,
    fft_impl: str | None = None,
    mesh_axis: str | None = None,
    num_shards: int = 1,
):
    """
    Returns a jitted ``invert(arrays, vis_re, vis_im) -> image``
    computing the unnormalized dirty image (float32, (npix, npix)) from
    flattened (row * chan) weighted Stokes-I visibilities, split into
    real/imag float32. Divide by the total effective weight for fluxes
    (reference: invert.py:119-149).

    With ``slot_input=True`` the inputs are already in slot order
    (:func:`stage_slot_vis` convention: gathered, flipped, phased,
    length ``plan.num_vis``) and the on-device gather is skipped —
    the production path, where data is staged once and gridded many
    times (e.g. every major cycle).
    """
    PX, PY = plan.patch_x, plan.patch_y
    B, W = plan.block, plan.support
    G = BLOCK_GROUP
    N, npix = plan.ngrid, plan.num_pixels
    crop0 = (N - npix) // 2
    inv_whalf = 2.0 / (W * plan.dw)
    num_chunks = _padded_active(plan) // G
    mode = resolve_gridder_mode(gridder)
    use_fused_fft = resolve_fft_impl(plan, fft_impl) == "pallas"
    fmeta = _fused_fft_meta(plan) if use_fused_fft else None

    # CIP_ABLATE=nofft: TIMING-ONLY knob producing WRONG images — the
    # plane FFT is replaced by a slice so on-chip benchmarks can read
    # the gridding-vs-FFT split of the invert without editing kernels.
    # Never set in production; results are garbage by construction.
    ablate_nofft = "nofft" in (
        __import__("os").environ.get("CIP_ABLATE") or ""
    ).split(",")

    def fft2_image(arrays, grid_re, grid_im):
        """Plane FFT; fused path returns the image TRANSPOSED."""
        if ablate_nofft:
            return (
                grid_re[:npix, :npix],
                grid_im[:npix, :npix],
            )
        if use_fused_fft:
            return _fft2_to_image_fused_t(arrays, grid_re, grid_im, fmeta)
        return _fft2_to_image(arrays, grid_re, grid_im, crop0, npix)

    # Distributed plane FFT (SURVEY section 7 L4: reduce partial GRIDS,
    # FFT after the reduction — cheaper than every device FFT-ing a
    # full replicated grid and reducing images). Per plane, inside
    # shard_map: psum_scatter the grid into column slabs, local
    # first-axis pass, all_to_all into row slabs, local second pass —
    # the FFT FLOPs divide by the mesh size and the collectives ride
    # ICI. Requires ngrid and npix divisible by num_shards.
    dist = mesh_axis is not None and num_shards > 1
    if dist and (N % num_shards or npix % num_shards):
        raise ValueError(
            f"distributed FFT needs ngrid={N} and npix={npix} "
            f"divisible by num_shards={num_shards}"
        )
    rows_loc = npix // num_shards if dist else npix

    def first_axis_pass(arrays, re, im):
        if use_fused_fft:
            from .fft_pallas import fft_first_axis_fused

            return fft_first_axis_fused(
                re, im, arrays, meta=fmeta, prefix="fftp",
                interpret=jax.default_backend() == "cpu",
            )
        return fft_first_axis(
            re, im, arrays, sign=+1, out_crop=(crop0, npix)
        )

    def plane_contrib(arrays, grid_re, grid_im, w_p, geo):
        """
        (N, N) folded plane grids -> this plane's image contribution
        in the accumulator layout. Replicated mode: (npix, npix)
        (transposed when the fused FFT defers its final transpose).
        Distributed mode: a (npix, rows_loc) transposed row-slab of
        the image; ``geo`` is the matching nm1s slab.

        NOTE (measured 2026-08-21): replacing the per-plane trig with
        screen-rotation recurrences (scan-carried or in-group) is
        NEUTRAL on chip — XLA fuses the trig into the correction
        multiply, and the ``noscreen`` ablation overstates the screen
        cost because zeroing the screen also zeroes the FFT's
        imaginary input, letting XLA skip half the transform. Do not
        re-attempt without a profile showing the trig itself hot.
        """

        def correct(img_re, img_im):
            if not plan.wstacking:
                return img_re
            theta = (-2.0 * np.pi * w_p) * geo
            return img_re * jnp.cos(theta) - img_im * jnp.sin(theta)

        if not dist:
            img_re, img_im = fft2_image(arrays, grid_re, grid_im)
            # nm1s is transpose-symmetric, so the fused path's
            # transposed images accumulate correctly.
            return correct(img_re, img_im)
        grid_re = lax.psum_scatter(
            grid_re, mesh_axis, scatter_dimension=1, tiled=True
        )
        grid_im = lax.psum_scatter(
            grid_im, mesh_axis, scatter_dimension=1, tiled=True
        )
        a_re, a_im = first_axis_pass(arrays, grid_re, grid_im)
        a_re = lax.all_to_all(a_re, mesh_axis, 0, 1, tiled=True)
        a_im = lax.all_to_all(a_im, mesh_axis, 0, 1, tiled=True)
        b_re, b_im = first_axis_pass(arrays, a_re.T, a_im.T)
        return correct(b_re, b_im)

    def geometry_slabs(inv_corr, nm1s):
        """Per-device column slabs of the geometry maps (symmetric
        maps: a column slab equals the transposed row slab)."""
        if not dist:
            return inv_corr, nm1s
        r0 = lax.axis_index(mesh_axis) * rows_loc
        return (
            lax.dynamic_slice(inv_corr, (0, r0), (npix, rows_loc)),
            lax.dynamic_slice(nm1s, (0, r0), (npix, rows_loc)),
        )

    def finalize_image(image, inv_corr_slab):
        """Accumulated contributions -> full (npix, npix) image."""
        image = image * inv_corr_slab
        if dist:
            return lax.all_gather(
                image.T, mesh_axis, axis=0, tiled=True
            )
        if use_fused_fft:
            return image.T
        return image

    if mode.startswith("pallas") and plan.plane_group > 1:
        from .pallas_gridder import build_grid_planes_pallas_group

        grid_group = build_grid_planes_pallas_group(
            plan, interpret=(mode == "pallas_interpret")
        )
        GP = plan.plane_group
        NSEG = plan.num_y_segments
        SY = plan.seg_lanes
        SEGW = plan.seg_width

        @jax.jit
        def invert_pallas_group(arrays: dict, vis_re, vis_im):
            inv_corr, nm1s = _geometry_maps(plan, arrays)
            if slot_input:
                re, im = vis_re, vis_im
            else:
                re, im = _prepare_sorted_vis(
                    plan, arrays, vis_re, vis_im
                )
            # (8, V) kernel DMA layout assembled on device
            # (_kernel_dma_rows: 3 staged plan rows + the broadcast
            # block-length row + the split visibilities).
            data = _kernel_dma_rows(plan, arrays, re, im)

            def grid_segment(k, g, w_g):
                return grid_group(
                    arrays["step_val"][k, g],
                    arrays["step_aux"][k, g],
                    arrays["first_block"][k, g],
                    arrays["block_oy"],
                    arrays["step_count"][k, g][None],
                    jnp.full((1,), g * SY, jnp.int32),
                    data,
                    w_g,
                )

            def group_grids(k, w_g):
                if NSEG == 1:
                    return grid_segment(k, 0, w_g)
                outs = [
                    jnp.zeros(
                        (plan.nalloc_x, plan.nalloc_y), jnp.float32
                    )
                    for _ in range(2 * GP)
                ]
                for g in range(NSEG):
                    parts = grid_segment(k, g, w_g)
                    outs = [
                        o.at[:, g * SY : g * SY + SEGW].add(part)
                        for o, part in zip(outs, parts)
                    ]
                return outs

            def group_contrib(image_accum, k, num_real):
                # num_real: planes of this group < nplanes (static).
                # Ragged-tail pad planes have all-zero grids, so their
                # FFTs are simply skipped. Per-plane screen trig is
                # computed in full: rotating by loop-invariant dw maps
                # measured NEUTRAL (see the NOTE in plane_contrib).
                w_g = arrays["plane_wg"][k]
                grids = group_grids(k, w_g)
                contrib = image_accum
                for i in range(num_real):
                    contrib = contrib + plane_contrib(
                        arrays,
                        _fold_wraps(plan, grids[2 * i]),
                        _fold_wraps(plan, grids[2 * i + 1]),
                        w_g[i],
                        nm1s_s,
                    )
                return contrib

            inv_corr_s, nm1s_s = geometry_slabs(inv_corr, nm1s)
            image = jnp.zeros((npix, rows_loc), jnp.float32)
            n_full = plan.nplanes // GP
            if n_full:
                image, _ = lax.scan(
                    lambda acc, k: (group_contrib(acc, k, GP), None),
                    image,
                    jnp.arange(n_full),
                )
            tail = plan.nplanes % GP
            if tail:
                image = group_contrib(image, n_full, tail)
            return finalize_image(image, inv_corr_s)

        return invert_pallas_group

    if mode.startswith("pallas"):
        from .pallas_gridder import build_grid_planes_pallas

        grid_plane = build_grid_planes_pallas(
            plan, interpret=(mode == "pallas_interpret")
        )

        @jax.jit
        def invert_pallas(arrays: dict, vis_re, vis_im):
            inv_corr, nm1s = _geometry_maps(plan, arrays)
            if slot_input:
                re, im = vis_re, vis_im
            else:
                re, im = _prepare_sorted_vis(
                    plan, arrays, vis_re, vis_im
                )
            # Splice the split visibilities into the packed rows so
            # each block-step costs a single input DMA.
            # (8, V) kernel DMA layout assembled on device
            # (_kernel_dma_rows: 3 staged plan rows + the broadcast
            # block-length row + the split visibilities).
            data = _kernel_dma_rows(plan, arrays, re, im)

            NSEG = plan.num_y_segments
            SY = plan.seg_lanes
            SEGW = plan.seg_width

            def grid_segment(p, g, w_p):
                return grid_plane(
                    arrays["step_val"][p, g],
                    arrays["step_aux"][p, g],
                    arrays["first_block"][p, g],
                    arrays["block_oy"],
                    arrays["step_count"][p, g][None],
                    jnp.full((1,), g * SY, jnp.int32),
                    data,
                    w_p,
                )

            def plane_body(image_accum, p):
                w_p = arrays["plane_w"][p]
                if NSEG == 1:
                    grid_re, grid_im = grid_segment(p, 0, w_p)
                else:
                    # Wide grids: one kernel call per lane segment,
                    # seam-added over the patch overhang.
                    grid_re = jnp.zeros(
                        (plan.nalloc_x, plan.nalloc_y), jnp.float32
                    )
                    grid_im = jnp.zeros_like(grid_re)
                    for g in range(NSEG):
                        part_re, part_im = grid_segment(p, g, w_p)
                        grid_re = grid_re.at[
                            :, g * SY : g * SY + SEGW
                        ].add(part_re)
                        grid_im = grid_im.at[
                            :, g * SY : g * SY + SEGW
                        ].add(part_im)
                grid_re = _fold_wraps(plan, grid_re)
                grid_im = _fold_wraps(plan, grid_im)
                contrib = plane_contrib(
                    arrays, grid_re, grid_im, w_p, nm1s_s
                )
                return image_accum + contrib, None

            inv_corr_s, nm1s_s = geometry_slabs(inv_corr, nm1s)
            image, _ = lax.scan(
                plane_body,
                jnp.zeros((npix, rows_loc), jnp.float32),
                jnp.arange(plan.nplanes),
            )
            return finalize_image(image, inv_corr_s)

        return invert_pallas

    @jax.jit
    def invert(arrays: dict, vis_re, vis_im):
        inv_corr, nm1s = _geometry_maps(plan, arrays)
        if slot_input:
            re, im = vis_re, vis_im
        else:
            re, im = _prepare_sorted_vis(plan, arrays, vis_re, vis_im)

        def plane_body(image_accum, p):
            w_p = arrays["plane_w"][p]
            active_row = arrays["active_table"][p]
            active_count = arrays["active_count"][p]

            def chunk_body(carry, ci):
                start = ci * G

                def run(carry):
                    grid_re, grid_im = carry
                    idxs = lax.dynamic_slice(active_row, (start,), (G,))
                    valid = idxs >= 0
                    bs = jnp.maximum(idxs, 0)
                    ax, ay, s, lane, ws, ox, oy = _group_kernel_matrices(
                        plan, arrays, bs
                    )
                    if plan.wstacking:
                        kw = es_kernel_jnp(
                            (w_p - ws) * inv_whalf, plan.beta
                        )
                    else:
                        kw = jnp.ones_like(ws)
                    amp = jnp.where(lane & valid[:, None], kw, 0.0)
                    val_re = _slice_group(re, s, B) * amp
                    val_im = _slice_group(im, s, B) * amp

                    # Batched MXU contraction: one (G, P, B) x (G, B, P)
                    patch_re = jnp.einsum(
                        "gbp,gbq->gpq",
                        ax * val_re[:, :, None],
                        ay,
                        precision=_HIGHEST,
                    )
                    patch_im = jnp.einsum(
                        "gbp,gbq->gpq",
                        ax * val_im[:, :, None],
                        ay,
                        precision=_HIGHEST,
                    )

                    # Unrolled overlap-add: straight-line HLO (a G-trip
                    # while-loop here slows both compile and execution)
                    grid_re, grid_im = carry
                    for g in range(G):
                        cur_re = lax.dynamic_slice(
                            grid_re, (ox[g], oy[g]), (PX, PY)
                        )
                        cur_im = lax.dynamic_slice(
                            grid_im, (ox[g], oy[g]), (PX, PY)
                        )
                        grid_re = lax.dynamic_update_slice(
                            grid_re, cur_re + patch_re[g], (ox[g], oy[g])
                        )
                        grid_im = lax.dynamic_update_slice(
                            grid_im, cur_im + patch_im[g], (ox[g], oy[g])
                        )
                    return grid_re, grid_im

                carry = _maybe_cond(start < active_count, run, carry)
                return carry, None

            grid0 = (
                jnp.zeros((plan.nalloc_x, plan.nalloc_y), jnp.float32),
                jnp.zeros((plan.nalloc_x, plan.nalloc_y), jnp.float32),
            )
            (grid_re, grid_im), _ = lax.scan(
                chunk_body, grid0, jnp.arange(num_chunks)
            )
            grid_re = _fold_wraps(plan, grid_re)
            grid_im = _fold_wraps(plan, grid_im)
            # N^2 * ifft2 == unnormalized inverse DFT (sign=+1)
            contrib = plane_contrib(arrays, grid_re, grid_im, w_p, nm1s_s)
            return image_accum + contrib, None

        inv_corr_s, nm1s_s = geometry_slabs(inv_corr, nm1s)
        image, _ = lax.scan(
            plane_body,
            jnp.zeros((npix, rows_loc), jnp.float32),
            jnp.arange(plan.nplanes),
        )
        return finalize_image(image, inv_corr_s)

    return invert


def build_predict(
    plan: GridderPlan,
    *,
    gridder: str | None = None,
    slot_output: bool = False,
    fft_impl: str | None = None,
    mesh_axis: str | None = None,
    num_shards: int = 1,
):
    """
    Returns a jitted ``predict(arrays, image) -> (vis_re, vis_im)``:
    the exact adjoint of :func:`build_invert`'s operator, i.e. the
    degridding / forward model (``dirty2ms`` analog) producing
    flattened (row * chan) split visibilities from a real image.

    With ``slot_output=True`` the per-slot contributions are returned
    in the slot-input convention (pre-phase applied, flip NOT undone,
    length ``plan.num_vis`` each) — i.e. exactly the adjoint of
    ``build_invert(..., slot_input=True)``. A slot's value covers only
    its own 128-lane kernel window; sum straddler pairs with
    :func:`slot_group_sum` before comparing against staged data.
    """
    PX, PY = plan.patch_x, plan.patch_y
    B, W = plan.block, plan.support
    G = BLOCK_GROUP
    N, npix = plan.ngrid, plan.num_pixels
    crop0 = (N - npix) // 2
    inv_whalf = 2.0 / (W * plan.dw)
    num_slots = plan.num_vis
    num_out = plan.num_vis_data
    num_chunks = _padded_active(plan) // G
    mode = resolve_gridder_mode(gridder)
    use_fused_fft = resolve_fft_impl(plan, fft_impl) == "pallas"
    fmeta_ic = _fused_fft_meta_ic(plan) if use_fused_fft else None
    # Distributed forward FFT (mirror of the invert's fft_mode=
    # "distributed"): each device transforms only its image-column
    # slab, an all_to_all re-shards into k-row slabs for the second
    # pass, and the grid slabs are all_gathered for local degridding —
    # forward-FFT FLOPs divide by the mesh size.
    dist = mesh_axis is not None and num_shards > 1
    if dist and (N % num_shards or npix % num_shards):
        raise ValueError(
            f"distributed FFT needs ngrid={N} and npix={npix} "
            f"divisible by num_shards={num_shards}"
        )

    def forward_first_pass(arrays, re, im):
        if use_fused_fft:
            from .fft_pallas import fft_first_axis_fused

            return fft_first_axis_fused(
                re, im, arrays, meta=fmeta_ic, prefix="fftq",
                interpret=jax.default_backend() == "cpu",
            )
        return fft_first_axis(
            re, im, arrays, sign=-1, in_crop=(crop0, npix)
        )

    degrid_plane = None
    if mode.startswith("pallas") and plan.plane_group == 1:
        from .pallas_gridder import build_degrid_planes_pallas

        degrid_plane = build_degrid_planes_pallas(
            plan, interpret=(mode == "pallas_interpret")
        )

    # TIMING-ONLY sub-ablations of the forward (screen/FFT/unfold)
    # side, composing with "nodegrid" (see CIP_ABLATE): "noscreen"
    # skips the per-plane w-screen trig, "nounfold" returns the
    # uncropped grid without the wrap-margin unfold. CAVEAT:
    # "noscreen" zeroes the FFT's imaginary input too, so its delta
    # overstates the screen cost (XLA skips half the transform) —
    # measured 2026-08-21 when a screen-rotation variant based on
    # that reading came out neutral.
    ablate_fwd = set(
        (__import__("os").environ.get("CIP_ABLATE") or "").split(",")
    )

    def _screened_alloc(arrays, img0, w_p, nm1s):
        """Screen, pad, FFT, unfold one plane's grid (XLA side)."""
        if plan.wstacking and "noscreen" not in ablate_fwd:
            theta = (2.0 * np.pi * w_p) * nm1s
            img_re = img0 * jnp.cos(theta)
            img_im = img0 * jnp.sin(theta)
        else:
            img_re = img0
            img_im = jnp.zeros_like(img0)

        if dist:
            cols = npix // num_shards
            c0_loc = lax.axis_index(mesh_axis) * cols
            re_s = lax.dynamic_slice(img_re, (0, c0_loc), (npix, cols))
            im_s = lax.dynamic_slice(img_im, (0, c0_loc), (npix, cols))
            a_re, a_im = forward_first_pass(arrays, re_s, im_s)
            a_re = lax.all_to_all(a_re, mesh_axis, 0, 1, tiled=True)
            a_im = lax.all_to_all(a_im, mesh_axis, 0, 1, tiled=True)
            b_re, b_im = forward_first_pass(arrays, a_re.T, a_im.T)
            grid_re = lax.all_gather(
                b_re.T, mesh_axis, axis=0, tiled=True
            )
            grid_im = lax.all_gather(
                b_im.T, mesh_axis, axis=0, tiled=True
            )
        elif use_fused_fft:
            from .fft_pallas import fft2_from_image_fused

            grid_re, grid_im = fft2_from_image_fused(
                arrays, img_re, img_im, meta=fmeta_ic, prefix="fftq",
                interpret=jax.default_backend() == "cpu",
            )
        else:
            grid_re, grid_im = _fft2_from_image(
                arrays, img_re, img_im, crop0, N
            )
        if "nounfold" in ablate_fwd:
            # Timing ablation (WRONG shapes downstream — only valid
            # with "nodegrid", which reads [0, 0] of each grid).
            return grid_re, grid_im
        return _unfold_wraps(plan, grid_re), _unfold_wraps(plan, grid_im)

    def _finalize(arrays, acc_re, acc_im):
        """Post-phase, conjugate flips, scatter back to input order."""
        if plan.wstacking:
            # Adjoint post-phase: conjugate of the staged pre-phase.
            cos = arrays["phase_cos"]
            sin = -arrays["phase_sin"]
            acc_re, acc_im = (
                acc_re * cos - acc_im * sin,
                acc_re * sin + acc_im * cos,
            )
        acc_im = acc_im * arrays["flip_sign"]
        # Scatter-ADD: duplicated lane straddlers (ops/plan.py) carry
        # two partial contributions per source sample; padded slots
        # index num_vis_data and are dropped. One (N, 2) row scatter —
        # element scatters serialize on TPU (see _prepare_sorted_vis).
        pair = (
            jnp.zeros((num_out, 2), jnp.float32)
            .at[arrays["order"]]
            .add(jnp.stack([acc_re, acc_im], axis=1), mode="drop")
        )
        return pair[:, 0], pair[:, 1]

    if mode.startswith("pallas") and plan.plane_group > 1:
        from .pallas_gridder import build_degrid_planes_pallas_group

        degrid_group = build_degrid_planes_pallas_group(
            plan, interpret=(mode == "pallas_interpret")
        )
        GP = plan.plane_group
        NSEG = plan.num_y_segments
        SY = plan.seg_lanes
        SEGW = plan.seg_width
        # TIMING-ONLY ablations producing WRONG visibilities (see the
        # invert's CIP_ABLATE=nofft): "nodegrid" skips the degrid
        # kernel (isolates the screen/FFT/unfold side), "nofft" feeds
        # the kernel zero allocs (isolates the degrid kernel).
        # Comma-separated set so kernel-level flags (e.g. noout,
        # pallas_gridder.py) compose: CIP_ABLATE=nofft,noout.
        ablate_set = set(
            (__import__("os").environ.get("CIP_ABLATE") or "").split(",")
        )

        @jax.jit
        def predict_pallas_group(arrays: dict, image):
            inv_corr, nm1s = _geometry_maps(plan, arrays)
            img0 = jnp.asarray(image, jnp.float32) * inv_corr
            # (8, V) DMA layout: rows 4-7 are never read by degrid.
            data = _kernel_dma_rows(plan, arrays)

            def degrid_segment(k, g, grids, w_g):
                return degrid_group(
                    arrays["step_val"][k, g],
                    arrays["step_aux"][k, g],
                    arrays["step_aux2"][k, g],
                    arrays["first_block"][k, g],
                    arrays["last_blocks"][k, g],
                    arrays["block_oy"],
                    arrays["step_count"][k, g][None],
                    jnp.full((1,), g * SY, jnp.int32),
                    data,
                    grids,
                    w_g,
                )

            def group_step(acc, k, num_real):
                w_g = arrays["plane_wg"][k]
                grids = []
                for i in range(GP):
                    if "nofft" in ablate_set:
                        ri = ii = jnp.zeros(
                            (plan.nalloc_x, plan.nalloc_y),
                            jnp.float32,
                        )
                    elif i < num_real:
                        ri, ii = _screened_alloc(
                            arrays, img0, w_g[i], nm1s
                        )
                    # Ragged-tail pad planes: their ES w-factor is
                    # zero for every block, so any grid works — reuse
                    # the last real plane's.
                    grids.extend([ri, ii])
                if "nodegrid" in ablate_set:
                    # Depend on every alloc so none is DCE'd away.
                    total = sum(g[0, 0] for g in grids)
                    return acc + total
                if NSEG == 1:
                    contrib = degrid_segment(k, 0, grids, w_g)
                else:
                    contrib = jnp.zeros_like(acc)
                    for g in range(NSEG):
                        cols = slice(g * SY, g * SY + SEGW)
                        contrib = contrib + degrid_segment(
                            k,
                            g,
                            [a[:, cols] for a in grids],
                            w_g,
                        )
                return acc + contrib

            acc = jnp.zeros((2, num_slots), jnp.float32)
            n_full = plan.nplanes // GP
            if n_full:
                acc, _ = lax.scan(
                    lambda a, k: (group_step(a, k, GP), None),
                    acc,
                    jnp.arange(n_full),
                )
            tail = plan.nplanes % GP
            if tail:
                acc = group_step(acc, n_full, tail)
            if slot_output:
                return acc[0], acc[1]
            return _finalize(arrays, acc[0], acc[1])

        return predict_pallas_group

    if mode.startswith("pallas"):

        NSEG = plan.num_y_segments
        SY = plan.seg_lanes
        SEGW = plan.seg_width

        @jax.jit
        def predict_pallas(arrays: dict, image):
            inv_corr, nm1s = _geometry_maps(plan, arrays)
            img0 = jnp.asarray(image, jnp.float32) * inv_corr
            # (8, V) DMA layout: rows 4-7 are never read by degrid.
            data = _kernel_dma_rows(plan, arrays)

            def degrid_segment(p, g, alloc_re, alloc_im, w_p):
                return degrid_plane(
                    arrays["step_val"][p, g],
                    arrays["step_aux"][p, g],
                    arrays["step_aux2"][p, g],
                    arrays["first_block"][p, g],
                    arrays["last_blocks"][p, g],
                    arrays["block_oy"],
                    arrays["step_count"][p, g][None],
                    jnp.full((1,), g * SY, jnp.int32),
                    data,
                    alloc_re,
                    alloc_im,
                    w_p,
                )

            def plane_body(carry, p):
                acc = carry
                w_p = arrays["plane_w"][p]
                alloc_re, alloc_im = _screened_alloc(
                    arrays, img0, w_p, nm1s
                )
                if NSEG == 1:
                    contrib = degrid_segment(
                        p, 0, alloc_re, alloc_im, w_p
                    )
                else:
                    contrib = jnp.zeros_like(carry)
                    for g in range(NSEG):
                        contrib = contrib + degrid_segment(
                            p,
                            g,
                            alloc_re[:, g * SY : g * SY + SEGW],
                            alloc_im[:, g * SY : g * SY + SEGW],
                            w_p,
                        )
                return acc + contrib, None

            acc, _ = lax.scan(
                plane_body,
                jnp.zeros((2, num_slots), jnp.float32),
                jnp.arange(plan.nplanes),
            )
            if slot_output:
                return acc[0], acc[1]
            return _finalize(arrays, acc[0], acc[1])

        return predict_pallas

    @jax.jit
    def predict(arrays: dict, image):
        inv_corr, nm1s = _geometry_maps(plan, arrays)
        img0 = jnp.asarray(image, jnp.float32) * inv_corr

        def plane_body(carry, p):
            acc_re, acc_im = carry
            w_p = arrays["plane_w"][p]
            active_row = arrays["active_table"][p]
            active_count = arrays["active_count"][p]

            alloc_re, alloc_im = _screened_alloc(
                arrays, img0, w_p, nm1s
            )

            def chunk_body(carry, ci):
                start = ci * G

                def run(carry):
                    acc_re, acc_im = carry
                    idxs = lax.dynamic_slice(active_row, (start,), (G,))
                    valid = idxs >= 0
                    bs = jnp.maximum(idxs, 0)
                    ax, ay, s, lane, ws, ox, oy = _group_kernel_matrices(
                        plan, arrays, bs
                    )
                    if plan.wstacking:
                        kw = es_kernel_jnp(
                            (w_p - ws) * inv_whalf, plan.beta
                        )
                    else:
                        kw = jnp.ones_like(ws)
                    amp = jnp.where(lane & valid[:, None], kw, 0.0)

                    patch_re = jax.vmap(
                        lambda o1, o2: lax.dynamic_slice(
                            alloc_re, (o1, o2), (PX, PY)
                        )
                    )(ox, oy)
                    patch_im = jax.vmap(
                        lambda o1, o2: lax.dynamic_slice(
                            alloc_im, (o1, o2), (PX, PY)
                        )
                    )(ox, oy)
                    tmp_re = jnp.einsum(
                        "gbp,gpq->gbq", ax, patch_re, precision=_HIGHEST
                    )
                    tmp_im = jnp.einsum(
                        "gbp,gpq->gbq", ax, patch_im, precision=_HIGHEST
                    )
                    con_re = jnp.sum(tmp_re * ay, axis=2) * amp
                    con_im = jnp.sum(tmp_im * ay, axis=2) * amp

                    # Unrolled accumulate (see invert)
                    acc_re, acc_im = carry
                    for g in range(G):
                        cur_re = lax.dynamic_slice(acc_re, (s[g],), (B,))
                        cur_im = lax.dynamic_slice(acc_im, (s[g],), (B,))
                        acc_re = lax.dynamic_update_slice(
                            acc_re, cur_re + con_re[g], (s[g],)
                        )
                        acc_im = lax.dynamic_update_slice(
                            acc_im, cur_im + con_im[g], (s[g],)
                        )
                    return acc_re, acc_im

                return (
                    _maybe_cond(start < active_count, run, carry),
                    None,
                )

            (acc_re, acc_im), _ = lax.scan(
                chunk_body, (acc_re, acc_im), jnp.arange(num_chunks)
            )
            return (acc_re, acc_im), None

        zeros = jnp.zeros((num_slots,), jnp.float32)
        (acc_re, acc_im), _ = lax.scan(
            plane_body, (zeros, zeros), jnp.arange(plan.nplanes)
        )
        if slot_output:
            return acc_re, acc_im
        return _finalize(arrays, acc_re, acc_im)

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
    sigma: float | str = 2.0,
) -> np.ndarray:
    """
    Unnormalized dirty image of weighted visibilities — the drop-in
    analog of ducc0's ``ms2dirty`` as the reference calls it
    (reference: invert.py:170-183). ``visibilities``/``weights`` have
    shape (nrow, nchan); returns a float32 (npix, npix) numpy array.
    """
    compact = resolve_gridder_mode(None).startswith("pallas")
    plan = make_plan(
        uvw,
        channel_frequencies,
        num_pixels,
        pixel_size_lm,
        epsilon=epsilon,
        do_wstacking=do_wstacking,
        sigma=sigma,
        export_packed=not compact,
    )
    weighted = np.asarray(visibilities, np.complex64) * np.asarray(
        weights, np.float32
    )
    if compact:
        # Compact path (Pallas mode): ~2.2x fewer staged bytes; the
        # device prologue rebuilds packed rows + slot visibilities.
        # The compiled prologue+invert executable persists in the AOT
        # cache keyed by the plan's static signature (CIP_AOT=0 opts
        # out), so repeat runs of one imaging config skip the relay
        # compile entirely.
        from ..utils.staging import device_put_parallel

        carrays = device_put_parallel(
            compact_plan_host_arrays(plan, uvw, channel_frequencies)
        )
        re_dev = jnp.asarray(
            np.ascontiguousarray(weighted.real.ravel())
        )
        im_dev = jnp.asarray(
            np.ascontiguousarray(weighted.imag.ravel())
        )
        assemble = build_assemble(plan)
        invert = build_invert(plan, slot_input=True)

        def dirty_fn(c, r, i):
            a, re_s, im_s = assemble(c, r, i)
            return invert(a, re_s, im_s)

        if __import__("os").environ.get("CIP_AOT", "1") == "1":
            from ..utils.aot_cache import cache_key, cached_jit

            fn = cached_jit(
                dirty_fn,
                (carrays, re_dev, im_dev),
                cache_key(
                    "dirty_compact",
                    plan.static_signature(),
                    plan.constant_signature(),
                ),
            )
        else:
            fn = jax.jit(dirty_fn)
        return np.asarray(fn(carrays, re_dev, im_dev))

    # XLA-fallback path: slot-mode staging through the host (the
    # device never reads the order/phase transform columns).
    arrays = plan_device_arrays(plan, slot_mode=True)
    invert = build_invert(plan, slot_input=True)
    slot_re, slot_im = stage_slot_vis(
        plan, weighted.real.ravel(), weighted.imag.ravel()
    )
    return np.asarray(
        invert(arrays, jnp.asarray(slot_re), jnp.asarray(slot_im))
    )


def predict_visibilities(
    uvw,
    channel_frequencies,
    image,
    pixel_size_lm: float,
    *,
    epsilon: float = 1e-4,
    do_wstacking: bool = True,
    sigma: float | str = 2.0,
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
        sigma=sigma,
    )
    arrays = plan_device_arrays(plan)
    predict = build_predict(plan)
    out_re, out_im = predict(arrays, jnp.asarray(image))
    vis = np.asarray(out_re) + 1j * np.asarray(out_im)
    return vis.reshape(len(uvw), len(channel_frequencies)).astype(
        np.complex64
    )
