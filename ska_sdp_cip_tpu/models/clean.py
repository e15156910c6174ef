"""
On-device deconvolution: Hogbom minor cycle + Cotton-Schwab-style
major cycle.

The reference computes dirty images only ("no deconvolution/CLEAN yet",
SURVEY.md section 0); this is the solver layer the tiled invert/predict
pair exists to feed (north star in BASELINE.json: major-cycle
first-order iterations — gradient = grid(residual) — fully on device,
no host round-trips inside a cycle).

The minor cycle is a ``lax.while_loop`` peak-find/subtract over a
padded residual frame; the major cycle recomputes exact residuals
through the measurement operator (predict -> weight -> invert), so
minor-cycle approximation error does not accumulate.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from .operators import MeasurementOperator


def pick_psf_patch(npix: int) -> int | None:
    """
    Default minor-cycle PSF truncation for an ``npix`` image: None
    (exact Hogbom) below 4096 px; a 2048-cell central patch above —
    full-frame subtraction costs O(npix^2) HBM traffic per iteration
    (~0.8 GB at 10240 px), which the Clark-style patch path avoids.
    The major cycle recomputes exact residuals through the measurement
    operator, so the truncation does not accumulate.
    """
    return None if npix < 4096 else 2048


def _minor_block(npix: int, psf_patch: int) -> int:
    """Largest power-of-two block (<= 256) tiling npix and psf_patch."""
    for block in (256, 128, 64, 32, 16, 8, 4, 2, 1):
        if npix % block == 0 and psf_patch % block == 0:
            return block
    return 1


@partial(
    jax.jit, static_argnames=("gain", "max_iter", "psf_patch")
)
def hogbom_clean(
    dirty,
    psf,
    *,
    gain: float = 0.1,
    max_iter: int = 100,
    threshold: float = 0.0,
    psf_patch: int | None = None,
):
    """
    Hogbom CLEAN minor cycle, fully on device.

    ``dirty`` and ``psf`` are (npix, npix) with the PSF peak at the
    centre pixel. Iterates: find the absolute peak, add
    ``gain * peak`` to the model there, subtract the shifted scaled
    PSF — until ``max_iter`` or ``|peak| <= threshold``.

    With ``psf_patch`` (an even number of cells dividing into blocks),
    the subtraction uses only the PSF's central (patch, patch) window
    and the peak search runs on incrementally-maintained per-block
    maxima — the Clark-style fast minor cycle. Cost per iteration drops
    from O(npix^2) to O(psf_patch^2): the production-scale path
    (:func:`pick_psf_patch`). PSF sidelobes outside the patch are not
    subtracted within the minor cycle; the major cycle's exact residual
    recomputation absorbs the approximation (Clark 1980's "major/minor"
    split — our major cycle is the measurement operator itself).

    Returns ``(model, residual)``.
    """
    npix = dirty.shape[0]
    if psf_patch is not None and psf_patch < npix:
        return _clark_minor(
            dirty,
            psf,
            gain=gain,
            max_iter=max_iter,
            threshold=threshold,
            psf_patch=int(psf_patch),
        )
    return _hogbom_exact(
        dirty, psf, gain=gain, max_iter=max_iter, threshold=threshold
    )


def _hogbom_exact(
    dirty,
    psf,
    *,
    gain: float,
    max_iter: int,
    threshold: float,
):
    """Full-PSF Hogbom (exact within the minor cycle)."""
    npix = dirty.shape[0]
    half = npix // 2

    psf = psf / psf[half, half]

    # Residual lives in a (2 npix, 2 npix) frame so PSF subtraction is
    # a single dynamic_update_slice with no boundary cases.
    frame = jnp.zeros((2 * npix, 2 * npix), dirty.dtype)
    frame = lax.dynamic_update_slice(frame, dirty, (half, half))
    model0 = jnp.zeros_like(dirty)

    def peak_of(frame):
        inner = lax.dynamic_slice(frame, (half, half), (npix, npix))
        flat_idx = jnp.argmax(jnp.abs(inner))
        return flat_idx, inner.reshape(-1)[flat_idx]

    def cond(state):
        _, _, it, peak_abs = state
        return jnp.logical_and(it < max_iter, peak_abs > threshold)

    def body(state):
        frame, model, it, _ = state
        flat_idx, peak = peak_of(frame)
        i = flat_idx // npix
        j = flat_idx % npix
        model = model.at[i, j].add(gain * peak)
        window = lax.dynamic_slice(frame, (i, j), (npix, npix))
        frame = lax.dynamic_update_slice(
            frame, window - gain * peak * psf, (i, j)
        )
        _, next_peak = peak_of(frame)
        return frame, model, it + 1, jnp.abs(next_peak)

    _, peak0 = peak_of(frame)
    frame, model, _, _ = lax.while_loop(
        cond, body, (frame, model0, jnp.int32(0), jnp.abs(peak0))
    )
    residual = lax.dynamic_slice(frame, (half, half), (npix, npix))
    return model, residual


def _clark_minor(
    dirty,
    psf,
    *,
    gain: float,
    max_iter: int,
    threshold: float,
    psf_patch: int,
):
    """
    Clark-style fast minor cycle: truncated-PSF subtraction plus an
    incrementally-maintained per-block maximum pyramid, so neither the
    peak search nor the subtraction ever touches the full frame.
    """
    npix = dirty.shape[0]
    half = npix // 2
    P = psf_patch
    if P % 2:
        raise ValueError("psf_patch must be even")
    block = _minor_block(npix, P)
    nb = npix // block
    K = P // block + 1  # blocks (per axis) a patch can touch

    psf = psf / psf[half, half]
    psf_win = lax.dynamic_slice(
        psf, (half - P // 2, half - P // 2), (P, P)
    )

    pad = P // 2
    frame = jnp.zeros((npix + P, npix + P), dirty.dtype)
    frame = lax.dynamic_update_slice(frame, dirty, (pad, pad))
    model0 = jnp.zeros_like(dirty)
    block_max0 = jnp.max(
        jnp.abs(dirty.reshape(nb, block, nb, block)), axis=(1, 3)
    )

    def cond(state):
        _, _, _, it, peak_abs = state
        return jnp.logical_and(it < max_iter, peak_abs > threshold)

    def body(state):
        frame, model, block_max, it, _ = state
        # Two-level peak find: coarse block, then within the block.
        coarse = jnp.argmax(block_max)
        bi = coarse // nb
        bj = coarse % nb
        tile = lax.dynamic_slice(
            frame, (pad + bi * block, pad + bj * block), (block, block)
        )
        fine = jnp.argmax(jnp.abs(tile))
        i = bi * block + fine // block
        j = bj * block + fine % block
        peak = tile.reshape(-1)[fine]

        model = model.at[i, j].add(gain * peak)
        # Peak sits at frame (i+pad, j+pad); the patch (centre at
        # (P/2, P/2)) therefore starts at frame (i, j).
        window = lax.dynamic_slice(frame, (i, j), (P, P))
        frame = lax.dynamic_update_slice(
            frame, window - gain * peak * psf_win, (i, j)
        )

        # Refresh the K x K block neighbourhood the patch touched.
        bi0 = jnp.clip((i - P // 2) // block, 0, nb - K)
        bj0 = jnp.clip((j - P // 2) // block, 0, nb - K)
        region = lax.dynamic_slice(
            frame,
            (pad + bi0 * block, pad + bj0 * block),
            (K * block, K * block),
        )
        refreshed = jnp.max(
            jnp.abs(region.reshape(K, block, K, block)), axis=(1, 3)
        )
        block_max = lax.dynamic_update_slice(
            block_max, refreshed, (bi0, bj0)
        )
        return frame, model, block_max, it + 1, jnp.max(block_max)

    frame, model, _, _, _ = lax.while_loop(
        cond,
        body,
        (
            frame,
            model0,
            block_max0,
            jnp.int32(0),
            jnp.max(block_max0),
        ),
    )
    residual = lax.dynamic_slice(frame, (pad, pad), (npix, npix))
    return model, residual


def major_cycle_clean(
    operator: MeasurementOperator,
    vis,
    *,
    num_major: int = 3,
    gain: float = 0.1,
    minor_iter: int = 100,
    threshold_factor: float = 0.0,
    checkpoint_dir=None,
    psf_patch: int | str | None = "auto",
):
    """
    Cotton-Schwab major cycle: each cycle computes the exact residual
    image through the measurement operator and runs a Hogbom minor
    cycle on it.

    With ``checkpoint_dir``, state is persisted after every cycle and
    a matching prior checkpoint resumes the run (SIGTERM mid-cycle
    flushes the latest completed state first) — see
    models/checkpoint.py.

    Returns ``(model, residual_image)``. The model is the CLEAN
    component image; ``model + residual`` approximates the
    deconvolved sky (restoring-beam convolution left to the caller).
    """
    from .checkpoint import MajorCycleCheckpoint, graceful_shutdown

    if psf_patch == "auto":
        psf_patch = pick_psf_patch(operator.plan.num_pixels)
    vis = operator.stage(vis)
    psf = operator.psf()
    model = jnp.zeros(
        (operator.plan.num_pixels, operator.plan.num_pixels), jnp.float32
    )

    checkpoint = None
    start_cycle = 0
    residual_image = None
    if checkpoint_dir is not None:
        checkpoint = MajorCycleCheckpoint(
            checkpoint_dir,
            {
                "num_pixels": operator.plan.num_pixels,
                "num_vis": operator.plan.num_vis_data,
                "num_major": num_major,
                "gain": gain,
                "minor_iter": minor_iter,
            },
        )
        restored = checkpoint.load()
        if restored is not None:
            start_cycle, model_np, residual_np = restored
            model = jnp.asarray(model_np)
            residual_image = jnp.asarray(residual_np)

    if residual_image is None:
        residual_image = operator.dirty_image(vis)

    state = {"cycle": start_cycle, "model": model, "res": residual_image}

    def flush():
        if checkpoint is not None:
            checkpoint.save(state["cycle"], state["model"], state["res"])

    with graceful_shutdown(flush):
        for cycle in range(start_cycle, num_major):
            threshold = threshold_factor * jnp.max(
                jnp.abs(residual_image)
            )
            delta, _ = hogbom_clean(
                residual_image,
                psf,
                gain=gain,
                max_iter=minor_iter,
                threshold=float(threshold),
                psf_patch=psf_patch,
            )
            model = model + delta
            residual_image = -operator.residual_gradient(model, vis)
            state.update(
                cycle=cycle + 1, model=model, res=residual_image
            )
            flush()
    return model, residual_image


def build_major_cycle_step(operator: MeasurementOperator, **clean_kwargs):
    """
    One fully-jitted major-cycle step ``(model, slot_re, slot_im) ->
    model'``: gradient through the measurement operator + minor cycle
    + model update, with no host round-trips — the framework's
    "training step". The visibility arguments are SLOT-staged
    (``operator.stage(vis)``), so the whole step is gather-free.
    """
    from .operators import SlotVis

    gain = clean_kwargs.get("gain", 0.1)
    minor_iter = clean_kwargs.get("minor_iter", 30)
    psf_patch = clean_kwargs.get("psf_patch", "auto")
    if psf_patch == "auto":
        psf_patch = pick_psf_patch(operator.plan.num_pixels)
    psf = operator.psf()

    @jax.jit
    def step(model, vis_re, vis_im):
        residual_image = -operator.residual_gradient(
            model, SlotVis(vis_re, vis_im)
        )
        delta, _ = hogbom_clean(
            residual_image,
            psf,
            gain=gain,
            max_iter=minor_iter,
            psf_patch=psf_patch,
        )
        return model + delta

    return step
