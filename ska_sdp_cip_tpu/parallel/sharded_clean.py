"""
Distributed major-cycle deconvolution (BASELINE.json config 5:
multi-host partitioned invert + major-cycle first-order deconvolution).

One SPMD step per major cycle, fully on device: every shard predicts
its model visibilities, forms the weighted residual, grids it, the
partial gradients are ``psum``-reduced over the mesh, and the Hogbom
minor cycle runs on the (replicated) reduced residual — so the model
update is identical on every device and no host round-trips happen
inside a cycle. The host loop only sequences cycles and handles
checkpointing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..io.visibility_dataset import VisibilityReader
from ..models.clean import hogbom_clean
from ..ops.gridder import build_invert, build_predict
from .sharded_invert import (
    _is_replicated,
    stage_sharded_inputs,
)


def sharded_major_cycle_clean(
    reader: VisibilityReader,
    num_pixels: int,
    pixel_size_asec: float,
    *,
    mesh: Mesh | None = None,
    row_chunks: int | None = None,
    freq_chunks: int | None = None,
    epsilon: float = 1e-4,
    do_wstacking: bool = True,
    weighting: str = "natural",
    robust: float = 0.0,
    num_major: int = 3,
    gain: float = 0.1,
    minor_iter: int = 100,
    recorder=None,
) -> tuple:
    """
    CLEAN a dataset over a device mesh. Returns
    ``(model, residual_image, psf)`` as numpy arrays; numerically
    matches the single-device ``models.major_cycle_clean`` to gridder
    accuracy. The PSF comes from the already-staged sharded program so
    callers never build a separate single-device operator for it.
    """
    from contextlib import nullcontext

    step = recorder.step if recorder is not None else (
        lambda name: nullcontext()
    )

    staging = stage_sharded_inputs(
        reader,
        num_pixels,
        pixel_size_asec,
        mesh=mesh,
        row_chunks=row_chunks,
        freq_chunks=freq_chunks,
        epsilon=epsilon,
        do_wstacking=do_wstacking,
        weighting=weighting,
        robust=robust,
        step=step,
    )
    axis_name = staging.axis_name
    plan0 = staging.plans[0]
    invert = build_invert(plan0, slot_input=True)
    predict = build_predict(plan0, slot_output=True)
    total_weight = staging.total_weight

    def unstack(arrays):
        return {
            key: value if _is_replicated(key) else value[0]
            for key, value in arrays.items()
        }

    def dirty_fn(arrays, vre, vim, wgt):
        arrays = unstack(arrays)
        image = invert(arrays, vre[0] * wgt[0], vim[0] * wgt[0])
        return jax.lax.psum(image, axis_name) / total_weight

    def psf_fn(arrays, wgt):
        # Unit data visibilities in slot order are the staged w-shift
        # phase factors scaled by the slot weights.
        arrays = unstack(arrays)
        image = invert(
            arrays,
            wgt[0] * arrays["phase_cos"],
            wgt[0] * arrays["phase_sin"],
        )
        return jax.lax.psum(image, axis_name) / total_weight

    def residual_of(arrays, vre, vim, wgt, dup_a, dup_b, model):
        """Exact residual image at ``model``, entirely in slot space
        (predict -> straddler group-sum -> weight -> invert -> psum)."""
        from ..ops.gridder import slot_group_sum

        model_re, model_im = predict(arrays, model)
        model_re, model_im = slot_group_sum(
            model_re, model_im, dup_a, dup_b
        )
        res_re = (vre - model_re) * wgt
        res_im = (vim - model_im) * wgt
        return (
            jax.lax.psum(invert(arrays, res_re, res_im), axis_name)
            / total_weight
        )

    def cycle_fn(
        arrays, vre, vim, wgt, dup_a, dup_b, model, psf, residual
    ):
        # One predict+invert round trip per cycle: the minor cycle
        # consumes the residual carried from the previous cycle (the
        # dirty image initially) and only the post-update residual is
        # recomputed — matching the single-device solver's return
        # semantics (models/clean.py) at half the gridding cost.
        arrays = unstack(arrays)
        delta, _ = hogbom_clean(
            residual, psf, gain=gain, max_iter=minor_iter
        )
        model = model + delta
        return model, residual_of(
            arrays, vre[0], vim[0], wgt[0], dup_a[0], dup_b[0], model
        )

    psf_spmd = jax.jit(
        jax.shard_map(
            psf_fn,
            mesh=staging.mesh,
            in_specs=(staging.in_specs(), P(axis_name)),
            out_specs=P(),
            check_vma=False,
        )
    )
    dirty_spmd = jax.jit(
        jax.shard_map(
            dirty_fn,
            mesh=staging.mesh,
            in_specs=(
                staging.in_specs(),
                P(axis_name),
                P(axis_name),
                P(axis_name),
            ),
            out_specs=P(),
            check_vma=False,
        )
    )
    cycle_spmd = jax.jit(
        jax.shard_map(
            cycle_fn,
            mesh=staging.mesh,
            in_specs=(
                staging.in_specs(),
                P(axis_name),
                P(axis_name),
                P(axis_name),
                P(axis_name),
                P(axis_name),
                P(),
                P(),
                P(),
            ),
            out_specs=(P(), P()),
            check_vma=False,
        )
    )

    with step("psf"):
        psf = psf_spmd(staging.stacked, staging.weights)
    with step("dirty"):
        residual = dirty_spmd(
            staging.stacked,
            staging.vis_re,
            staging.vis_im,
            staging.weights,
        )

    model = jnp.zeros((num_pixels, num_pixels), jnp.float32)
    for _ in range(num_major):
        with step("major_cycle"):
            model, residual = cycle_spmd(
                staging.stacked,
                staging.vis_re,
                staging.vis_im,
                staging.weights,
                staging.dup_a,
                staging.dup_b,
                model,
                psf,
                residual,
            )
    return np.asarray(model), np.asarray(residual), np.asarray(psf)
