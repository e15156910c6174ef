"""
Measurement operator: the forward/adjoint pair at the heart of imaging
as regularized linear least squares.

The reference stops at the dirty image (adjoint only, via ducc0
ms2dirty — reference: src/ska_sdp_cip/invert.py:152-184); this module
packages the TPU gridder's invert/predict pair as a linear operator so
major-cycle solvers run entirely on device:

    objective(I) = || sqrt(w) (G I - v) ||^2
    gradient(I)  = G* ( w (G I - v) )          (= invert of residual)

with G = degridding (predict) and G* its exact adjoint (invert).
Visibilities are carried as split (re, im) float32 pairs — the compute
path is complex-free (see ops/fft.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import cached_property

import jax.numpy as jnp
import numpy as np

from ..ops.gridder import (
    build_invert,
    build_predict,
    plan_device_arrays,
    split_complex,
)
from ..ops.plan import GridderPlan, make_plan


def as_split_pair(vis) -> tuple:
    """
    Normalize a visibility argument — complex array or (re, im) pair —
    to flattened float32 jnp arrays.
    """
    if isinstance(vis, tuple):
        re, im = vis
        return (
            jnp.asarray(re, jnp.float32).ravel(),
            jnp.asarray(im, jnp.float32).ravel(),
        )
    re, im = split_complex(np.asarray(vis).ravel())
    return jnp.asarray(re), jnp.asarray(im)


@dataclass
class MeasurementOperator:
    """
    Forward (image -> visibilities) and adjoint (visibilities -> image)
    measurement operators for one visibility set at one imaging
    configuration. All heavy methods are jit-compiled closures over a
    static gridding plan; arrays live on device.
    """

    plan: GridderPlan
    arrays: dict = field(repr=False)
    weights: jnp.ndarray = field(repr=False)  # effective weights, (V,)

    @classmethod
    def build(
        cls,
        uvw: np.ndarray,
        channel_frequencies: np.ndarray,
        weights: np.ndarray,
        num_pixels: int,
        pixel_size_lm: float,
        *,
        epsilon: float = 1e-4,
        do_wstacking: bool = True,
    ) -> "MeasurementOperator":
        """Plan and stage a measurement operator for the given geometry."""
        plan = make_plan(
            uvw,
            channel_frequencies,
            num_pixels,
            pixel_size_lm,
            epsilon=epsilon,
            do_wstacking=do_wstacking,
        )
        weights_flat = np.zeros(plan.num_vis, np.float32)
        raveled = np.asarray(weights, np.float32).ravel()
        weights_flat[: len(raveled)] = raveled
        return cls(
            plan=plan,
            arrays=plan_device_arrays(plan),
            weights=jnp.asarray(weights_flat),
        )

    @cached_property
    def _invert(self):
        return build_invert(self.plan)

    @cached_property
    def _predict(self):
        return build_predict(self.plan)

    @cached_property
    def total_weight(self) -> float:
        return float(jnp.sum(self.weights))

    def forward(self, image) -> tuple:
        """G I: model visibilities (unweighted), split (re, im), (V,)."""
        return self._predict(self.arrays, image)

    def adjoint(self, vis_re, vis_im):
        """G* x for already-weighted split visibilities: raw image."""
        num = self.plan.num_vis

        def _pad(x):
            out = jnp.zeros(num, jnp.float32)
            return out.at[: x.shape[0]].set(x)

        return self._invert(self.arrays, _pad(vis_re), _pad(vis_im))

    def dirty_image(self, vis):
        """Normalized dirty image of measured visibilities."""
        re, im = as_split_pair(vis)
        w = self.weights[: re.shape[0]]
        return self.adjoint(re * w, im * w) / self.total_weight

    def psf(self):
        """
        Point-spread function: the dirty image of unit visibilities —
        approximately 1 at the phase centre.
        """
        num = self.plan.num_vis_data
        re = jnp.ones(num, jnp.float32) * self.weights[:num]
        im = jnp.zeros(num, jnp.float32)
        return self.adjoint(re, im) / self.total_weight

    def residual_gradient(self, image, vis):
        """
        G* ( w (G I - v) ) / sum(w): the normalized gradient of the
        weighted least-squares objective — one on-device
        predict-residual-regrid round trip (the major cycle's core).
        """
        re, im = as_split_pair(vis)
        model_re, model_im = self.forward(image)
        w = self.weights[: re.shape[0]]
        res_re = (model_re[: re.shape[0]] - re) * w
        res_im = (model_im[: im.shape[0]] - im) * w
        return self.adjoint(res_re, res_im) / self.total_weight
