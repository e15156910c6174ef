"""
First-order regularized least-squares imaging (FISTA).

The north-star formulation (BASELINE.json): imaging as

    min_I  || sqrt(w) (G I - v) ||^2  +  lam * || I ||_1  (+ I >= 0)

solved with accelerated proximal gradient iterations whose gradient is
one on-device predict-residual-regrid round trip through the
measurement operator — the "major-cycle first-order iteration". Every
step is jit-compiled; the host loop only sequences iterations.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .operators import MeasurementOperator


def power_method_step_size(
    operator: MeasurementOperator, iterations: int = 8
) -> float:
    """
    1 / L with L an estimate of the largest eigenvalue of the normal
    operator G* w G / sum(w) (power iteration through the jitted
    forward/adjoint pair). The PSF peak normalization makes L ~ 1;
    the estimate tightens the step.
    """
    npix = operator.plan.num_pixels
    x = jnp.ones((npix, npix), jnp.float32)
    eigenvalue = 1.0
    for _ in range(iterations):
        re, im = operator.forward(x)
        w = operator.weights[: re.shape[0]]
        y = operator.adjoint(re * w, im * w) / operator.total_weight
        eigenvalue = float(jnp.sqrt(jnp.sum(y * y)))
        x = y / eigenvalue
    return 1.0 / max(eigenvalue, 1e-6)


def fista_clean(
    operator: MeasurementOperator,
    vis,
    *,
    num_iter: int = 20,
    lam_factor: float = 1e-3,
    nonneg: bool = True,
    step_size: float | None = None,
):
    """
    Run FISTA; returns ``(model, residual_image, objective_trace)``.

    ``lam_factor`` sets the soft-threshold as a fraction of the dirty
    peak (scale-free across datasets). The residual image returned is
    the gradient image at the final model (same normalization as the
    dirty image).
    """
    vis = operator.stage(vis)
    npix = operator.plan.num_pixels
    dirty = operator.dirty_image(vis)
    lam = lam_factor * float(jnp.max(jnp.abs(dirty)))
    if step_size is None:
        step_size = power_method_step_size(operator)

    @jax.jit
    def step(x, y, t):
        gradient = operator.residual_gradient(y, vis)
        z = y - step_size * gradient
        # prox of lam ||.||_1 (+ nonnegativity)
        threshold = lam * step_size
        z = jnp.sign(z) * jnp.maximum(jnp.abs(z) - threshold, 0.0)
        if nonneg:
            z = jnp.maximum(z, 0.0)
        t_next = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
        y_next = z + ((t - 1.0) / t_next) * (z - x)
        return z, y_next, t_next, gradient

    x = jnp.zeros((npix, npix), jnp.float32)
    y = x
    t = jnp.float32(1.0)
    trace = []
    gradient = dirty
    for _ in range(num_iter):
        x, y, t, gradient = step(x, y, t)
        trace.append(float(jnp.max(jnp.abs(gradient))))

    residual = -operator.residual_gradient(x, vis)
    return (
        np.asarray(x),
        np.asarray(residual),
        np.asarray(trace, dtype=np.float64),
    )
