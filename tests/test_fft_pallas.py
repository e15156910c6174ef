"""
Fused Pallas FFT pass vs the XLA matmul FFT (interpret mode).

The fused kernel must reproduce ops.fft.fft_first_axis (same factor
plans, same crop pruning) to bf16x3 accuracy; the 2-D composition
must match the gridder's _fft2_to_image contract.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from ska_sdp_cip_tpu.ops.fft import (
    fft_first_axis,
    fft_last_axis,
    fft_plan_arrays,
    make_fft_plan,
)
from ska_sdp_cip_tpu.ops.fft_pallas import (
    fft2_to_image_fused,
    fft_first_axis_fused,
    fused_pass_host_arrays,
    fused_pass_meta,
)


def _setup(n, crop, sign):
    plan = make_fft_plan(n, shifted=True)
    meta = fused_pass_meta(plan, crop)
    host = fused_pass_host_arrays(plan, meta, sign=sign, prefix="fp")
    f = {k: jnp.asarray(v) for k, v in host.items()}
    return plan, meta, f


@pytest.mark.parametrize("sign", [+1, -1])
@pytest.mark.parametrize("crop", [None, (24, 48)])
def test_fused_first_axis_matches_xla(sign, crop):
    n, m = 96, 128
    plan, meta, f = _setup(n, crop, sign)
    fx = fft_plan_arrays(plan)
    rng = np.random.default_rng(3)
    re = jnp.asarray(rng.normal(size=(n, m)).astype(np.float32))
    im = jnp.asarray(rng.normal(size=(n, m)).astype(np.float32))

    ref_r, ref_i = fft_first_axis(re, im, fx, sign=sign, out_crop=crop)
    got_r, got_i = fft_first_axis_fused(
        re, im, f, meta=meta, prefix="fp", interpret=True
    )
    scale = float(jnp.abs(ref_r).max())
    np.testing.assert_allclose(
        np.asarray(got_r), np.asarray(ref_r), atol=2e-5 * scale
    )
    np.testing.assert_allclose(
        np.asarray(got_i), np.asarray(ref_i), atol=2e-5 * scale
    )


def test_fused_fft2_matches_xla_composition():
    n, npix = 256, 128
    crop0 = (n - npix) // 2
    plan, meta, f = _setup(n, (crop0, npix), +1)
    fx = fft_plan_arrays(plan)
    rng = np.random.default_rng(5)
    re = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))
    im = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))

    r1, i1 = fft_last_axis(re, im, fx, sign=+1, out_crop=(crop0, npix))
    ref_r, ref_i = fft_first_axis(
        r1, i1, fx, sign=+1, out_crop=(crop0, npix)
    )
    got_r, got_i = fft2_to_image_fused(
        f, re, im, meta=meta, prefix="fp", interpret=True
    )
    scale = float(jnp.abs(ref_r).max())
    np.testing.assert_allclose(
        np.asarray(got_r), np.asarray(ref_r), atol=5e-5 * scale
    )
    np.testing.assert_allclose(
        np.asarray(got_i), np.asarray(ref_i), atol=5e-5 * scale
    )
