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


@pytest.mark.parametrize("apply_w", [False, True])
def test_invert_fused_fft_matches_xla_fft(apply_w):
    """
    Full invert with the fused-Pallas FFT (interpret mode on CPU,
    including the deferred final transpose) must match the XLA-FFT
    invert on identical staged visibilities.
    """
    from ska_sdp_cip_tpu.io.synth import synthetic_uvw
    from ska_sdp_cip_tpu.ops.gridder import (
        build_invert,
        plan_device_arrays,
        stage_slot_vis,
    )
    from ska_sdp_cip_tpu.ops.plan import make_plan

    rng = np.random.default_rng(7)
    uvw, _ = synthetic_uvw(4, 10, max_baseline_m=3000.0, seed=5)
    freqs = np.array([1.0e9, 1.05e9])
    shape = (len(uvw), len(freqs))
    vis = (
        rng.normal(size=shape) + 1j * rng.normal(size=shape)
    ).astype(np.complex64)
    wgt = rng.uniform(0.5, 2.0, size=shape).astype(np.float32)

    pixel = float(np.sin(np.radians(40.0 / 3600)))
    plan = make_plan(uvw, freqs, 128, pixel, do_wstacking=apply_w)
    assert plan.ngrid % 128 == 0
    arrays = plan_device_arrays(plan)
    weighted = vis * wgt
    s_re, s_im = stage_slot_vis(
        plan, weighted.real.ravel(), weighted.imag.ravel()
    )
    s_re, s_im = jnp.asarray(s_re), jnp.asarray(s_im)

    img_xla = np.asarray(
        build_invert(plan, slot_input=True, fft_impl="xla")(
            arrays, s_re, s_im
        )
    )
    img_fused = np.asarray(
        build_invert(plan, slot_input=True, fft_impl="pallas")(
            arrays, s_re, s_im
        )
    )
    scale = np.abs(img_xla).max()
    np.testing.assert_allclose(
        img_fused, img_xla, atol=3e-5 * scale, rtol=0
    )


@pytest.mark.parametrize("sign", [+1, -1])
def test_fused_in_crop_matches_xla(sign):
    n, m, size, c0 = 96, 128, 48, 24
    plan = make_fft_plan(n, shifted=True)
    from ska_sdp_cip_tpu.ops.fft_pallas import fft2_from_image_fused

    meta = fused_pass_meta(plan, None, in_crop=(c0, size))
    host = fused_pass_host_arrays(plan, meta, sign=sign, prefix="fq")
    f = {k: jnp.asarray(v) for k, v in host.items()}
    fx = fft_plan_arrays(plan)
    rng = np.random.default_rng(11)
    re = jnp.asarray(rng.normal(size=(size, m)).astype(np.float32))
    im = jnp.asarray(rng.normal(size=(size, m)).astype(np.float32))

    ref_r, ref_i = fft_first_axis(re, im, fx, sign=sign, in_crop=(c0, size))
    got_r, got_i = fft_first_axis_fused(
        re, im, f, meta=meta, prefix="fq", interpret=True
    )
    scale = float(jnp.abs(ref_r).max())
    np.testing.assert_allclose(
        np.asarray(got_r), np.asarray(ref_r), atol=2e-5 * scale
    )
    np.testing.assert_allclose(
        np.asarray(got_i), np.asarray(ref_i), atol=2e-5 * scale
    )


def test_fused_fft2_from_image_matches_xla():
    n, npix = 256, 128
    crop0 = (n - npix) // 2
    plan = make_fft_plan(n, shifted=True)
    from ska_sdp_cip_tpu.ops.fft_pallas import fft2_from_image_fused

    meta = fused_pass_meta(plan, None, in_crop=(crop0, npix))
    host = fused_pass_host_arrays(plan, meta, sign=-1, prefix="fq")
    f = {k: jnp.asarray(v) for k, v in host.items()}
    fx = fft_plan_arrays(plan)
    rng = np.random.default_rng(12)
    re = jnp.asarray(rng.normal(size=(npix, npix)).astype(np.float32))
    im = jnp.asarray(rng.normal(size=(npix, npix)).astype(np.float32))

    r1, i1 = fft_last_axis(re, im, fx, sign=-1, in_crop=(crop0, npix))
    ref_r, ref_i = fft_first_axis(
        r1, i1, fx, sign=-1, in_crop=(crop0, npix)
    )
    got_r, got_i = fft2_from_image_fused(
        f, re, im, meta=meta, prefix="fq", interpret=True
    )
    scale = float(jnp.abs(ref_r).max())
    np.testing.assert_allclose(
        np.asarray(got_r), np.asarray(ref_r), atol=5e-5 * scale
    )
    np.testing.assert_allclose(
        np.asarray(got_i), np.asarray(ref_i), atol=5e-5 * scale
    )


def test_predict_fused_fft_matches_xla_fft():
    """
    Full predict (degrid) with the fused in-cropped forward FFT must
    match the XLA-FFT predict on the same model image.
    """
    from ska_sdp_cip_tpu.io.synth import synthetic_uvw
    from ska_sdp_cip_tpu.ops.gridder import (
        build_predict,
        plan_device_arrays,
    )
    from ska_sdp_cip_tpu.ops.plan import make_plan

    rng = np.random.default_rng(8)
    uvw, _ = synthetic_uvw(4, 10, max_baseline_m=3000.0, seed=5)
    freqs = np.array([1.0e9, 1.05e9])
    pixel = float(np.sin(np.radians(40.0 / 3600)))
    plan = make_plan(uvw, freqs, 128, pixel)
    arrays = plan_device_arrays(plan)
    image = jnp.asarray(
        rng.normal(size=(128, 128)).astype(np.float32)
    )

    re_x, im_x = build_predict(plan, fft_impl="xla")(arrays, image)
    re_f, im_f = build_predict(plan, fft_impl="pallas")(arrays, image)
    scale = float(jnp.abs(re_x).max())
    np.testing.assert_allclose(
        np.asarray(re_f), np.asarray(re_x), atol=3e-5 * scale, rtol=0
    )
    np.testing.assert_allclose(
        np.asarray(im_f), np.asarray(im_x), atol=3e-5 * scale, rtol=0
    )


def test_resolve_fft_impl_validation():
    from ska_sdp_cip_tpu.io.synth import synthetic_uvw
    from ska_sdp_cip_tpu.ops.gridder import resolve_fft_impl
    from ska_sdp_cip_tpu.ops.plan import make_plan

    uvw, _ = synthetic_uvw(2, 8, max_baseline_m=2000.0, seed=3)
    freqs = np.array([1.0e9])
    pixel = float(np.sin(np.radians(40.0 / 3600)))
    plan = make_plan(uvw, freqs, 100, pixel)  # npix not lane-aligned

    assert resolve_fft_impl(plan, "xla") == "xla"
    assert resolve_fft_impl(plan, "auto") == "xla"  # misaligned/CPU
    with pytest.raises(ValueError, match="multiples of 128"):
        resolve_fft_impl(plan, "pallas")
    with pytest.raises(ValueError, match="unknown"):
        resolve_fft_impl(plan, "nope")


def test_tiled_input_pass_matches_baseline():
    """The pretile restructure + tiled-input fused pass must equal the
    strided-input baseline exactly (same kernel math, different DMA
    layout)."""
    from ska_sdp_cip_tpu.ops.fft import make_fft_plan
    from ska_sdp_cip_tpu.ops.fft_pallas import (
        fft_first_axis_fused,
        fused_pass_host_arrays,
        fused_pass_meta,
        pretile_first_axis,
    )

    n, npix = 512, 256
    crop0 = (n - npix) // 2
    plan = make_fft_plan(n, shifted=True)
    meta = fused_pass_meta(plan, (crop0, npix))
    f = {
        k: jnp.asarray(v)
        for k, v in fused_pass_host_arrays(
            plan, meta, sign=+1, prefix="fp"
        ).items()
    }
    rng = np.random.default_rng(7)
    re = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))
    im = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))
    r0, i0 = fft_first_axis_fused(
        re, im, f, meta=meta, prefix="fp", interpret=True
    )
    tr, ti = pretile_first_axis(re, im, meta=meta, interpret=True)
    r1, i1 = fft_first_axis_fused(
        tr, ti, f, meta=meta, prefix="fp", interpret=True, tiled=True
    )
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r0))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i0))
