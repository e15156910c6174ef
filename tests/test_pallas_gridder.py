"""
Pallas gridding kernel vs the pure-XLA gridder: elementwise agreement
(interpret mode on CPU; the same kernel runs compiled on TPU).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from ska_sdp_cip_tpu.io.synth import synthetic_uvw
from ska_sdp_cip_tpu.ops.gridder import (
    build_invert,
    plan_device_arrays,
    split_complex,
)
from ska_sdp_cip_tpu.ops.plan import make_plan


@pytest.mark.parametrize("apply_w", [False, True])
def test_pallas_matches_xla(apply_w):
    rng = np.random.default_rng(17)
    uvw, _ = synthetic_uvw(3, 10, max_baseline_m=5000.0, seed=23)
    freqs = np.array([1.0e9, 1.07e9])
    shape = (len(uvw), 2)
    vis = (
        rng.normal(size=shape) + 1j * rng.normal(size=shape)
    ).astype(np.complex64)
    wgt = rng.uniform(0.5, 2.0, size=shape).astype(np.float32)
    pix = float(np.sin(np.radians(40.0 / 3600)))

    plan = make_plan(
        uvw, freqs, 96, pix, epsilon=1e-4, do_wstacking=apply_w
    )
    arrays = plan_device_arrays(plan)
    re, im = split_complex((vis * wgt).ravel())
    re_pad = np.zeros(plan.num_vis, np.float32)
    im_pad = np.zeros(plan.num_vis, np.float32)
    re_pad[: len(re)], im_pad[: len(im)] = re, im
    args = (arrays, jnp.asarray(re_pad), jnp.asarray(im_pad))

    xla_image = np.asarray(build_invert(plan, gridder="xla")(*args))
    pallas_image = np.asarray(
        build_invert(plan, gridder="pallas_interpret")(*args)
    )
    np.testing.assert_allclose(
        pallas_image,
        xla_image,
        atol=2e-5 * np.abs(xla_image).max(),
        rtol=1e-3,
    )


@pytest.mark.parametrize("apply_w", [False, True])
def test_pallas_degrid_matches_xla(apply_w):
    from ska_sdp_cip_tpu.ops.gridder import build_predict

    rng = np.random.default_rng(31)
    uvw, _ = synthetic_uvw(3, 10, max_baseline_m=5000.0, seed=29)
    freqs = np.array([1.0e9, 1.07e9])
    pix = float(np.sin(np.radians(40.0 / 3600)))

    plan = make_plan(
        uvw, freqs, 96, pix, epsilon=1e-4, do_wstacking=apply_w
    )
    arrays = plan_device_arrays(plan)
    image = rng.normal(size=(96, 96)).astype(np.float32)

    xla_re, xla_im = build_predict(plan, gridder="xla")(
        arrays, jnp.asarray(image)
    )
    pal_re, pal_im = build_predict(plan, gridder="pallas_interpret")(
        arrays, jnp.asarray(image)
    )
    scale = max(
        np.abs(np.asarray(xla_re)).max(),
        np.abs(np.asarray(xla_im)).max(),
    )
    np.testing.assert_allclose(
        np.asarray(pal_re), np.asarray(xla_re), atol=2e-5 * scale
    )
    np.testing.assert_allclose(
        np.asarray(pal_im), np.asarray(xla_im), atol=2e-5 * scale
    )


@pytest.mark.parametrize("apply_w", [False, True])
def test_pallas_segmented_matches_xla(apply_w, monkeypatch):
    """
    Lane-segmented strip kernels (production-size grids exceed the
    VMEM strip-buffer budget): force multiple y-segments and check the
    seam-added result still matches the XLA path elementwise.
    """
    from ska_sdp_cip_tpu.ops import plan as plan_mod

    monkeypatch.setattr(
        plan_mod, "max_seg_width", lambda patch_x, num_buffers=4: 128
    )

    rng = np.random.default_rng(53)
    uvw, _ = synthetic_uvw(3, 10, max_baseline_m=5000.0, seed=47)
    freqs = np.array([1.0e9, 1.07e9])
    shape = (len(uvw), 2)
    vis = (
        rng.normal(size=shape) + 1j * rng.normal(size=shape)
    ).astype(np.complex64)
    wgt = rng.uniform(0.5, 2.0, size=shape).astype(np.float32)
    pix = float(np.sin(np.radians(40.0 / 3600)))

    plan = make_plan(
        uvw, freqs, 96, pix, epsilon=1e-4, do_wstacking=apply_w
    )
    assert plan.num_y_segments > 1
    arrays = plan_device_arrays(plan)
    re, im = split_complex((vis * wgt).ravel())
    re_pad = np.zeros(plan.num_vis, np.float32)
    im_pad = np.zeros(plan.num_vis, np.float32)
    re_pad[: len(re)], im_pad[: len(im)] = re, im
    args = (arrays, jnp.asarray(re_pad), jnp.asarray(im_pad))

    xla_image = np.asarray(build_invert(plan, gridder="xla")(*args))
    pallas_image = np.asarray(
        build_invert(plan, gridder="pallas_interpret")(*args)
    )
    np.testing.assert_allclose(
        pallas_image,
        xla_image,
        atol=2e-5 * np.abs(xla_image).max(),
        rtol=1e-3,
    )

    from ska_sdp_cip_tpu.ops.gridder import build_predict

    image = rng.normal(size=(96, 96)).astype(np.float32)
    xla_re, xla_im = build_predict(plan, gridder="xla")(
        arrays, jnp.asarray(image)
    )
    pal_re, pal_im = build_predict(plan, gridder="pallas_interpret")(
        arrays, jnp.asarray(image)
    )
    scale = max(
        np.abs(np.asarray(xla_re)).max(),
        np.abs(np.asarray(xla_im)).max(),
    )
    np.testing.assert_allclose(
        np.asarray(pal_re), np.asarray(xla_re), atol=2e-5 * scale
    )
    np.testing.assert_allclose(
        np.asarray(pal_im), np.asarray(xla_im), atol=2e-5 * scale
    )


@pytest.mark.parametrize("block", [256, 512, 1024])
def test_pallas_larger_blocks_match_xla(block):
    """
    The auto-block heuristic (ops/plan.py:auto_block) picks 256/512/
    1024-vis blocks on production-size shards; pin the kernel's
    correctness at those block sizes (multi-K-pass MXU contractions,
    bigger DMAs).
    """
    rng = np.random.default_rng(41)
    uvw, _ = synthetic_uvw(4, 12, max_baseline_m=5000.0, seed=37)
    freqs = np.array([1.0e9, 1.07e9, 1.12e9])
    shape = (len(uvw), 3)
    vis = (
        rng.normal(size=shape) + 1j * rng.normal(size=shape)
    ).astype(np.complex64)
    wgt = rng.uniform(0.5, 2.0, size=shape).astype(np.float32)
    pix = float(np.sin(np.radians(40.0 / 3600)))

    plan = make_plan(uvw, freqs, 96, pix, epsilon=1e-4, block=block)
    assert plan.block == block
    arrays = plan_device_arrays(plan)
    re, im = split_complex((vis * wgt).ravel())
    re_pad = np.zeros(plan.num_vis, np.float32)
    im_pad = np.zeros(plan.num_vis, np.float32)
    re_pad[: len(re)], im_pad[: len(im)] = re, im
    args = (arrays, jnp.asarray(re_pad), jnp.asarray(im_pad))

    xla_image = np.asarray(build_invert(plan, gridder="xla")(*args))
    pallas_image = np.asarray(
        build_invert(plan, gridder="pallas_interpret")(*args)
    )
    np.testing.assert_allclose(
        pallas_image,
        xla_image,
        atol=2e-5 * np.abs(xla_image).max(),
        rtol=1e-3,
    )


@pytest.mark.parametrize("group", [2, 3, 4])
def test_plane_group_matches_single_plane(monkeypatch, group):
    """
    Plane-group scheduling (CIP_PLANE_GROUP, w-stacking default G=2)
    must reproduce the single-plane kernels' images and visibilities —
    the group kernels share one ES build across G resident planes but
    the per-plane arithmetic is identical. G=3 exercises ragged group
    tails.
    """
    from ska_sdp_cip_tpu.ops.gridder import build_predict

    rng = np.random.default_rng(61)
    uvw, _ = synthetic_uvw(3, 10, max_baseline_m=5000.0, seed=59)
    freqs = np.array([1.0e9, 1.07e9])
    shape = (len(uvw), 2)
    vis = (
        rng.normal(size=shape) + 1j * rng.normal(size=shape)
    ).astype(np.complex64)
    wgt = rng.uniform(0.5, 2.0, size=shape).astype(np.float32)
    pix = float(np.sin(np.radians(40.0 / 3600)))
    image = rng.normal(size=(96, 96)).astype(np.float32)

    results = {}
    for flag in ("1", str(group)):
        monkeypatch.setenv("CIP_PLANE_GROUP", flag)
        plan = make_plan(uvw, freqs, 96, pix, epsilon=1e-4)
        assert plan.plane_group == int(flag)
        assert plan.num_step_rows == -(-plan.nplanes // int(flag))
        arrays = plan_device_arrays(plan)
        re, im = split_complex((vis * wgt).ravel())
        re_pad = np.zeros(plan.num_vis, np.float32)
        im_pad = np.zeros(plan.num_vis, np.float32)
        re_pad[: len(re)], im_pad[: len(im)] = re, im
        inv = build_invert(plan, gridder="pallas_interpret")
        img = np.asarray(
            inv(arrays, jnp.asarray(re_pad), jnp.asarray(im_pad))
        )
        pre = build_predict(plan, gridder="pallas_interpret")
        out_re, out_im = pre(arrays, jnp.asarray(image))
        results[flag] = (img, np.asarray(out_re), np.asarray(out_im))

    img0, pre_re0, pre_im0 = results["1"]
    img1, pre_re1, pre_im1 = results[str(group)]
    np.testing.assert_allclose(
        img1, img0, atol=1e-6 * np.abs(img0).max(), rtol=1e-5
    )
    # Predict sums each group's G plane contributions before the
    # accumulator add — float32 ordering noise ~1e-6 relative at G=4.
    scale = max(np.abs(pre_re0).max(), np.abs(pre_im0).max())
    np.testing.assert_allclose(pre_re1, pre_re0, atol=5e-6 * scale)
    np.testing.assert_allclose(pre_im1, pre_im0, atol=5e-6 * scale)


def test_plane_group_resolution(monkeypatch):
    from ska_sdp_cip_tpu.ops.plan import plane_group_of

    monkeypatch.delenv("CIP_PLANE_PAIR", raising=False)
    monkeypatch.delenv("CIP_PLANE_GROUP", raising=False)
    assert plane_group_of(True, 9) == 2
    assert plane_group_of(True, 1) == 1
    assert plane_group_of(False, 1) == 1
    monkeypatch.setenv("CIP_PLANE_GROUP", "4")
    assert plane_group_of(True, 9) == 4
    assert plane_group_of(False, 9) == 1
    monkeypatch.setenv("CIP_PLANE_GROUP", "0")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        plane_group_of(True, 9)
    # Legacy CIP_PLANE_PAIR spelling maps 0/1 -> groups 1/2
    monkeypatch.delenv("CIP_PLANE_GROUP", raising=False)
    monkeypatch.setenv("CIP_PLANE_PAIR", "0")
    assert plane_group_of(True, 9) == 1
    monkeypatch.setenv("CIP_PLANE_PAIR", "1")
    assert plane_group_of(True, 9) == 2


def test_auto_block_thresholds():
    from ska_sdp_cip_tpu.ops.plan import auto_block

    assert auto_block(10_000) == 128
    assert auto_block(2_000_000) == 256
    assert auto_block(4_500_000) == 512
    assert auto_block(6_000_000) == 1024


def test_patch_height_env_override(monkeypatch):
    """CIP_PATCH_X reaches the plan; clamps below the support need."""
    from ska_sdp_cip_tpu.ops import plan as plan_mod

    rng = np.random.default_rng(11)
    uvw, _ = synthetic_uvw(2, 8, max_baseline_m=2000.0, seed=9)
    freqs = np.array([1.0e9])
    pix = float(np.sin(np.radians(40.0 / 3600)))

    monkeypatch.setenv("CIP_PATCH_X", "64")
    plan = make_plan(uvw, freqs, 64, pix, epsilon=1e-4)
    assert plan.patch_x == 64

    monkeypatch.setenv("CIP_PATCH_X", "16")
    plan = make_plan(uvw, freqs, 64, pix, epsilon=1e-5)
    # epsilon=1e-5 needs support 7-10; 16 rows cannot hold the
    # footprint plus one 8-row tile column, so the plan clamps up.
    assert plan.patch_x >= plan.support + 8

    monkeypatch.setenv("CIP_PATCH_X", "20")
    with pytest.raises(ValueError, match="multiple of 8"):
        make_plan(uvw, freqs, 64, pix)


def test_max_seg_width_budget():
    """Strip budget: four (patch_x, width) f32 buffers <= ~10 MiB."""
    from ska_sdp_cip_tpu.ops.plan import _SEG_BUDGET_BYTES, max_seg_width

    for patch_x in (32, 48, 64, 128):
        width = max_seg_width(patch_x)
        assert width % 128 == 0
        assert 4 * patch_x * width * 4 <= _SEG_BUDGET_BYTES
        # and maximal: one more lane tile would bust the budget
        assert 4 * patch_x * (width + 128) * 4 > _SEG_BUDGET_BYTES
