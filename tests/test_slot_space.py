"""
Slot-space operator tests: the production hot path stages visibilities
ONCE into gridder slot order (gather + conjugate flip + w-shift phase
on the host) and every invert/predict afterwards is gather-free. These
tests pin the slot path to the data-space path:

* ``build_invert(slot_input=True)`` over ``stage_slot_vis`` output
  equals the data-space invert;
* ``build_predict(slot_output=True)`` + straddler group-sum +
  manual finalize equals the data-space predict;
* the slot-space residual gradient (the major cycle's core) equals the
  explicit data-space computation — this is the test that fails if the
  duplicated lane-straddler bookkeeping (``slot_duplicate_pairs`` /
  ``slot_group_sum``) is wrong.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ska_sdp_cip_tpu.io.synth import synthetic_uvw
from ska_sdp_cip_tpu.models.operators import MeasurementOperator, SlotVis
from ska_sdp_cip_tpu.ops.gridder import (
    build_invert,
    build_predict,
    plan_device_arrays,
    slot_duplicate_pairs,
    slot_group_sum,
    stage_slot_vis,
    stage_slot_weights,
)
from ska_sdp_cip_tpu.ops.plan import make_plan

NUM_PIXELS = 128
PIXEL_SIZE_LM = float(np.sin(np.radians(20.0 / 3600.0)))


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(77)
    uvw, _ = synthetic_uvw(4, 24, max_baseline_m=4000.0, seed=11)
    freqs = np.linspace(1.3e9, 1.45e9, 3)
    shape = (len(uvw), len(freqs))
    vis = (
        rng.normal(size=shape) + 1j * rng.normal(size=shape)
    ).astype(np.complex64)
    wgt = rng.uniform(0.5, 2.0, size=shape).astype(np.float32)
    plan = make_plan(
        uvw, freqs, NUM_PIXELS, PIXEL_SIZE_LM, epsilon=1e-4
    )
    arrays = plan_device_arrays(plan)
    return plan, arrays, vis, wgt, uvw, freqs


def _padded_split(plan, values: np.ndarray) -> tuple:
    re = np.zeros(plan.num_vis, np.float32)
    im = np.zeros(plan.num_vis, np.float32)
    re[: values.size] = values.ravel().real
    im[: values.size] = values.ravel().imag
    return jnp.asarray(re), jnp.asarray(im)


def test_problem_has_straddlers(problem):
    """The fixture must exercise duplicated lane straddlers."""
    plan = problem[0]
    dup_a, dup_b = slot_duplicate_pairs(plan)
    assert len(dup_a) > 0
    assert np.array_equal(plan.order[dup_a], plan.order[dup_b])
    assert np.all(dup_a != dup_b)


def test_slot_invert_matches_data_invert(problem):
    plan, arrays, vis, wgt, _, _ = problem
    weighted = (vis * wgt).ravel()

    data_invert = build_invert(plan)
    slot_invert = build_invert(plan, slot_input=True)

    re, im = _padded_split(plan, weighted)
    expected = np.asarray(data_invert(arrays, re, im))

    slot_re, slot_im = stage_slot_vis(
        plan, weighted.real, weighted.imag
    )
    got = np.asarray(
        slot_invert(arrays, jnp.asarray(slot_re), jnp.asarray(slot_im))
    )
    np.testing.assert_allclose(
        got, expected, atol=1e-6 * np.abs(expected).max()
    )


def test_slot_predict_group_sum_matches_data_predict(problem):
    plan, arrays, _, _, _, _ = problem
    rng = np.random.default_rng(5)
    image = rng.normal(size=(NUM_PIXELS, NUM_PIXELS)).astype(
        np.float32
    )

    data_predict = build_predict(plan)
    slot_predict = build_predict(plan, slot_output=True)

    exp_re, exp_im = data_predict(arrays, jnp.asarray(image))
    exp_re, exp_im = np.asarray(exp_re), np.asarray(exp_im)

    acc_re, acc_im = slot_predict(arrays, jnp.asarray(image))
    dup_a, dup_b = slot_duplicate_pairs(plan)
    acc_re, acc_im = slot_group_sum(
        acc_re, acc_im, jnp.asarray(dup_a), jnp.asarray(dup_b)
    )
    # Manual finalize: undo pre-phase and flip, read off each source
    # sample's value from ONE of its slots (after the group sum every
    # slot carries the full sample value).
    acc_re, acc_im = np.asarray(acc_re), np.asarray(acc_im)
    cos = np.asarray(arrays["phase_cos"])
    sin = -np.asarray(arrays["phase_sin"])
    out_re = acc_re * cos - acc_im * sin
    out_im = (acc_re * sin + acc_im * cos) * np.asarray(
        arrays["flip_sign"]
    )
    order = plan.order
    got_re = np.zeros(plan.num_vis_data, np.float32)
    got_im = np.zeros(plan.num_vis_data, np.float32)
    valid = order < plan.num_vis_data
    got_re[order[valid]] = out_re[valid]
    got_im[order[valid]] = out_im[valid]

    scale = max(np.abs(exp_re).max(), np.abs(exp_im).max())
    np.testing.assert_allclose(got_re, exp_re, atol=1e-5 * scale)
    np.testing.assert_allclose(got_im, exp_im, atol=1e-5 * scale)


def test_operator_residual_gradient_matches_explicit(problem):
    plan, _, vis, wgt, uvw, freqs = problem
    operator = MeasurementOperator.build(
        uvw, freqs, wgt, NUM_PIXELS, PIXEL_SIZE_LM, epsilon=1e-4
    )
    rng = np.random.default_rng(9)
    image = rng.normal(size=(NUM_PIXELS, NUM_PIXELS)).astype(
        np.float32
    )

    got = np.asarray(operator.residual_gradient(image, vis.ravel()))

    # Explicit data-space reference: predict, weighted residual
    # against the measured data, adjoint.
    model_re, model_im = operator.forward(jnp.asarray(image))
    res = (
        np.asarray(model_re)
        + 1j * np.asarray(model_im)
        - vis.ravel()
    ) * wgt.ravel()
    expected = (
        np.asarray(
            operator.adjoint(
                jnp.asarray(res.real.astype(np.float32)),
                jnp.asarray(res.imag.astype(np.float32)),
            )
        )
        / operator.total_weight
    )
    np.testing.assert_allclose(
        got, expected, atol=1e-5 * np.abs(expected).max()
    )


def test_operator_psf_and_dirty_match_data_space(problem):
    plan, _, vis, wgt, uvw, freqs = problem
    operator = MeasurementOperator.build(
        uvw, freqs, wgt, NUM_PIXELS, PIXEL_SIZE_LM, epsilon=1e-4
    )
    # PSF == adjoint of (weights, 0) in data space
    num = plan.num_vis_data
    expected_psf = (
        np.asarray(
            operator.adjoint(
                operator.weights[:num], jnp.zeros(num, jnp.float32)
            )
        )
        / operator.total_weight
    )
    got_psf = np.asarray(operator.psf())
    np.testing.assert_allclose(
        got_psf, expected_psf, atol=1e-6 * np.abs(expected_psf).max()
    )

    # dirty == adjoint of weighted data
    weighted = vis.ravel() * wgt.ravel()
    expected_dirty = (
        np.asarray(
            operator.adjoint(
                jnp.asarray(weighted.real.astype(np.float32)),
                jnp.asarray(weighted.imag.astype(np.float32)),
            )
        )
        / operator.total_weight
    )
    got_dirty = np.asarray(operator.dirty_image(vis.ravel()))
    np.testing.assert_allclose(
        got_dirty,
        expected_dirty,
        atol=1e-6 * np.abs(expected_dirty).max(),
    )

    # stage() round-trips SlotVis unchanged
    staged = operator.stage(vis.ravel())
    assert operator.stage(staged) is staged
    assert isinstance(staged, SlotVis)


def test_operator_psf_matches_data_space_without_wstacking(problem):
    """
    Regression (round-2 advisor, high): with ``do_wstacking=False`` the
    slot staging skips the w-shift pre-phase, so the plan's phase
    factors must be identity — ``psf()`` reads them unconditionally and
    previously picked up a spurious per-slot rotation (~0.8% max rel
    error, growing with |w|), silently corrupting CLEAN.
    """
    _, _, vis, wgt, uvw, freqs = problem
    operator = MeasurementOperator.build(
        uvw,
        freqs,
        wgt,
        NUM_PIXELS,
        PIXEL_SIZE_LM,
        epsilon=1e-4,
        do_wstacking=False,
    )
    assert not operator.plan.wstacking
    host = np.asarray(operator.arrays["phase_cos"])
    assert np.all(host == 1.0)
    assert np.all(np.asarray(operator.arrays["phase_sin"]) == 0.0)

    num = operator.plan.num_vis_data
    expected_psf = (
        np.asarray(
            operator.adjoint(
                operator.weights[:num], jnp.zeros(num, jnp.float32)
            )
        )
        / operator.total_weight
    )
    got_psf = np.asarray(operator.psf())
    np.testing.assert_allclose(
        got_psf, expected_psf, atol=1e-6 * np.abs(expected_psf).max()
    )

    # dirty image via slot staging must also match data space
    weighted = vis.ravel() * wgt.ravel()
    expected_dirty = (
        np.asarray(
            operator.adjoint(
                jnp.asarray(weighted.real.astype(np.float32)),
                jnp.asarray(weighted.imag.astype(np.float32)),
            )
        )
        / operator.total_weight
    )
    got_dirty = np.asarray(operator.dirty_image(vis.ravel()))
    np.testing.assert_allclose(
        got_dirty,
        expected_dirty,
        atol=1e-6 * np.abs(expected_dirty).max(),
    )


def test_stage_slot_weights_zeroes_padding(problem):
    plan = problem[0]
    w = np.ones(plan.num_vis_data, np.float32)
    slot_w = stage_slot_weights(plan, w)
    pad = plan.order >= plan.num_vis_data
    assert slot_w.shape == (plan.num_vis,)
    assert np.all(slot_w[pad] == 0.0)
    assert np.all(slot_w[~pad] == 1.0)


def test_native_stage_slot_vis_matches_numpy(problem):
    """The fused C++ staging pass (native/cip_native.cpp:
    cip_stage_slot_vis) must agree with the numpy gather+flip+phase
    path to f32 rounding (FMA contraction differs in the last ulp)."""
    from ska_sdp_cip_tpu import native

    if not native.available():
        pytest.skip("native library not built")
    plan, _, vis, wgt, _, _ = problem
    weighted = (vis * wgt).ravel()
    got_re, got_im = stage_slot_vis(
        plan, weighted.real, weighted.imag
    )

    re = np.append(weighted.real.astype(np.float32), np.float32(0))
    im = np.append(weighted.imag.astype(np.float32), np.float32(0))
    from ska_sdp_cip_tpu.ops.gridder import plan_order_host

    host = plan_order_host(plan)
    order = np.minimum(host["order"], len(re) - 1)
    exp_re = re[order]
    exp_im = im[order] * host["flip_sign"]
    if plan.wstacking:
        cos, sin = host["phase_cos"], host["phase_sin"]
        exp_re, exp_im = (
            exp_re * cos - exp_im * sin,
            exp_re * sin + exp_im * cos,
        )
    scale = np.abs(weighted).max()
    np.testing.assert_allclose(got_re, exp_re, atol=1e-6 * scale)
    np.testing.assert_allclose(got_im, exp_im, atol=1e-6 * scale)


def test_device_put_parallel_round_trips(problem):
    """Chunked concurrent staging (utils/staging.py) must reassemble
    every array bit-exactly, including ones above the chunk size."""
    from ska_sdp_cip_tpu.utils.staging import (
        AsyncStager,
        device_put_parallel,
    )

    rng = np.random.default_rng(3)
    host = {
        "big": rng.random((3, 6_000_000)).astype(np.float32),
        "odd": rng.random(1_000_001).astype(np.float32),
        "small": np.arange(33, dtype=np.int32),
    }
    out = device_put_parallel(host, wait=True)
    for key, value in host.items():
        np.testing.assert_array_equal(np.asarray(out[key]), value)

    with AsyncStager() as stager:
        stager.submit_dict(host)
        got = stager.wait_all()
    for key, value in host.items():
        np.testing.assert_array_equal(np.asarray(got[key]), value)
