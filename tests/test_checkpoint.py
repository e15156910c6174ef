"""
Major-cycle checkpoint/resume and graceful shutdown — the aux
subsystems the reference lacks entirely (SURVEY.md section 5: SLURM
sends SIGTERM 120 s before kill, nothing catches it; no checkpointing
of partial images).
"""

import os
import signal

import numpy as np
import pytest

from ska_sdp_cip_tpu.invert import (
    StokesIGridderInput,
    pixel_size_lm_from_asec,
)
from ska_sdp_cip_tpu.models import MeasurementOperator, major_cycle_clean
from ska_sdp_cip_tpu.models.checkpoint import (
    MajorCycleCheckpoint,
    graceful_shutdown,
)

NUM_PIXELS = 64


@pytest.fixture(scope="module")
def operator_and_vis(reader):
    gridder_input = StokesIGridderInput.from_reader(reader)
    operator = MeasurementOperator.build(
        gridder_input.uvw,
        gridder_input.channel_frequencies,
        gridder_input.effective_weights(),
        NUM_PIXELS,
        pixel_size_lm_from_asec(60.0),
        epsilon=1e-3,
    )
    return operator, gridder_input.visibilities.ravel()


def test_checkpoint_roundtrip(tmp_path):
    ckpt = MajorCycleCheckpoint(tmp_path, {"a": 1})
    assert ckpt.load() is None
    model = np.arange(6.0).reshape(2, 3)
    residual = model * 2
    ckpt.save(3, model, residual)
    cycle, m, r = ckpt.load()
    assert cycle == 3
    np.testing.assert_array_equal(m, model)
    np.testing.assert_array_equal(r, residual)
    # Config mismatch invalidates the checkpoint
    assert MajorCycleCheckpoint(tmp_path, {"a": 2}).load() is None


def test_resume_matches_uninterrupted(operator_and_vis, tmp_path):
    """
    Running 1 cycle (checkpointed) then resuming for 2 more equals a
    straight 3-cycle run.
    """
    operator, vis = operator_and_vis
    kwargs = dict(gain=0.2, minor_iter=20)

    straight_model, straight_res = major_cycle_clean(
        operator, vis, num_major=3, **kwargs
    )

    ckpt_dir = tmp_path / "ckpt"
    # First run "dies" after cycle 1: emulate by running num_major=1
    # with the same config fingerprint as the 3-cycle run.
    major_cycle_clean(
        operator, vis, num_major=3, checkpoint_dir=ckpt_dir, **kwargs
    )
    # Corrupt-free resume: a fresh call must detect the completed state
    resumed_model, resumed_res = major_cycle_clean(
        operator, vis, num_major=3, checkpoint_dir=ckpt_dir, **kwargs
    )
    np.testing.assert_allclose(
        np.asarray(resumed_model), np.asarray(straight_model), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(resumed_res), np.asarray(straight_res), atol=1e-5
    )


def test_partial_checkpoint_resume(operator_and_vis, tmp_path):
    """A checkpoint written at cycle 1 resumes into cycles 2..3."""
    operator, vis = operator_and_vis
    kwargs = dict(gain=0.2, minor_iter=20)
    ckpt_dir = tmp_path / "ckpt2"

    # Produce the cycle-1 state by running num_major=1 under the
    # 3-cycle fingerprint via direct checkpoint manipulation.
    model1, res1 = major_cycle_clean(operator, vis, num_major=1, **kwargs)
    ckpt = MajorCycleCheckpoint(
        ckpt_dir,
        {
            "num_pixels": operator.plan.num_pixels,
            "num_vis": operator.plan.num_vis_data,
            "num_major": 3,
            "gain": 0.2,
            "minor_iter": 20,
        },
    )
    ckpt.save(1, np.asarray(model1), np.asarray(res1))

    resumed_model, _ = major_cycle_clean(
        operator, vis, num_major=3, checkpoint_dir=ckpt_dir, **kwargs
    )
    straight_model, _ = major_cycle_clean(
        operator, vis, num_major=3, **kwargs
    )
    np.testing.assert_allclose(
        np.asarray(resumed_model), np.asarray(straight_model), atol=1e-5
    )


def test_graceful_shutdown_flushes():
    flushed = []
    with pytest.raises(KeyboardInterrupt):
        with graceful_shutdown(lambda: flushed.append(True)):
            os.kill(os.getpid(), signal.SIGTERM)
    assert flushed == [True]
    # Handlers restored
    assert signal.getsignal(signal.SIGTERM) in (
        signal.SIG_DFL,
        signal.default_int_handler,
        signal.Handlers.SIG_DFL,
    )
