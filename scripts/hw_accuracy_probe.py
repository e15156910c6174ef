"""
Hardware cross-check: Pallas strip kernels vs the independent XLA path
on a real TPU chip.

Interpret-mode tests (tests/test_pallas_gridder.py) pin the kernel
*math*, but the DMA pipelines — double-buffered pack loads, strip
write/carry rolls, the degrid out-DMA ring — only exist on real
hardware (Mosaic alignment, semaphore ordering, in-flight buffer
reuse). This script runs predict and invert through BOTH gridder
backends on the attached chip and reports the max relative
discrepancy; agreement at ~1e-5 means the pipelines are race-free on
this workload shape.

The XLA path is an independent implementation of the same gridding
math (reference behavior: src/ska_sdp_cip/invert.py:152-197), so this
doubles as an on-chip accuracy audit.

Measured 2026-08-18 (TPU v5e, 715-block plan):
predict_max_rel 6.1e-6, invert_max_rel 1.5e-5.
"""

import json
import sys

import numpy as np

sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent.parent))

import jax

try:
    jax.config.update(
        "jax_compilation_cache_dir",
        str(
            __import__("pathlib").Path(__file__).parent.parent
            / ".jax_cache"
        ),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import jax.numpy as jnp

from ska_sdp_cip_tpu.io.synth import synthetic_uvw
from ska_sdp_cip_tpu.ops.gridder import (
    build_invert,
    build_predict,
    plan_host_arrays,
    stage_slot_vis,
)
from ska_sdp_cip_tpu.ops.plan import make_plan

NPIX = 1024
NUM_CHANNELS = 8


def main() -> None:
    rng = np.random.default_rng(3)
    uvw, _ = synthetic_uvw(6, 48, max_baseline_m=7000.0, seed=8)
    freqs = np.linspace(1.40e9, 1.48e9, NUM_CHANNELS)
    pixel_size_lm = float(np.sin(np.radians(8.0 / 3600.0)))
    # export_coords: the probe runs BOTH gridder paths off one plan,
    # so the XLA path's per-slot coordinate columns must be kept even
    # though the resolved mode on TPU is pallas.
    plan = make_plan(
        uvw, freqs, NPIX, pixel_size_lm, epsilon=1e-4,
        export_coords=True,
    )
    # gridder='xla' keeps the XLA path's extra plan arrays staged too
    arrays = {
        k: jnp.asarray(v)
        for k, v in plan_host_arrays(plan, gridder="xla").items()
    }
    image = rng.normal(size=(NPIX, NPIX)).astype(np.float32)

    pred_pallas = build_predict(plan, gridder="pallas", slot_output=True)
    pred_xla = build_predict(plan, gridder="xla", slot_output=True)
    inv_pallas = build_invert(plan, gridder="pallas", slot_input=True)
    inv_xla = build_invert(plan, gridder="xla", slot_input=True)

    img_dev = jnp.asarray(image)
    pr, pi = (np.asarray(x) for x in pred_pallas(arrays, img_dev))
    xr, xi = (np.asarray(x) for x in pred_xla(arrays, img_dev))
    scale = max(np.abs(xr).max(), np.abs(xi).max())
    predict_rel = float(
        max(np.abs(pr - xr).max(), np.abs(pi - xi).max()) / scale
    )

    shape = (len(uvw), NUM_CHANNELS)
    vis = (
        rng.normal(size=shape) + 1j * rng.normal(size=shape)
    ).astype(np.complex64)
    sr, si = stage_slot_vis(plan, vis.ravel().real, vis.ravel().imag)
    a = np.asarray(inv_pallas(arrays, jnp.asarray(sr), jnp.asarray(si)))
    b = np.asarray(inv_xla(arrays, jnp.asarray(sr), jnp.asarray(si)))
    invert_rel = float(np.abs(a - b).max() / np.abs(b).max())

    print(
        json.dumps(
            {
                "device": str(jax.devices()[0]),
                "predict_max_rel": predict_rel,
                "invert_max_rel": invert_rel,
                "num_blocks": plan.num_blocks,
                "nplanes": plan.nplanes,
                "ok": bool(predict_rel < 1e-4 and invert_rel < 1e-4),
            }
        )
    )
    if predict_rel >= 1e-4 or invert_rel >= 1e-4:
        sys.exit(1)


if __name__ == "__main__":
    main()
