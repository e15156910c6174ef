"""
Production-configuration proof: the reference's CSD3 run images
10240 x 10240 px at 1.1 asec (reference: slurm/csd3_icelake.sh:19-26).
This script runs that imaging configuration through the TPU gridder on
one chip — w-stacked invert at epsilon=1e-4 over MeerKAT-scale
baselines — and prints a JSON line with memory/shape/time detail.

At this size the padded grid is 20480^2 and one plane's split alloc is
~3.5 GB; the lane-segmented strip kernels (ops/plan.py max_seg_width)
keep VMEM bounded, and the plane-at-a-time structure keeps HBM at a
few planes' footprint rather than nplanes x 3.5 GB.
"""

import json
import sys
import time

import numpy as np

NUM_PIXELS = 10240
PIXEL_ASEC = 1.1
EPSILON = 1e-4
NUM_TIMES = 4
NUM_ANTENNAS = 64  # 8064 rows
NUM_CHANNELS = 32  # ~258k visibility samples


def main() -> None:
    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            str(
                __import__("pathlib").Path(__file__).parent.parent
                / ".jax_cache"
            ),
        )
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 1.0
        )
    except Exception:
        pass

    import jax.numpy as jnp

    from ska_sdp_cip_tpu.io.synth import synthetic_uvw
    from ska_sdp_cip_tpu.ops.gridder import (
        build_invert,
        build_predict,
        plan_device_arrays,
        split_complex,
    )
    from ska_sdp_cip_tpu.ops.plan import make_plan

    rng = np.random.default_rng(7)
    uvw, _ = synthetic_uvw(
        NUM_TIMES, NUM_ANTENNAS, max_baseline_m=7700.0, seed=11
    )
    freqs = np.linspace(1.40e9, 1.507e9, NUM_CHANNELS)
    shape = (len(uvw), NUM_CHANNELS)
    vis = (
        rng.normal(size=shape) + 1j * rng.normal(size=shape)
    ).astype(np.complex64)
    wgt = rng.uniform(0.5, 2.0, size=shape).astype(np.float32)
    pixel_size_lm = float(np.sin(np.radians(PIXEL_ASEC / 3600.0)))

    # Warm the relay before timing
    _ = float(np.asarray(jax.jit(lambda x: x + 1.0)(jnp.float32(1.0))))

    # sigma="auto" resolves to 1.5 here: the production config is
    # FFT-dominated (258k vis on a 20480^2 padded grid at sigma=2),
    # and the 1.5 grid is 44% smaller per w-plane. Override with
    # CIP_SIGMA to compare (e.g. CIP_SIGMA=2.0 for round-2 numbers).
    import os

    sigma_env = os.environ.get("CIP_SIGMA", "auto")
    sigma = sigma_env if sigma_env == "auto" else float(sigma_env)
    t0 = time.time()
    plan = make_plan(
        uvw, freqs, NUM_PIXELS, pixel_size_lm, epsilon=EPSILON,
        sigma=sigma,
    )
    plan_seconds = time.time() - t0
    t0 = time.time()
    arrays = plan_device_arrays(plan)
    _ = float(np.asarray(arrays["packed"][0, 0]))
    stage_seconds = time.time() - t0

    invert = build_invert(plan)
    re, im = split_complex((vis * wgt).ravel())
    re_pad = np.zeros(plan.num_vis, np.float32)
    im_pad = np.zeros(plan.num_vis, np.float32)
    re_pad[: len(re)] = re
    im_pad[: len(im)] = im

    @jax.jit
    def run(arrays, re, im, seed):
        image = invert(arrays, re * (1.0 + seed * 1e-30), im)
        return image[0, 0], jnp.max(jnp.abs(image))

    t0 = time.time()
    _, peak = run(
        arrays,
        jnp.asarray(re_pad),
        jnp.asarray(im_pad),
        jnp.float32(0.0),
    )
    peak = float(np.asarray(peak))
    first_seconds = time.time() - t0
    t0 = time.time()
    _, peak2 = run(
        arrays,
        jnp.asarray(re_pad),
        jnp.asarray(im_pad),
        jnp.float32(1.0),
    )
    _ = float(np.asarray(peak2))
    invert_seconds = time.time() - t0

    # Degrid at production grid size: the lane-segmented degrid kernel
    # (one pallas_call per y-segment, here num_y_segments > 1) only
    # exists on real hardware — interpret-mode tests cannot exercise
    # its DMA ring. Also proves the 20480^2 spectral planes fit
    # alongside the predict pipeline's buffers.
    predict = build_predict(plan)

    @jax.jit
    def run_predict(arrays, image, seed):
        out_re, out_im = predict(
            arrays, image * (1.0 + seed * 1e-30)
        )
        return (
            jnp.max(jnp.abs(out_re)) + jnp.max(jnp.abs(out_im)),
            out_re[0],
        )

    image = jnp.ones((NUM_PIXELS, NUM_PIXELS), jnp.float32)
    t0 = time.time()
    vpk, _ = run_predict(arrays, image, jnp.float32(0.0))
    vpk = float(np.asarray(vpk))
    predict_first_seconds = time.time() - t0
    t0 = time.time()
    vpk2, _ = run_predict(arrays, image, jnp.float32(1.0))
    _ = float(np.asarray(vpk2))
    predict_seconds = time.time() - t0

    print(
        json.dumps(
            {
                "config": "CSD3 production (10240 px @ 1.1 asec)",
                "device": str(jax.devices()[0]),
                "sigma": plan.sigma,
                "support": plan.support,
                "num_vis": plan.num_vis_data,
                "ngrid": plan.ngrid,
                "nalloc": [plan.nalloc_x, plan.nalloc_y],
                "nplanes": plan.nplanes,
                "num_y_segments": plan.num_y_segments,
                "num_blocks": plan.num_blocks,
                "plan_seconds": round(plan_seconds, 2),
                "stage_seconds": round(stage_seconds, 2),
                "compile_plus_first_seconds": round(first_seconds, 2),
                "invert_seconds": round(invert_seconds, 3),
                "predict_compile_plus_first_seconds": round(
                    predict_first_seconds, 2
                ),
                "predict_seconds": round(predict_seconds, 3),
                "image_abs_max": peak,
                "predict_abs_max": vpk,
                "finite": bool(
                    np.isfinite(peak) and np.isfinite(vpk)
                ),
            }
        )
    )
    if not np.isfinite(peak):
        sys.exit(1)


if __name__ == "__main__":
    main()
