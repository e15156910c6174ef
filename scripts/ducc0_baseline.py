"""
Measure the reference stack's gridder on the EXACT bench.py workload.

The reference delegates its entire invert to ducc0's ``ms2dirty``
(reference: src/ska_sdp_cip/invert.py:170-183, epsilon=1e-4,
do_wstacking=True). This script reproduces bench.py's synthetic
MeerKAT-like workload (same generator, same seeds, same imaging
config) and times ducc0 on the host CPU, printing one JSON line with
the measured visibilities/sec. Drop the result into
``BASELINE.json["measured"]`` to replace bench.py's nominal
denominator (see BASELINE.md).

This build environment has no network egress and no ducc0 wheel baked
in, so the script can only run where ducc0 installs — the CI
``bench-ducc0`` job, or any workstation:

    pip install ducc0 && python scripts/ducc0_baseline.py
"""

import json
import sys
import time

import numpy as np

# Keep in lockstep with bench.py's workload constants.
NUM_TIMES = 20
NUM_ANTENNAS = 96
NUM_CHANNELS = 64
NUM_PIXELS = 2048
PIXEL_ASEC = 5.0
EPSILON = 1e-4
REPEATS = 5


def main() -> None:
    try:
        import ducc0
    except ImportError:
        print(
            json.dumps(
                {
                    "error": "ducc0 not importable in this environment",
                    "metric": "reference gridded visibilities/sec",
                }
            )
        )
        sys.exit(2)

    from ska_sdp_cip_tpu.io.synth import synthetic_uvw

    rng = np.random.default_rng(2024)
    uvw, _ = synthetic_uvw(
        NUM_TIMES, NUM_ANTENNAS, max_baseline_m=7700.0, seed=42
    )
    freqs = np.linspace(1.40e9, 1.507e9, NUM_CHANNELS)
    shape = (len(uvw), NUM_CHANNELS)
    vis = (
        rng.normal(size=shape) + 1j * rng.normal(size=shape)
    ).astype(np.complex64)
    wgt = rng.uniform(0.5, 2.0, size=shape).astype(np.float32)
    pixel_size_lm = float(np.sin(np.radians(PIXEL_ASEC / 3600.0)))

    import os

    nthreads = int(
        os.environ.get("DUCC0_NUM_THREADS", os.cpu_count() or 1)
    )

    def run():
        return ducc0.wgridder.ms2dirty(
            uvw,
            freqs,
            vis,
            wgt,
            NUM_PIXELS,
            NUM_PIXELS,
            pixel_size_lm,
            pixel_size_lm,
            0,
            0,
            EPSILON,
            do_wstacking=True,
            nthreads=nthreads,
        )

    run()  # warm caches / thread pool
    best = 1e30
    for _ in range(REPEATS):
        t0 = time.time()
        image = run()
        best = min(best, time.time() - t0)
    num_vis = vis.size
    print(
        json.dumps(
            {
                "metric": "reference gridded visibilities/sec",
                "value": round(num_vis / best, 1),
                "unit": "vis/s",
                "invert_seconds_best": round(best, 4),
                "num_vis": num_vis,
                "num_pixels": NUM_PIXELS,
                "nthreads": nthreads,
                "epsilon": EPSILON,
                "ducc0_version": getattr(ducc0, "__version__", "?"),
                "image_abs_max": float(np.abs(image).max()),
            }
        )
    )


if __name__ == "__main__":
    main()
