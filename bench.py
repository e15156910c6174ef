"""
Benchmark: gridded visibilities/sec/chip for the w-stacked invert.

Run on whatever accelerator jax exposes (the driver runs this on one
real TPU chip). Prints ONE JSON line:

    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no numbers (BASELINE.md): ``vs_baseline`` is
computed against a fixed nominal figure for the reference stack —
25 Mvis/s for ducc0's multi-threaded w-stacked gridder on one
production node (a generous reading of typical ducc0 throughput on the
reference's 76-core icelake nodes, slurm/csd3_icelake.sh:6-10) — so the
ratio is comparable across rounds.
"""

import json
import sys
import time

import numpy as np

#: Nominal reference-node throughput (see module docstring).
BASELINE_VIS_PER_SEC = 25.0e6

# Benchmark workload: MeerKAT-like snapshot at the reference's test
# imaging config (2048 px @ 5 asec, epsilon=1e-4, w-stacking on;
# reference: tests/test_invert_measurement_set.py:11-12, invert.py:179).
NUM_TIMES = 10
NUM_ANTENNAS = 96  # -> 45,600 rows
NUM_CHANNELS = 16  # -> 729,600 visibility samples
NUM_PIXELS = 2048
PIXEL_ASEC = 5.0
EPSILON = 1e-4
REPEATS = 3


def main() -> None:
    import jax

    # Persistent compilation cache: the axon relay's remote compile of
    # the gridding program is slow (minutes); cache hits make repeat
    # bench runs start in seconds.
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            str(__import__("pathlib").Path(__file__).parent / ".jax_cache"),
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
        plan_device_arrays,
        split_complex,
    )
    from ska_sdp_cip_tpu.ops.plan import make_plan

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

    t_plan = time.time()
    plan = make_plan(
        uvw, freqs, NUM_PIXELS, pixel_size_lm, epsilon=EPSILON
    )
    arrays = plan_device_arrays(plan)
    invert = build_invert(plan)
    plan_seconds = time.time() - t_plan

    weighted = (vis * wgt).ravel()
    re, im = split_complex(weighted)
    re_pad = np.zeros(plan.num_vis, np.float32)
    im_pad = np.zeros(plan.num_vis, np.float32)
    re_pad[: len(re)] = re
    im_pad[: len(im)] = im
    re_dev = jnp.asarray(re_pad)
    im_dev = jnp.asarray(im_pad)

    # On the axon relay, execution is lazy until a device->host fetch:
    # block_until_ready does NOT synchronize. Chain CHAIN inverts with
    # a serial data dependency inside one jit and time through a
    # scalar fetch, so per-invert time is (total - fetch) / CHAIN.
    CHAIN = 8

    @jax.jit
    def invert_chain(arrays, re, im):
        def body(_, acc):
            # acc-dependent perturbation defeats CSE across iterations
            out = invert(arrays, re * (1.0 + acc * 1e-30), im)
            return out[0, 0]

        acc = jax.lax.fori_loop(0, CHAIN, body, jnp.float32(0.0))
        return acc, invert(arrays, re, im)

    # Warmup (compile + first execution + first fetch)
    t_compile = time.time()
    acc, image = invert_chain(arrays, re_dev, im_dev)
    _ = float(np.asarray(acc))
    compile_seconds = time.time() - t_compile

    # Fetch overhead: a trivial jitted scalar round trip
    t_fetch = time.time()
    _ = float(np.asarray(jax.jit(lambda x: x + 1.0)(jnp.float32(1.0))))
    fetch_seconds = time.time() - t_fetch

    times = []
    for _ in range(REPEATS):
        start = time.time()
        acc, image = invert_chain(arrays, re_dev, im_dev)
        _ = float(np.asarray(acc))
        times.append(
            max(time.time() - start - fetch_seconds, 1e-9) / (CHAIN + 1)
        )
    best = min(times)

    num_vis = plan.num_vis_data
    vis_per_sec = num_vis / best

    result = {
        "metric": "gridded visibilities/sec/chip",
        "value": round(vis_per_sec, 1),
        "unit": "vis/s",
        "vs_baseline": round(vis_per_sec / BASELINE_VIS_PER_SEC, 4),
    }
    # Side-channel detail (stderr keeps stdout to one JSON line)
    detail = {
        "device": str(jax.devices()[0]),
        "num_vis": num_vis,
        "num_pixels": NUM_PIXELS,
        "nplanes": plan.nplanes,
        "num_blocks": plan.num_blocks,
        "max_active": plan.max_active,
        "plan_seconds": round(plan_seconds, 2),
        "compile_seconds": round(compile_seconds, 2),
        "fetch_seconds": round(fetch_seconds, 4),
        "invert_seconds_best": round(best, 4),
        "invert_seconds_all": [round(t, 4) for t in times],
        "image_max": float(np.asarray(jnp.max(image))),
    }
    print(json.dumps(detail), file=sys.stderr)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
