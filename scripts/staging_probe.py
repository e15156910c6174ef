"""
Host-side timeline of the one-shot time-to-dirty path (the round-3
verdict's north-star metric #2): splits plan_seconds into native plan
build / host array build / transfer issue / transfer completion, and
stage_seconds into host reorder / transfer — plus a relay bandwidth
probe (single large transfer vs concurrent chunks) so the overlap
design targets the measured bottleneck.

Reference behavior being matched: ducc0 plans inside every ms2dirty
call and still sustains throughput (reference invert.py:170-183).
"""

import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NUM_TIMES = 20
NUM_ANTENNAS = 96
NUM_CHANNELS = 64
NUM_PIXELS = 2048
PIXEL_ASEC = 5.0
EPSILON = 1e-4


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
    except Exception:
        pass
    import jax.numpy as jnp

    from ska_sdp_cip_tpu.io.synth import synthetic_uvw
    from ska_sdp_cip_tpu.ops.gridder import (
        plan_host_arrays,
        stage_slot_vis,
    )
    from ska_sdp_cip_tpu.ops.plan import make_plan

    out = {}

    # Relay warmup (first touch takes minutes; keep it out of probes)
    t0 = time.time()
    _ = float(np.asarray((jnp.zeros((8, 128)) + 1.0)[0, 0]))
    out["warmup_s"] = round(time.time() - t0, 2)

    # --- bandwidth probe -------------------------------------------
    mb = 64
    buf = np.random.default_rng(0).random(mb * 131072).astype(np.float32)
    t0 = time.time()
    d = jnp.asarray(buf)
    out["xfer_issue_64mb_s"] = round(time.time() - t0, 3)
    _ = float(np.asarray(d[-1]))
    dt = time.time() - t0
    out["xfer_64mb_s"] = round(dt, 3)
    out["xfer_single_mb_per_s"] = round(mb / dt, 1)

    # Concurrent chunks: does the relay parallelize?
    chunks = [
        np.random.default_rng(i + 1)
        .random(mb * 131072 // 4)
        .astype(np.float32)
        for i in range(4)
    ]
    t0 = time.time()
    with ThreadPoolExecutor(4) as pool:
        devs = list(pool.map(jnp.asarray, chunks))
    for d in devs:
        _ = float(np.asarray(d[-1]))
    dt = time.time() - t0
    out["xfer_4x16mb_s"] = round(dt, 3)
    out["xfer_chunked_mb_per_s"] = round(mb / dt, 1)

    # Does host compute overlap a pending transfer?
    big = np.random.default_rng(9).random(mb * 131072).astype(np.float32)
    t0 = time.time()
    d = jnp.asarray(big)
    t_issue = time.time() - t0
    # ~0.5 s of host work
    acc = 0.0
    h0 = time.time()
    while time.time() - h0 < 0.5:
        acc += float(np.sum(np.sqrt(np.abs(big[:500000]))))
    _ = float(np.asarray(d[-1]))
    dt = time.time() - t0
    out["xfer_64mb_with_host_work_s"] = round(dt, 3)
    out["xfer_issue_s"] = round(t_issue, 3)

    # --- plan timeline ---------------------------------------------
    uvw, _ = synthetic_uvw(
        NUM_TIMES, NUM_ANTENNAS, max_baseline_m=7700.0, seed=42
    )
    freqs = np.linspace(1.40e9, 1.507e9, NUM_CHANNELS)
    pixel_size_lm = float(np.sin(np.radians(PIXEL_ASEC / 3600.0)))
    rng = np.random.default_rng(2024)
    shape = (len(uvw), NUM_CHANNELS)
    vis = (
        rng.normal(size=shape) + 1j * rng.normal(size=shape)
    ).astype(np.complex64)
    wgt = rng.uniform(0.5, 2.0, size=shape).astype(np.float32)

    t0 = time.time()
    plan = make_plan(
        uvw, freqs, NUM_PIXELS, pixel_size_lm, epsilon=EPSILON
    )
    out["native_plan_s"] = round(time.time() - t0, 3)

    t0 = time.time()
    host = plan_host_arrays(plan, slot_mode=True)
    out["host_arrays_s"] = round(time.time() - t0, 3)
    out["staged_mb"] = round(
        sum(a.nbytes for a in host.values()) / 1e6, 1
    )

    t0 = time.time()
    arrays = {k: jnp.asarray(v) for k, v in host.items()}
    out["plan_xfer_issue_s"] = round(time.time() - t0, 3)
    for v in arrays.values():
        jax.block_until_ready(v)
    out["plan_xfer_total_s"] = round(time.time() - t0, 3)

    t0 = time.time()
    weighted = (vis * wgt).ravel()
    re_s, im_s = stage_slot_vis(plan, weighted.real, weighted.imag)
    out["host_stage_vis_s"] = round(time.time() - t0, 3)
    t0 = time.time()
    re_dev = jnp.asarray(re_s)
    im_dev = jnp.asarray(im_s)
    jax.block_until_ready((re_dev, im_dev))
    out["vis_xfer_s"] = round(time.time() - t0, 3)
    out["vis_mb"] = round((re_s.nbytes + im_s.nbytes) / 1e6, 1)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
