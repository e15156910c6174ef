"""
On-chip A/B probe for the plane-group / block-size kernel knobs.

Runs ONLY the invert and predict timing chains of the bench workload
(bench.py) under the current CIP_* env (CIP_PLANE_GROUP, CIP_BLOCK,
CIP_WBIN_GROUP, CIP_PATCH_X) and prints one JSON line — a cheap way to
sweep kernel configurations without paying bench.py's major-cycle
compile each time.

Usage: CIP_PLANE_GROUP=4 python scripts/group_sweep.py
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

NUM_TIMES = 20
NUM_ANTENNAS = 96
NUM_CHANNELS = 64
NUM_PIXELS = 2048
PIXEL_ASEC = 5.0
EPSILON = 1e-4
REPEATS = 5
CHAIN = 16


def main() -> None:
    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            str(Path(__file__).resolve().parent.parent / ".jax_cache"),
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
        stage_slot_vis,
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

    _probe = jax.jit(lambda x: x + 1.0)

    def scalar_fetch():
        return float(np.asarray(_probe(jnp.float32(1.0))))

    scalar_fetch()

    t_plan = time.time()
    plan = make_plan(
        uvw, freqs, NUM_PIXELS, pixel_size_lm, epsilon=EPSILON
    )
    arrays = plan_device_arrays(plan, slot_mode=True)
    _ = float(np.asarray(arrays["packed"][0, 0]))
    invert = build_invert(plan, slot_input=True)
    predict = build_predict(plan, slot_output=True)
    plan_seconds = time.time() - t_plan

    t_stage = time.time()
    weighted = (vis * wgt).ravel()
    re_s, im_s = stage_slot_vis(plan, weighted.real, weighted.imag)
    re_dev = jnp.asarray(re_s)
    im_dev = jnp.asarray(im_s)
    _ = float(np.asarray(re_dev[0]))
    stage_seconds = time.time() - t_stage

    @jax.jit
    def invert_chain(arrays, re, im, seed):
        def body(_, acc):
            out = invert(arrays, re * (1.0 + (acc + seed) * 1e-30), im)
            return out[0, 0]

        return jax.lax.fori_loop(0, CHAIN, body, jnp.float32(0.0))

    @jax.jit
    def predict_chain(arrays, image, seed):
        def body(_, acc):
            out_re, out_im = predict(
                arrays, image * (1.0 + (acc + seed) * 1e-30)
            )
            return out_re[0] + out_im[1]

        return jax.lax.fori_loop(0, CHAIN, body, jnp.float32(0.0))

    def timed(fn, args_fn):
        t0 = time.time()
        _ = np.asarray(jax.block_until_ready(fn(*args_fn(0))))
        first = time.time() - t0
        fetch = float("inf")
        for _i in range(3):
            t0 = time.time()
            scalar_fetch()
            fetch = min(fetch, time.time() - t0)
        best = float("inf")
        for rep in range(1, REPEATS + 1):
            t0 = time.time()
            _ = np.asarray(jax.block_until_ready(fn(*args_fn(rep))))
            best = min(best, max(time.time() - t0 - fetch, 1e-9))
        return first, best

    image0 = jnp.ones((NUM_PIXELS, NUM_PIXELS), jnp.float32)
    first_inv, best_inv = timed(
        invert_chain,
        lambda rep: (arrays, re_dev, im_dev, jnp.float32(rep)),
    )
    first_pre, best_pre = timed(
        predict_chain,
        lambda rep: (arrays, image0, jnp.float32(rep)),
    )
    num_vis = plan.num_vis_data
    inv_s = best_inv / CHAIN
    pre_s = best_pre / CHAIN
    print(
        json.dumps(
            {
                "plane_group": plan.plane_group,
                "block": plan.block,
                "num_blocks": plan.num_blocks,
                "num_y_segments": plan.num_y_segments,
                "steps_per_row": int(plan.step_val.shape[-1]),
                "step_rows": int(plan.num_step_rows),
                "plan_seconds": round(plan_seconds, 2),
                "stage_seconds": round(stage_seconds, 2),
                "compile_seconds": [
                    round(first_inv, 1),
                    round(first_pre, 1),
                ],
                "invert_seconds": round(inv_s, 5),
                "predict_seconds": round(pre_s, 5),
                "invert_mvis_per_s": round(num_vis / inv_s / 1e6, 2),
                "predict_mvis_per_s": round(num_vis / pre_s / 1e6, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
