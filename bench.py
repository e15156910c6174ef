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

Timing notes for the axon TPU relay: execution is lazy (work happens at
the first device->host fetch) and identical (program, inputs) pairs can
be served from a relay cache, so every timed repeat feeds a fresh seed
through a serial dependency chain and timing goes through a scalar
fetch. The relay itself takes ~1-3 minutes to warm up on first touch;
that cost is measured separately and kept out of the plan/compile
numbers.
"""

import json
import os
import sys
import time

import numpy as np

#: Nominal reference-node throughput (see module docstring).
BASELINE_VIS_PER_SEC = 25.0e6

# Benchmark workload: MeerKAT-like observation at the reference's test
# imaging config (2048 px @ 5 asec, epsilon=1e-4, w-stacking on;
# reference: tests/test_invert_measurement_set.py:11-12, invert.py:179).
# The visibility count (~5.8M) is sized so per-image FFT/correction
# overheads amortize the way they do on production datasets (the
# reference's CSD3 run grids a full 1 h x 1400-1507 MHz MeerKAT MS,
# slurm/csd3_icelake.sh:19); throughput at tiny vis counts measures
# the FFT, not the gridder.
NUM_TIMES = 20
NUM_ANTENNAS = 96  # -> 91,200 rows
NUM_CHANNELS = 64  # -> 5,836,800 visibility samples
NUM_PIXELS = 2048
PIXEL_ASEC = 5.0
EPSILON = 1e-4
REPEATS = 5
CHAIN = 16
CYCLE_CHAIN = 4
MINOR_ITER = 25


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
    from ska_sdp_cip_tpu.models.clean import hogbom_clean
    from ska_sdp_cip_tpu.ops.gridder import (
        build_invert,
        build_predict,
        slot_duplicate_pairs,
        slot_group_sum,
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

    # Pre-jitted ONCE: re-jitting a fresh lambda per probe measures
    # dispatch/trace cost (~0.5 s through the relay), not the fetch
    # round trip, and subtracting that inflated every timing.
    _probe = jax.jit(lambda x: x + 1.0)

    def scalar_fetch():
        return float(np.asarray(_probe(jnp.float32(1.0))))

    t_warm = time.time()
    scalar_fetch()
    # Warm the relay's TRANSFER streams too: the transfer path's
    # internal buffers reach their high-water mark over the first
    # ~100-200 MB of cumulative transfers (measured ramping 20 -> 55
    # MB/s over consecutive 64 MB pushes with malloc reuse active),
    # so the timed staging below runs at the warmed bandwidth. Two
    # payload-sized rounds.
    from ska_sdp_cip_tpu.utils.staging import device_put_parallel

    for _round in range(2):
        _ = device_put_parallel(
            {"warm": np.zeros(16 * 1024 * 1024, np.float32)},
            wait=True,
        )
    # Pre-fault the host allocation arenas for the plan build: the
    # bench VM's fault rate collapses once jax + RSS are up
    # (utils/hostmem.py), and paying that once here keeps the timed
    # one-shot plan on warm pages — the production CLI does the same
    # at startup.
    from ska_sdp_cip_tpu.ops.plan import prewarm_plan_arenas

    prewarm_plan_arenas(NUM_TIMES * NUM_ANTENNAS ** 2 // 2 * NUM_CHANNELS)
    warmup_seconds = time.time() - t_warm

    # One-shot staging, COMPACT + OVERLAPPED (round-5): the data-order
    # weighted visibilities (46.7 MB, independent of the plan) start
    # transferring immediately; make_plan runs on the host UNDER those
    # transfers; then the compact plan columns (~31 MB: one int32
    # order_enc row + KB-scale uvw/scale tables, instead of the 85 MB
    # packed f32 rows) join the same pool. A jitted device prologue
    # (ops/gridder.py:build_assemble) rebuilds the packed rows and
    # slot-orders the visibilities on device — ~2.2x fewer bytes
    # through the relay than staging slot-space f32 everywhere, and
    # the weights (cycle-only) stay out of the dirty path entirely.
    from ska_sdp_cip_tpu.ops.gridder import (
        build_assemble,
        compact_plan_host_arrays,
    )
    from ska_sdp_cip_tpu.utils.staging import AsyncStager

    sigma_env = os.environ.get("CIP_SIGMA", "2.0")
    sigma = sigma_env if sigma_env == "auto" else float(sigma_env)

    t_stage = time.time()
    with AsyncStager() as stager:
        weighted = (vis * wgt).ravel()
        stager.submit(
            "bench_vis_re", np.ascontiguousarray(weighted.real)
        )
        stager.submit(
            "bench_vis_im", np.ascontiguousarray(weighted.imag)
        )
        t_plan = time.time()
        plan = make_plan(
            uvw, freqs, NUM_PIXELS, pixel_size_lm, epsilon=EPSILON,
            sigma=sigma, export_packed=False,
        )
        compact = compact_plan_host_arrays(plan, uvw, freqs)
        plan_seconds = time.time() - t_plan
        stager.submit_dict(compact)
        staged = stager.wait_all()
    re_data = staged.pop("bench_vis_re")
    im_data = staged.pop("bench_vis_im")
    carrays = staged
    stage_seconds = time.time() - t_stage
    staged_mb = (
        sum(np.asarray(v).nbytes for v in compact.values())
        + weighted.real.nbytes * 2
    ) / 1e6

    invert = build_invert(plan, slot_input=True)
    predict = build_predict(plan, slot_output=True)
    assemble = build_assemble(plan)

    # The one-shot dirty program: device prologue + invert, one jit.
    def dirty_raw(carrays, re_d, im_d):
        arrays2, re_s, im_s = assemble(carrays, re_d, im_d)
        return invert(arrays2, re_s, im_s)

    dirty_once = jax.jit(dirty_raw)

    # AOT executable cache (utils/aot_cache.py): the same program,
    # persisted keyed by the plan's static signature + code
    # fingerprint. A repeat bench/CLI run of this config loads the
    # executable instead of paying the relay compile; stats are
    # reported below (used for the PSF build here).
    from ska_sdp_cip_tpu.utils.aot_cache import (
        STATS as AOT_STATS,
        cache_key,
        cached_jit,
    )

    t0 = time.time()
    dirty_aot = cached_jit(
        dirty_raw,
        (carrays, re_data, im_data),
        cache_key(
            "bench_dirty",
            plan.static_signature(),
            plan.constant_signature(),
        ),
    )
    aot_setup_seconds = time.time() - t0

    # Materialize the slot-space device arrays once (untimed) for the
    # throughput chains; the weights transfer (cycle-only) also rides
    # here, outside the dirty path.
    @jax.jit
    def assemble_full(carrays, re_d, im_d, wgt_d):
        return assemble(carrays, re_d, im_d, wgt_d)

    wgt_data = jnp.asarray(np.ascontiguousarray(wgt.ravel()))
    arrays, re_dev, im_dev, wgt_dev = jax.block_until_ready(
        assemble_full(carrays, re_data, im_data, wgt_data)
    )
    dup_a_np, dup_b_np = slot_duplicate_pairs(plan)
    dup_a = jnp.asarray(dup_a_np)
    dup_b = jnp.asarray(dup_b_np)

    # Serial dependency chains with a per-repeat seed: defeats both XLA
    # CSE across iterations and the relay's identical-request cache.
    @jax.jit
    def invert_chain(arrays, re, im, seed):
        def body(_, acc):
            out = invert(
                arrays, re * (1.0 + (acc + seed) * 1e-30), im
            )
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

    @jax.jit
    def cycle_chain(arrays, re, im, wgt, psf, seed):
        """CYCLE_CHAIN major cycles carried serially: each iteration
        predicts the running model, inverts the weighted residual and
        runs a Hogbom minor cycle — so per-cycle time can be read off
        a single fetch (one cycle alone is shorter than the relay's
        round-trip jitter). Entirely in slot space: predict returns
        per-slot contributions, straddler pairs are group-summed, and
        the residual feeds invert with no gather/scatter."""

        def body(k, model):
            model_re, model_im = predict(arrays, model)
            model_re, model_im = slot_group_sum(
                model_re, model_im, dup_a, dup_b
            )
            res_re = (re - model_re * wgt) * (
                1.0 + (seed + k) * 1e-30
            )
            res_im = im - model_im * wgt
            residual = invert(arrays, res_re, res_im)
            delta, _ = hogbom_clean(
                residual, psf, gain=0.1, max_iter=MINOR_ITER
            )
            return model + delta

        model = jax.lax.fori_loop(
            0, CYCLE_CHAIN, body, jnp.zeros_like(psf)
        )
        # Scalar result: timing fetches must not pay an image-sized
        # device->host transfer through the relay.
        return jnp.sum(jnp.abs(model))

    def timed(fn, args_fn):
        """(compile+first seconds, best per-call seconds)."""
        t0 = time.time()
        _ = np.asarray(jax.block_until_ready(fn(*args_fn(0))))
        first = time.time() - t0
        # Fetch overhead: min over several round trips (single samples
        # carry the relay's full jitter, which is comparable to one
        # kernel execution).
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

    image0 = jnp.zeros((NUM_PIXELS, NUM_PIXELS), jnp.float32)

    first_inv, best_chain = timed(
        invert_chain,
        lambda rep: (arrays, re_dev, im_dev, jnp.float32(rep)),
    )
    invert_seconds = best_chain / CHAIN

    first_pre, best_pre = timed(
        predict_chain,
        lambda rep: (arrays, image0 + 1.0, jnp.float32(rep)),
    )
    predict_seconds = best_pre / CHAIN

    # One-shot dirty execution (device prologue + invert in one
    # program): chained like the others so the per-call time can be
    # read off one fetch.
    @jax.jit
    def dirty_chain(carrays, re_d, im_d, seed):
        def body(_, acc):
            out = dirty_once(
                carrays, re_d * (1.0 + (acc + seed) * 1e-30), im_d
            )
            return out[0, 0]

        return jax.lax.fori_loop(0, CHAIN, body, jnp.float32(0.0))

    first_dirty, best_dirty = timed(
        dirty_chain,
        lambda rep: (carrays, re_data, im_data, jnp.float32(rep)),
    )
    dirty_exec_seconds = best_dirty / CHAIN

    # PSF for the minor cycle: unit data visibilities (re = weight,
    # im = 0) through the AOT-cached prologue + invert executable.
    psf = dirty_aot(
        carrays, wgt_data, jnp.zeros_like(wgt_data)
    )
    psf = psf / jnp.max(psf)
    first_cyc, best_cyc = timed(
        cycle_chain,
        lambda rep: (
            arrays,
            re_dev,
            im_dev,
            wgt_dev,
            psf,
            jnp.float32(rep),
        ),
    )
    cycle_seconds = best_cyc / CYCLE_CHAIN

    num_vis = plan.num_vis_data
    vis_per_sec = num_vis / invert_seconds
    # North-star metric #2 (BASELINE.md): the honest one-shot
    # time-to-dirty-image — (plan overlapped with staging) + one
    # prologue+invert execution. plan_seconds is contained in
    # stage_seconds (the transfers fly while make_plan runs).
    time_to_dirty = stage_seconds + dirty_exec_seconds

    # On-hardware accuracy gate, every bench run: the compiled Pallas
    # kernel vs the independent XLA path at a small size (the Pallas
    # DMA pipelines cannot be race-tested in interpret mode; this
    # makes the cross-check an automated gate rather than an opt-in
    # probe). Cheap: two small warm-cache compiles.
    check_uvw, _ = synthetic_uvw(
        3, 24, max_baseline_m=5000.0, seed=77
    )
    check_freqs = np.linspace(1.4e9, 1.45e9, 3)
    check_plan = make_plan(
        check_uvw,
        check_freqs,
        256,
        pixel_size_lm,
        epsilon=EPSILON,
        export_coords=True,
    )
    from ska_sdp_cip_tpu.ops.gridder import plan_host_arrays

    check_arrays = {
        k: jnp.asarray(v)
        for k, v in plan_host_arrays(
            check_plan, gridder="xla"
        ).items()
    }
    nvis_c = check_plan.num_vis
    check_re = np.zeros(nvis_c, np.float32)
    check_im = np.zeros(nvis_c, np.float32)
    cvis = rng.normal(size=2 * check_plan.num_vis_data).astype(
        np.float32
    )
    check_re[: check_plan.num_vis_data] = cvis[
        : check_plan.num_vis_data
    ]
    check_im[: check_plan.num_vis_data] = cvis[
        check_plan.num_vis_data :
    ]
    pallas_mode = (
        "pallas_interpret"
        if jax.default_backend() == "cpu"
        else "pallas"
    )
    img_pallas = np.asarray(
        build_invert(check_plan, gridder=pallas_mode)(
            check_arrays, jnp.asarray(check_re), jnp.asarray(check_im)
        )
    )
    img_xla = np.asarray(
        build_invert(check_plan, gridder="xla")(
            check_arrays, jnp.asarray(check_re), jnp.asarray(check_im)
        )
    )
    accuracy_rel = float(
        np.abs(img_pallas - img_xla).max() / np.abs(img_xla).max()
    )
    if not (np.isfinite(accuracy_rel) and accuracy_rel < 1e-4):
        print(
            json.dumps(
                {"error": "pallas-vs-xla mismatch", "rel": accuracy_rel}
            ),
            file=sys.stderr,
        )
        sys.exit(1)

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
        "warmup_seconds": round(warmup_seconds, 2),
        "plan_seconds": round(plan_seconds, 2),
        "stage_seconds": round(stage_seconds, 2),
        "staged_mb": round(staged_mb, 1),
        "dirty_exec_seconds": round(dirty_exec_seconds, 5),
        "time_to_dirty_seconds": round(time_to_dirty, 2),
        "time_to_dirty_mvis_per_s": round(
            num_vis / time_to_dirty / 1e6, 2
        ),
        "compile_seconds": {
            "invert_chain": round(first_inv, 2),
            "predict_chain": round(first_pre, 2),
            "dirty": round(first_dirty, 2),
            "cycle": round(first_cyc, 2),
        },
        "aot": {
            "hits": AOT_STATS["hits"],
            "misses": AOT_STATS["misses"],
            "errors": AOT_STATS["errors"],
            "setup_seconds": round(aot_setup_seconds, 2),
        },
        "invert_seconds": round(invert_seconds, 5),
        "predict_seconds": round(predict_seconds, 5),
        "major_cycle_seconds": round(cycle_seconds, 5),
        "invert_mvis_per_s": round(vis_per_sec / 1e6, 2),
        "predict_mvis_per_s": round(
            num_vis / predict_seconds / 1e6, 2
        ),
        "pallas_vs_xla_max_rel": accuracy_rel,
    }
    print(json.dumps(detail), file=sys.stderr)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
