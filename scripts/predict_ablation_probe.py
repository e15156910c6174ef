"""
On-chip cost decomposition of the predict (degrid) chain.

The round-3 verdict's remaining perf gap is predict vs invert
(63 vs 101 Mvis/s on the 5.8M-vis bench). This probe times the
predict program in three TIMING-ONLY variants (CIP_ABLATE, see
ops/gridder.py:build_predict) on the bench workload:

  full       screen+FFT per plane, then the degrid kernel
  nodegrid   screen/forward-FFT/unfold side only (kernel skipped)
  nofft      degrid kernel only (zero allocs fed in)

and prints one JSON line with the split, so kernel work targets the
measured bottleneck rather than a guess. Mirrors the invert's
CIP_ABLATE=nofft decomposition (docs/src/performance.rst).

Reference hot loop being optimized: ducc0 dirty2ms inside
/root/reference/src/ska_sdp_cip/invert.py:170-183 (degrid direction).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NUM_TIMES = 20
NUM_ANTENNAS = 96
NUM_CHANNELS = 64
NUM_PIXELS = 2048
PIXEL_ASEC = 5.0
EPSILON = 1e-4
REPEATS = 4
CHAIN = 16


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
        build_predict,
        plan_device_arrays,
    )
    from ska_sdp_cip_tpu.ops.plan import make_plan

    uvw, _ = synthetic_uvw(
        NUM_TIMES, NUM_ANTENNAS, max_baseline_m=7700.0, seed=42
    )
    freqs = np.linspace(1.40e9, 1.507e9, NUM_CHANNELS)
    pixel_size_lm = float(np.sin(np.radians(PIXEL_ASEC / 3600.0)))

    plan = make_plan(
        uvw, freqs, NUM_PIXELS, pixel_size_lm, epsilon=EPSILON
    )
    arrays = plan_device_arrays(plan, slot_mode=True)
    _ = float(np.asarray(arrays["packed"][0, 0]))

    _probe = jax.jit(lambda x: x + 1.0)

    def scalar_fetch():
        return float(np.asarray(_probe(jnp.float32(1.0))))

    scalar_fetch()

    image0 = jnp.ones((NUM_PIXELS, NUM_PIXELS), jnp.float32)
    results = {}
    for mode in (None, "nodegrid", "nofft"):
        if mode is None:
            os.environ.pop("CIP_ABLATE", None)
        else:
            os.environ["CIP_ABLATE"] = mode
        predict = build_predict(plan, slot_output=True)

        @jax.jit
        def predict_chain(arrays, image, seed, _p=predict):
            def body(_, acc):
                out = _p(
                    arrays, image * (1.0 + (acc + seed) * 1e-30)
                )
                try:
                    out_re, out_im = out
                    return out_re[0] + out_im[1]
                except TypeError:
                    # nodegrid returns a scalar accumulator
                    return out

            return jax.lax.fori_loop(
                0, CHAIN, body, jnp.float32(0.0)
            )

        t0 = time.time()
        _ = np.asarray(
            jax.block_until_ready(
                predict_chain(arrays, image0, jnp.float32(0))
            )
        )
        compile_s = time.time() - t0
        fetch = float("inf")
        for _i in range(3):
            t0 = time.time()
            scalar_fetch()
            fetch = min(fetch, time.time() - t0)
        best = float("inf")
        for rep in range(1, REPEATS + 1):
            t0 = time.time()
            _ = np.asarray(
                jax.block_until_ready(
                    predict_chain(arrays, image0, jnp.float32(rep))
                )
            )
            best = min(best, max(time.time() - t0 - fetch, 1e-9))
        key = mode or "full"
        results[key] = best / CHAIN
        results[f"{key}_compile_s"] = round(compile_s, 2)
        print(
            f"# {key}: {results[key]*1e3:.2f} ms/predict",
            file=sys.stderr,
            flush=True,
        )
    os.environ.pop("CIP_ABLATE", None)

    num_vis = plan.num_vis_data
    out = {
        "num_vis": num_vis,
        "nplanes": plan.nplanes,
        "plane_group": plan.plane_group,
        "full_ms": round(results["full"] * 1e3, 2),
        "screen_fft_ms": round(results["nodegrid"] * 1e3, 2),
        "degrid_kernel_ms": round(results["nofft"] * 1e3, 2),
        "overlap_ms": round(
            (results["nodegrid"] + results["nofft"] - results["full"])
            * 1e3,
            2,
        ),
        "full_mvis_per_s": round(num_vis / results["full"] / 1e6, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
