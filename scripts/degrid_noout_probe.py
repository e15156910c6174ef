"""
Isolate the degrid kernel's per-step output-DMA cost on chip.

Times the full degrid-only predict (CIP_ABLATE=nofft baseline: zero
allocs, kernel only) against CIP_ABLATE combined with the kernel-level
``noout`` ablation (output DMA ring skipped entirely; stores kept so
the math survives DCE). The difference is the budget a panel-batched
output scheme could recover. Timing-only — both variants produce
wrong visibilities.
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
    from ska_sdp_cip_tpu.ops.plan import make_plan

    uvw, _ = synthetic_uvw(
        NUM_TIMES, NUM_ANTENNAS, max_baseline_m=7700.0, seed=42
    )
    freqs = np.linspace(1.40e9, 1.507e9, NUM_CHANNELS)
    pixel_size_lm = float(np.sin(np.radians(PIXEL_ASEC / 3600.0)))

    plan = make_plan(
        uvw, freqs, NUM_PIXELS, pixel_size_lm, epsilon=EPSILON
    )

    _probe = jax.jit(lambda x: x + 1.0)

    def scalar_fetch():
        return float(np.asarray(_probe(jnp.float32(1.0))))

    scalar_fetch()

    image0 = jnp.ones((NUM_PIXELS, NUM_PIXELS), jnp.float32)
    results = {}
    from ska_sdp_cip_tpu.ops.gridder import (
        build_predict,
        plan_device_arrays,
    )

    arrays = plan_device_arrays(plan, slot_mode=True)
    _ = float(np.asarray(arrays["packed"][0, 0]))
    for label, env in (
        ("nofft", "nofft"),
        ("nofft_noout", "nofft,noout"),
    ):
        os.environ["CIP_ABLATE"] = env
        predict = build_predict(plan, slot_output=True)

        @jax.jit
        def predict_chain(arrays, image, seed, _p=predict):
            def body(_, acc):
                out_re, out_im = _p(
                    arrays, image * (1.0 + (acc + seed) * 1e-30)
                )
                return out_re[0] + out_im[1]

            return jax.lax.fori_loop(
                0, CHAIN, body, jnp.float32(0.0)
            )

        t0 = time.time()
        _ = np.asarray(
            jax.block_until_ready(
                predict_chain(arrays, image0, jnp.float32(0))
            )
        )
        results[f"{label}_compile_s"] = round(time.time() - t0, 2)
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
        results[label] = best / CHAIN
        print(
            f"# {label}: {results[label]*1e3:.2f} ms",
            file=sys.stderr,
            flush=True,
        )
    os.environ.pop("CIP_ABLATE", None)

    out = {
        "kernel_with_outdma_ms": round(results["nofft"] * 1e3, 2),
        "kernel_noout_ms": round(results["nofft_noout"] * 1e3, 2),
        "outdma_share_ms": round(
            (results["nofft"] - results["nofft_noout"]) * 1e3, 2
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
