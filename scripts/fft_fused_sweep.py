"""
(C, QB) tuning sweep of the fused Pallas FFT pass at one grid size.
Times only the fused first-axis pass per configuration (scalar-fold
rules as in bench.py). Usage: fft_fused_sweep.py [ngrid]
"""

import json
import sys
import time

import numpy as np

NGRID = int(sys.argv[1]) if len(sys.argv) > 1 else 15360
REPEATS = 3
# (chunk C, q-split QB, lane block MB). The kernel's input DMA
# fetches (n1, C, MB) blocks as n1*C strided rows of MB*4 bytes; at
# MB=128 those are 512-byte descriptors measured at ~54 GB/s — wider
# lane blocks mean 1-2 KB descriptors (fewer, longer bursts).
CONFIGS = [
    (32, 1, 128),   # round-1 best: 46.1 ms at 15360
    (64, 1, 128),   # round-1 best: 45.7 ms
    (128, 1, 128),  # NC=1: single chunk per m-block
    (16, 1, 256),
    (32, 1, 256),
    (64, 1, 256),
    (128, 1, 256),
    (8, 1, 512),
    (16, 1, 512),
    (32, 1, 512),
    (16, 2, 512),
    (32, 2, 256),
    (64, 2, 256),
    (8, 1, 1024),
    (16, 1, 1024),
    (8, 2, 1024),
]

# Env override: CIP_FFT_SWEEP="c,qb,mb;c,qb,mb;..." selects a subset
# (relay compiles are slow; a full sweep can exceed one run's budget).
_env = __import__("os").environ.get("CIP_FFT_SWEEP")
if _env:
    CONFIGS = [
        tuple(int(x) for x in part.split(","))
        for part in _env.split(";")
        if part.strip()
    ]


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

    from ska_sdp_cip_tpu.ops.fft import make_fft_plan
    from ska_sdp_cip_tpu.ops.fft_pallas import (
        fft_first_axis_fused,
        fused_pass_host_arrays,
        fused_pass_meta,
    )

    n = NGRID
    npix = 10240 if n in (15360, 20480) else n // 2
    crop0 = (n - npix) // 2
    plan = make_fft_plan(n, shifted=True)

    rng = np.random.default_rng(1)
    grid_re = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))
    grid_im = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))

    results = {"ngrid": n, "npix": npix}
    for c, qb, mb in CONFIGS:
        if plan.n2 % c or n % mb:
            continue
        try:
            meta = fused_pass_meta(
                plan, (crop0, npix), chunk=c, qb=qb, mb=mb
            )
            host = fused_pass_host_arrays(
                plan, meta, sign=+1, prefix="fp"
            )
            f = {k: jnp.asarray(v) for k, v in host.items()}

            def fn(re, im, seed, f=f, meta=meta):
                re = re * (1.0 + seed * 1e-30)
                r, i = fft_first_axis_fused(
                    re, im, f, meta=meta, prefix="fp"
                )
                return r[0, 0] + i[0, 0] + r[npix // 2, npix // 2]

            fn_jit = jax.jit(fn)
            _ = float(
                np.asarray(fn_jit(grid_re, grid_im, jnp.float32(0.0)))
            )
            best = 1e30
            for k in range(REPEATS):
                t0 = time.time()
                _ = float(
                    np.asarray(
                        fn_jit(grid_re, grid_im, jnp.float32(k + 1.0))
                    )
                )
                best = min(best, time.time() - t0)
            results[f"c{c}_qb{qb}_mb{mb}_s"] = round(best, 4)
            print(f"# C={c} QB={qb} MB={mb}: {best:.4f}", flush=True)
        except Exception as e:
            results[f"c{c}_qb{qb}_mb{mb}_s"] = None
            print(
                f"# C={c} QB={qb} MB={mb}: FAILED {str(e)[:160]}",
                flush=True,
            )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
