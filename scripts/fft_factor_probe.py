"""
Probe four-step factor ORDER at the production grid size.

Times the XLA matmul-FFT axis passes for several n1 x n2 factor
orders (measured on the v5e at 20480^2: order moves a pass by ~10%,
(80, 256) best). Superseded for production by the fused Pallas pass
(ops/fft_pallas.py, scripts/fft_fused_sweep.py); kept for XLA-path
regression checks. Scalar-fold timing per bench.py rules.
"""

import json
import sys
import time

import numpy as np

NGRID = int(sys.argv[1]) if len(sys.argv) > 1 else 20480
REPEATS = 3


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

    from ska_sdp_cip_tpu.ops import fft as fftmod
    from ska_sdp_cip_tpu.ops.fft import (
        fft_first_axis,
        fft_last_axis,
        fft_plan_arrays,
        make_fft_plan,
    )

    rng = np.random.default_rng(1)
    grid_re = jnp.asarray(
        rng.normal(size=(NGRID, NGRID)).astype(np.float32)
    )
    grid_im = jnp.asarray(
        rng.normal(size=(NGRID, NGRID)).astype(np.float32)
    )
    npix = NGRID // 2
    crop0 = (NGRID - npix) // 2

    def timed(fn):
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
        return round(best, 4)

    results = {"ngrid": NGRID}
    orig = fftmod._near_square_factors
    for n1, n2 in ((128, 160), (160, 128), (256, 80), (80, 256)):
        if NGRID % (n1 * n2):
            continue
        fftmod._near_square_factors = lambda n, a=n1: (
            a,
            n // a,
        )
        f = fft_plan_arrays(make_fft_plan(NGRID, shifted=True))

        def last(re, im, seed, f=f):
            re = re * (1.0 + seed * 1e-30)
            r1, i1 = fft_last_axis(
                re, im, f, sign=+1, out_crop=(crop0, npix)
            )
            return r1[0, 0] + i1[0, 0]

        results[f"last_axis_{n1}x{n2}_s"] = timed(last)
        print(
            f"# ({n1},{n2}): {results[f'last_axis_{n1}x{n2}_s']}",
            flush=True,
        )

        def first(re, im, seed, f=f):
            re = re * (1.0 + seed * 1e-30)
            r1, i1 = fft_first_axis(
                re, im, f, sign=+1, out_crop=(crop0, npix)
            )
            return r1[0, 0] + i1[0, 0]

        results[f"first_axis_{n1}x{n2}_s"] = timed(first)
        print(
            f"# first ({n1},{n2}): "
            f"{results[f'first_axis_{n1}x{n2}_s']}",
            flush=True,
        )

        def full(re, im, seed, f=f):
            re = re * (1.0 + seed * 1e-30)
            r1, i1 = fft_last_axis(
                re, im, f, sign=+1, out_crop=(crop0, npix)
            )
            r2, i2 = fft_first_axis(
                r1, i1, f, sign=+1, out_crop=(crop0, npix)
            )
            return r2[0, 0] + i2[0, 0]

        results[f"fft2_{n1}x{n2}_s"] = timed(full)
        print(
            f"# fft2 ({n1},{n2}): "
            f"{results[f'fft2_{n1}x{n2}_s']}",
            flush=True,
        )
    fftmod._near_square_factors = orig
    print(json.dumps(results))


if __name__ == "__main__":
    main()
