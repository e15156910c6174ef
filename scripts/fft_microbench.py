"""
Per-plane cost decomposition of the production invert on one chip.

The production invert (scripts/production_bench.py: 10240 px -> 20480^2
grid, 9 w-planes) measures ~171 ms/plane while the MAC+HBM floor of the
per-plane pipeline is ~35 ms — this script times each stage of
plane_body in isolation on hardware to locate the gap:

  1. fft2-to-image (both axes, out-cropped to npix)
  2. fft stage pieces (last-axis full, first-axis cropped input)
  3. fold_wraps
  4. w-correction accumulate

Usage: python scripts/fft_microbench.py [npix]
"""

import json
import sys
import time

import numpy as np

NPIX = int(sys.argv[1]) if len(sys.argv) > 1 else 10240


def timed(fn, *args, n=3):
    out = fn(*args)
    _ = float(np.asarray(out[0] if isinstance(out, tuple) else out).ravel()[0])
    best = 1e9
    for _i in range(n):
        t0 = time.time()
        out = fn(*args)
        _ = float(
            np.asarray(
                out[0] if isinstance(out, tuple) else out
            ).ravel()[0]
        )
        best = min(best, time.time() - t0)
    return best


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

    from ska_sdp_cip_tpu.ops.fft import (
        fft_last_axis,
        fft_first_axis,
        fft_plan_arrays,
        make_fft_plan,
    )
    from ska_sdp_cip_tpu.ops.plan import next_even_grid_size

    npix = NPIX
    ngrid = next_even_grid_size(2 * npix)
    crop0 = (ngrid - npix) // 2
    f = fft_plan_arrays(make_fft_plan(ngrid, shifted=True))

    rng = np.random.default_rng(1)
    grid_re = jnp.asarray(
        rng.normal(size=(ngrid, ngrid)).astype(np.float32)
    )
    grid_im = jnp.asarray(
        rng.normal(size=(ngrid, ngrid)).astype(np.float32)
    )

    results = {"ngrid": ngrid, "npix": npix}

    @jax.jit
    def full(re, im):
        r1, i1 = fft_last_axis(re, im, f, sign=+1, out_crop=(crop0, npix))
        r2, i2 = fft_first_axis(r1, i1, f, sign=+1, out_crop=(crop0, npix))
        return r2, i2

    results["fft2_to_image_s"] = timed(full, grid_re, grid_im)

    @jax.jit
    def last_only(re, im):
        return fft_last_axis(re, im, f, sign=+1, out_crop=(crop0, npix))

    results["fft_last_axis_s"] = timed(last_only, grid_re, grid_im)

    re1, im1 = jax.block_until_ready(last_only(grid_re, grid_im))

    @jax.jit
    def first_only(re, im):
        return fft_first_axis(re, im, f, sign=+1, out_crop=(crop0, npix))

    results["fft_first_axis_s"] = timed(first_only, re1, im1)

    # Uncropped last-axis pass (stage-2 pruning effect)
    @jax.jit
    def last_nocrop(re, im):
        return fft_last_axis(re, im, f, sign=+1)

    results["fft_last_axis_nocrop_s"] = timed(last_nocrop, grid_re, grid_im)

    # Pure elementwise pass for the bandwidth floor
    @jax.jit
    def axpy(re, im):
        return re * 1.0001 + im, im * 0.9999 - re

    results["elementwise_pass_s"] = timed(axpy, grid_re, grid_im)

    # Pure big matmul for the MXU ceiling at this precision
    a = jnp.asarray(rng.normal(size=(8192, 8192)).astype(np.float32))

    @jax.jit
    def mm(a):
        import jax.lax as lax

        return jnp.matmul(a, a, precision=lax.Precision.HIGH)

    t = timed(mm, a)
    results["matmul8k_s"] = t
    results["matmul8k_tflops_bf16x3"] = round(
        3 * 2 * 8192**3 / t / 1e12, 1
    )

    print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v) for k, v in results.items()}))


if __name__ == "__main__":
    main()
