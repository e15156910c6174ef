"""
Per-plane cost decomposition of the production invert on one chip.

Times each stage of the per-w-plane pipeline (grid-sized FFT passes,
elementwise pass, raw matmul) in isolation on hardware. Relay timing
rules (see bench.py): execution is lazy and identical (program, input)
pairs can be served from a relay cache, so every timed function folds
its result to a SCALAR inside jit (fetching any array element would
drag the full buffer through the tunnel) and feeds a fresh seed per
repeat.

Usage: python scripts/fft_microbench.py [npix]
"""

import json
import sys
import time

import numpy as np

NPIX = int(sys.argv[1]) if len(sys.argv) > 1 else 10240
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

    from ska_sdp_cip_tpu.ops.fft import (
        fft_first_axis,
        fft_last_axis,
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

    def timed(fn):
        fn_jit = jax.jit(fn)
        _ = float(np.asarray(fn_jit(grid_re, grid_im, jnp.float32(0.0))))
        best = 1e30
        for k in range(REPEATS):
            seed = jnp.float32(k + 1.0)
            t0 = time.time()
            _ = float(np.asarray(fn_jit(grid_re, grid_im, seed)))
            best = min(best, time.time() - t0)
        return round(best, 4)

    results = {"ngrid": ngrid, "npix": npix}

    def record(name, fn):
        results[name] = timed(fn)
        print(f"# {name}: {results[name]}", flush=True)

    def full(re, im, seed):
        re = re * (1.0 + seed * 1e-30)
        r1, i1 = fft_last_axis(re, im, f, sign=+1, out_crop=(crop0, npix))
        r2, i2 = fft_first_axis(r1, i1, f, sign=+1, out_crop=(crop0, npix))
        return r2[0, 0] + i2[0, 0] + r2[npix // 2, npix // 2]

    record("fft2_to_image_s", full)

    def last_only(re, im, seed):
        re = re * (1.0 + seed * 1e-30)
        r1, i1 = fft_last_axis(re, im, f, sign=+1, out_crop=(crop0, npix))
        return r1[0, 0] + i1[0, 0]

    record("fft_last_axis_s", last_only)

    def last_nocrop(re, im, seed):
        re = re * (1.0 + seed * 1e-30)
        r1, i1 = fft_last_axis(re, im, f, sign=+1)
        return r1[0, 0] + i1[0, 0]

    record("fft_last_axis_nocrop_s", last_nocrop)

    def axpy(re, im, seed):
        re = re * (1.0 + seed * 1e-30)
        out_r = re * 1.0001 + im
        out_i = im * 0.9999 - re
        return out_r[0, 0] + out_i[0, 0]

    record("elementwise_pass_s", axpy)

    # NOTE: the matmul operand must be an ARGUMENT — a closed-over
    # 256 MB constant gets embedded in the remote-compile request and
    # the relay rejects it (HTTP 413).
    def mm(re, im, seed):
        del im
        import jax.lax as lax

        operand = lax.slice(re, (0, 0), (8192, 8192))
        out = jnp.matmul(
            operand * (1.0 + seed * 1e-30),
            operand,
            precision=lax.Precision.HIGH,
        )
        return out[0, 0]

    t = timed(mm)
    results["matmul8k_s"] = t
    results["matmul8k_tflops_bf16x3"] = round(
        3 * 2 * 8192**3 / t / 1e12, 1
    )

    print(json.dumps(results))


if __name__ == "__main__":
    main()
