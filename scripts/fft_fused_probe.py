"""
Time the fused Pallas FFT pass vs the XLA matmul FFT on hardware at
production grid sizes. Scalar-fold timing per bench.py rules.

Usage: python scripts/fft_fused_probe.py [ngrid]
"""

import json
import sys
import time

import numpy as np

NGRID = int(sys.argv[1]) if len(sys.argv) > 1 else 15360
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
    from ska_sdp_cip_tpu.ops.fft_pallas import (
        fft2_to_image_fused,
        fft_first_axis_fused,
        fused_pass_host_arrays,
        fused_pass_meta,
    )

    n = NGRID
    npix = n // 2 if n % 3 else n // 3 * 2
    # production mapping: ngrid = sigma * npix; probe with npix = 2n/3
    # (sigma 1.5). For ngrid 20480 use npix = n/2 (sigma 2.0).
    if n == 20480:
        npix = 10240
    elif n == 15360:
        npix = 10240
    crop0 = (n - npix) // 2

    import os

    plan = make_fft_plan(n, shifted=True)
    chunk = os.environ.get("CIP_FFTP_C")
    qb = os.environ.get("CIP_FFTP_QB")
    meta = fused_pass_meta(
        plan,
        (crop0, npix),
        chunk=int(chunk) if chunk else None,
        qb=int(qb) if qb else None,
    )
    print(
        f"# n={n} n1={plan.n1} n2={plan.n2} C={meta.c} QB={meta.qb}"
        f" QS={meta.qs}",
        flush=True,
    )
    host = fused_pass_host_arrays(plan, meta, sign=+1, prefix="fp")
    f = {k: jnp.asarray(v) for k, v in host.items()}
    fx = fft_plan_arrays(plan)

    rng = np.random.default_rng(1)
    grid_re = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))
    grid_im = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))

    def timed(fn):
        fn_jit = jax.jit(fn)
        _ = float(np.asarray(fn_jit(grid_re, grid_im, jnp.float32(0.0))))
        best = 1e30
        for k in range(REPEATS):
            t0 = time.time()
            _ = float(
                np.asarray(fn_jit(grid_re, grid_im, jnp.float32(k + 1.0)))
            )
            best = min(best, time.time() - t0)
        return round(best, 4)

    results = {"ngrid": n, "npix": npix}

    def record(name, fn):
        results[name] = timed(fn)
        print(f"# {name}: {results[name]}", flush=True)

    def fused_first(re, im, seed):
        re = re * (1.0 + seed * 1e-30)
        r, i = fft_first_axis_fused(re, im, f, meta=meta, prefix="fp")
        return r[0, 0] + i[0, 0] + r[npix // 2, npix // 2]

    record("fused_first_axis_s", fused_first)

    def xla_first(re, im, seed):
        re = re * (1.0 + seed * 1e-30)
        r, i = fft_first_axis(re, im, fx, sign=+1, out_crop=(crop0, npix))
        return r[0, 0] + i[0, 0] + r[npix // 2, npix // 2]

    record("xla_first_axis_s", xla_first)

    def fused_fft2(re, im, seed):
        re = re * (1.0 + seed * 1e-30)
        r, i = fft2_to_image_fused(f, re, im, meta=meta, prefix="fp")
        return r[0, 0] + i[0, 0] + r[npix // 2, npix // 2]

    record("fused_fft2_s", fused_fft2)

    def xla_fft2(re, im, seed):
        re = re * (1.0 + seed * 1e-30)
        r1, i1 = fft_last_axis(re, im, fx, sign=+1, out_crop=(crop0, npix))
        r, i = fft_first_axis(r1, i1, fx, sign=+1, out_crop=(crop0, npix))
        return r[0, 0] + i[0, 0] + r[npix // 2, npix // 2]

    record("xla_fft2_s", xla_fft2)

    # accuracy cross-check on hardware (same inputs)
    import jax

    ar, ai = jax.jit(
        lambda a, b: fft2_to_image_fused(f, a, b, meta=meta, prefix="fp")
    )(grid_re, grid_im)
    br, bi = jax.jit(
        lambda a, b: fft_first_axis(
            *fft_last_axis(a, b, fx, sign=+1, out_crop=(crop0, npix)),
            fx,
            sign=+1,
            out_crop=(crop0, npix),
        )
    )(grid_re, grid_im)
    sub = (slice(0, npix, 97), slice(0, npix, 101))
    da = np.asarray(ar[sub]) - np.asarray(br[sub])
    scale = float(np.abs(np.asarray(br[sub])).max())
    results["max_rel_err_sampled"] = float(np.abs(da).max() / scale)
    print(json.dumps(results))


def probe_from_image() -> None:
    """fused vs XLA forward (from-image) 2-D DFT at the same size."""
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
    from ska_sdp_cip_tpu.ops.fft_pallas import (
        fft2_from_image_fused,
        fused_pass_host_arrays,
        fused_pass_meta,
    )

    n = NGRID
    npix = 10240 if n in (15360, 20480) else n // 2
    crop0 = (n - npix) // 2
    plan = make_fft_plan(n, shifted=True)
    meta = fused_pass_meta(plan, None, in_crop=(crop0, npix))
    host = fused_pass_host_arrays(plan, meta, sign=-1, prefix="fq")
    f = {k: jnp.asarray(v) for k, v in host.items()}
    fx = fft_plan_arrays(plan)

    rng = np.random.default_rng(2)
    img_re = jnp.asarray(
        rng.normal(size=(npix, npix)).astype(np.float32)
    )
    img_im = jnp.asarray(
        rng.normal(size=(npix, npix)).astype(np.float32)
    )

    def timed(fn):
        fn_jit = jax.jit(fn)
        _ = float(np.asarray(fn_jit(img_re, img_im, jnp.float32(0.0))))
        best = 1e30
        for k in range(REPEATS):
            t0 = time.time()
            _ = float(
                np.asarray(fn_jit(img_re, img_im, jnp.float32(k + 1.0)))
            )
            best = min(best, time.time() - t0)
        return round(best, 4)

    results = {"ngrid": n, "npix": npix}

    def fused(re, im, seed):
        re = re * (1.0 + seed * 1e-30)
        r, i = fft2_from_image_fused(f, re, im, meta=meta, prefix="fq")
        return r[0, 0] + i[0, 0] + r[n // 2, n // 2]

    results["fused_from_image_s"] = timed(fused)
    print(f"# fused_from_image: {results['fused_from_image_s']}", flush=True)

    def xla(re, im, seed):
        re = re * (1.0 + seed * 1e-30)
        r1, i1 = fft_last_axis(re, im, fx, sign=-1, in_crop=(crop0, npix))
        r, i = fft_first_axis(r1, i1, fx, sign=-1, in_crop=(crop0, npix))
        return r[0, 0] + i[0, 0] + r[n // 2, n // 2]

    results["xla_from_image_s"] = timed(xla)
    print(f"# xla_from_image: {results['xla_from_image_s']}", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    import os

    if os.environ.get("CIP_PROBE_FROM_IMAGE"):
        probe_from_image()
    else:
        main()
