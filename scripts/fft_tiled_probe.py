"""
Tiled-input fused FFT probe at the production grid: times the
baseline fused pass (strided 512-byte input DMAs), the Pallas
pretile restructure, and the tiled-input pass (contiguous 4 MB
fetches), plus the combined pretile+pass — the round-5 attack on the
~35 ms strided-DMA share of the 45 ms axis pass.
Usage: fft_tiled_probe.py [ngrid]
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

    from ska_sdp_cip_tpu.ops.fft import make_fft_plan
    from ska_sdp_cip_tpu.ops.fft_pallas import (
        fft_first_axis_fused,
        fused_pass_host_arrays,
        fused_pass_meta,
        pretile_first_axis,
    )

    n = NGRID
    npix = 10240 if n in (15360, 20480) else n // 2
    crop0 = (n - npix) // 2
    plan = make_fft_plan(n, shifted=True)
    meta = fused_pass_meta(plan, (crop0, npix))
    host = fused_pass_host_arrays(plan, meta, sign=+1, prefix="fp")
    f = {k: jnp.asarray(v) for k, v in host.items()}

    rng = np.random.default_rng(1)
    re = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))
    im = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))

    _p = jax.jit(lambda x: x + 1.0)

    def fetch():
        return float(np.asarray(_p(jnp.float32(1.0))))

    fetch()

    def timed(label, fn, *args):
        try:
            t0 = time.time()
            out = np.asarray(
                jax.block_until_ready(fn(*args, jnp.float32(0)))
            )
            first = time.time() - t0
            best = 1e9
            for rep in range(1, REPEATS + 1):
                t0 = time.time()
                np.asarray(
                    jax.block_until_ready(fn(*args, jnp.float32(rep)))
                )
                best = min(best, time.time() - t0)
            fo = 1e9
            for _ in range(3):
                t0 = time.time()
                fetch()
                fo = min(fo, time.time() - t0)
            best = max(best - fo, 0)
            print(
                f"# {label}: {best*1000:.1f} ms (first {first:.1f} s)",
                flush=True,
            )
            return best, out
        except Exception as exc:  # noqa: BLE001
            print(f"# {label}: FAILED {str(exc)[:140]}", flush=True)
            return None, None

    @jax.jit
    def base(re, im, seed):
        r, i = fft_first_axis_fused(
            re * (1.0 + seed * 1e-30), im, f, meta=meta, prefix="fp"
        )
        return r[0, 0] + i[0, 0] + r[npix // 2, npix // 2]

    @jax.jit
    def pret(re, im, seed):
        tr, ti = pretile_first_axis(
            re * (1.0 + seed * 1e-30), im, meta=meta
        )
        return tr[0, 0, 0, 0, 0] + ti[0, 0, 0, 0, 0]

    tr, ti = pretile_first_axis(re, im, meta=meta)
    tr = jax.block_until_ready(tr)
    ti = jax.block_until_ready(ti)

    @jax.jit
    def tiled(tr, ti, seed):
        r, i = fft_first_axis_fused(
            tr * (1.0 + seed * 1e-30), ti, f,
            meta=meta, prefix="fp", tiled=True,
        )
        return r[0, 0] + i[0, 0] + r[npix // 2, npix // 2]

    @jax.jit
    def combined(re, im, seed):
        tr, ti = pretile_first_axis(
            re * (1.0 + seed * 1e-30), im, meta=meta
        )
        r, i = fft_first_axis_fused(
            tr, ti, f, meta=meta, prefix="fp", tiled=True
        )
        return r[0, 0] + i[0, 0] + r[npix // 2, npix // 2]

    b_base, v_base = timed("baseline pass", base, re, im)
    timed("pretile only", pret, re, im)
    b_tiled, v_tiled = timed("tiled pass", tiled, tr, ti)
    b_comb, v_comb = timed("pretile+tiled", combined, re, im)
    if v_base is not None and v_comb is not None:
        print(
            f"# scalar agreement: {abs(v_base - v_comb):.3e}",
            flush=True,
        )
    print(
        json.dumps(
            {
                "ngrid": n,
                "baseline_ms": None if b_base is None else b_base * 1e3,
                "tiled_ms": None if b_tiled is None else b_tiled * 1e3,
                "combined_ms": None if b_comb is None else b_comb * 1e3,
            }
        )
    )


if __name__ == "__main__":
    main()
