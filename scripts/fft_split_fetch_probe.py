"""
DMA-concurrency probe for the fused FFT pass: the ablation shows the
pass is per-step fetch-bound (~54 GB/s with Mosaic's double
buffering = 2 DMAs in flight). Splitting the input into K separate
specs gives each its own double buffer -> 2K concurrent DMAs.
Variants: K=1 (baseline shape), K=2, K=4 splits on the j2-chunk axis.
Usage: fft_split_fetch_probe.py [ngrid]
"""

import json
import sys
import time
from functools import partial

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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ska_sdp_cip_tpu.ops.fft import make_fft_plan
    from ska_sdp_cip_tpu.ops.fft_pallas import (
        fused_pass_host_arrays,
        fused_pass_meta,
    )

    n = NGRID
    npix = 10240 if n in (15360, 20480) else n // 2
    crop0 = (n - npix) // 2
    plan = make_fft_plan(n, shifted=True)
    meta = fused_pass_meta(plan, (crop0, npix))
    n1, n2, c, qs, mb = meta.n1, meta.n2, meta.c, meta.qs, meta.mb
    host = fused_pass_host_arrays(plan, meta, sign=+1, prefix="fp")
    f = {k: jnp.asarray(v) for k, v in host.items()}
    print(f"# n={n} n1={n1} n2={n2} C={c} QS={qs}", flush=True)

    rng = np.random.default_rng(1)
    re = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))
    im = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))

    _p = jax.jit(lambda x: x + 1.0)

    def fetch():
        return float(np.asarray(_p(jnp.float32(1.0))))

    fetch()

    def build(k_split):
        cs = c // k_split

        def kernel(*refs):
            data = refs[: 2 * k_split]
            (m1h_ref, m1l_ref, twc_ref, tws_ref, m2h_ref,
             m2l_ref) = refs[2 * k_split : 2 * k_split + 6]
            outr_ref, outi_ref = refs[2 * k_split + 6 :]
            ci = pl.program_id(2)
            f32 = jnp.float32
            xr = jnp.concatenate(
                [data[2 * h][:] for h in range(k_split)], axis=1
            )
            xi = jnp.concatenate(
                [data[2 * h + 1][:] for h in range(k_split)], axis=1
            )
            x2 = jnp.concatenate([xr, xi], axis=0)
            x2 = x2.reshape(2 * n1, c * mb)
            xh = x2.astype(jnp.bfloat16)
            xl = (x2 - xh.astype(f32)).astype(jnp.bfloat16)
            m1h = m1h_ref[:]
            y = (
                jnp.dot(m1h, xh, preferred_element_type=f32)
                + jnp.dot(m1l_ref[:], xh, preferred_element_type=f32)
                + jnp.dot(m1h, xl, preferred_element_type=f32)
            )
            yr = y[:n1].reshape(n1, c, mb)
            yi = y[n1:].reshape(n1, c, mb)
            twc = twc_ref[0]
            tws = tws_ref[0]
            zr = yr * twc - yi * tws
            zi = yr * tws + yi * twc
            zrt = zr.transpose(1, 0, 2).reshape(c, n1 * mb)
            zit = zi.transpose(1, 0, 2).reshape(c, n1 * mb)
            z2 = jnp.concatenate([zrt, zit], axis=0)
            zh = z2.astype(jnp.bfloat16)
            zl = (z2 - zh.astype(f32)).astype(jnp.bfloat16)
            m2h = m2h_ref[0, 0]
            part = (
                jnp.dot(m2h, zh, preferred_element_type=f32)
                + jnp.dot(m2l_ref[0, 0], zh, preferred_element_type=f32)
                + jnp.dot(m2h, zl, preferred_element_type=f32)
            )
            pr = part[:qs].reshape(qs * n1, mb)
            pi = part[qs:].reshape(qs * n1, mb)

            @pl.when(ci == 0)
            def _():
                outr_ref[:] = pr
                outi_ref[:] = pi

            @pl.when(ci != 0)
            def _():
                outr_ref[:] += pr
                outi_ref[:] += pi

        num_mb = n // mb
        grid = (num_mb, 1, meta.nc)
        data_specs = []
        for h in range(k_split):
            for arr in range(2):
                data_specs.append(
                    pl.BlockSpec(
                        (n1, cs, mb),
                        lambda bm, qb, ci, h=h: (
                            0, ci * k_split + h, bm
                        ),
                    )
                )
        in_specs = data_specs + [
            pl.BlockSpec((2 * n1, 2 * n1), lambda bm, qb, ci: (0, 0)),
            pl.BlockSpec((2 * n1, 2 * n1), lambda bm, qb, ci: (0, 0)),
            pl.BlockSpec(
                (1, n1, c, 1), lambda bm, qb, ci: (ci, 0, 0, 0)
            ),
            pl.BlockSpec(
                (1, n1, c, 1), lambda bm, qb, ci: (ci, 0, 0, 0)
            ),
            pl.BlockSpec(
                (1, 1, 2 * qs, 2 * c),
                lambda bm, qb, ci: (0, ci, 0, 0),
            ),
            pl.BlockSpec(
                (1, 1, 2 * qs, 2 * c),
                lambda bm, qb, ci: (0, ci, 0, 0),
            ),
        ]
        out_specs = [
            pl.BlockSpec((qs * n1, mb), lambda bm, qb, ci: (0, bm)),
            pl.BlockSpec((qs * n1, mb), lambda bm, qb, ci: (0, bm)),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((qs * n1, n), jnp.float32),
            jax.ShapeDtypeStruct((qs * n1, n), jnp.float32),
        ]

        def run(re, im, seed):
            re3 = (re * (1.0 + seed * 1e-30)).reshape(n1, n2, n)
            im3 = im.reshape(n1, n2, n)
            # interleave the k_split views of the SAME array
            data = []
            for _h in range(k_split):
                data += [re3, im3]
            outr, outi = pl.pallas_call(
                kernel,
                grid=grid,
                in_specs=in_specs,
                out_specs=out_specs,
                out_shape=out_shape,
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=(
                        "parallel", "arbitrary", "arbitrary"
                    ),
                    vmem_limit_bytes=100 * 1024 * 1024,
                ),
            )(*data, f["fp_m1_hi"], f["fp_m1_lo"], f["fp_twc"],
              f["fp_tws"], f["fp_m2_hi"], f["fp_m2_lo"])
            t0 = meta.trim0
            return (
                outr[t0, 0]
                + outi[t0, 0]
                + outr[t0 + npix - 1, npix // 2]
            )

        return jax.jit(run)

    results = {"ngrid": n}
    outs = {}
    for k in (1, 2, 4):
        if c % k:
            continue
        try:
            fn = build(k)
            t0 = time.time()
            out = float(np.asarray(
                jax.block_until_ready(fn(re, im, jnp.float32(0)))
            ))
            first = time.time() - t0
            best = 1e9
            for rep in range(1, REPEATS + 1):
                t0 = time.time()
                np.asarray(jax.block_until_ready(
                    fn(re, im, jnp.float32(rep))
                ))
                best = min(best, time.time() - t0)
            fo = 1e9
            for _ in range(3):
                t0 = time.time()
                fetch()
                fo = min(fo, time.time() - t0)
            best = max(best - fo, 0)
            outs[k] = out
            print(
                f"# K={k}: {best*1000:.1f} ms (first {first:.1f} s)",
                flush=True,
            )
            results[f"k{k}_ms"] = best * 1e3
        except Exception as exc:  # noqa: BLE001
            print(f"# K={k}: FAILED {str(exc)[:140]}", flush=True)
    if len(outs) > 1:
        vals = list(outs.values())
        print(
            f"# scalar agreement: {max(abs(v - vals[0]) for v in vals):.3e}",
            flush=True,
        )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
