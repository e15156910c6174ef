"""
In-kernel ablation of the fused FFT pass at the production grid:
times kernel variants with later stages disabled to locate where the
measured 45 ms/axis goes (HBM floor is ~8 ms at 680 GB/s, ~25 ms at
the ~130 GB/s the full kernel achieves).

Variants: dma (copy block rows to out), s1 (stage-1 dot only),
s1tw (plus twiddle), s1twtr (plus the inter-stage transpose),
full (plus stage-2 dot + accumulate).
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
    n1, c, qs, mb = meta.n1, meta.c, meta.qs, meta.mb
    host = fused_pass_host_arrays(plan, meta, sign=+1, prefix="fp")
    f = {k: jnp.asarray(v) for k, v in host.items()}
    print(f"# n={n} n1={n1} C={c} QB={meta.qb} QS={qs}", flush=True)

    rng = np.random.default_rng(1)
    grid_re = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))
    grid_im = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))

    def make_kernel(stage: str):
        def kernel(
            re_ref, im_ref, m1h_ref, m1l_ref, twc_ref, tws_ref,
            m2h_ref, m2l_ref, outr_ref, outi_ref,
        ):
            ci = pl.program_id(2)
            f32 = jnp.float32
            if stage == "dma":
                rows = qs * n1

                @pl.when(ci == 0)
                def _():
                    outr_ref[:] = jnp.zeros((rows, mb), f32)
                    outi_ref[:] = jnp.zeros((rows, mb), f32)

                @pl.when(ci >= 0)
                def _():
                    outr_ref[0:n1, :] += re_ref[:, 0, :]
                    outi_ref[0:n1, :] += im_ref[:, 0, :]
                return
            x2 = jnp.concatenate([re_ref[:], im_ref[:]], axis=0)
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
            if stage == "s1":
                zr, zi = yr, yi
            else:
                twc = twc_ref[0]
                tws = tws_ref[0]
                zr = yr * twc - yi * tws
                zi = yr * tws + yi * twc
            if stage in ("s1", "s1tw"):
                rows = qs * n1

                @pl.when(ci == 0)
                def _():
                    outr_ref[:] = jnp.zeros((rows, mb), f32)
                    outi_ref[:] = jnp.zeros((rows, mb), f32)

                @pl.when(ci >= 0)
                def _():
                    outr_ref[0:n1, :] += zr[:, 0, :]
                    outi_ref[0:n1, :] += zi[:, 0, :]
                return
            zrt = zr.transpose(1, 0, 2).reshape(c, n1 * mb)
            zit = zi.transpose(1, 0, 2).reshape(c, n1 * mb)
            z2 = jnp.concatenate([zrt, zit], axis=0)
            if stage == "s1twtr":
                rows = qs * n1

                @pl.when(ci == 0)
                def _():
                    outr_ref[:] = jnp.zeros((rows, mb), f32)
                    outi_ref[:] = jnp.zeros((rows, mb), f32)

                @pl.when(ci >= 0)
                def _():
                    outr_ref[0:rows, :] += z2[0, :].reshape(
                        n1, mb
                    )[0:1, :]
                return
            zh = z2.astype(jnp.bfloat16)
            zl = (z2 - zh.astype(f32)).astype(jnp.bfloat16)
            m2h = m2h_ref[0, 0]
            partial_ = (
                jnp.dot(m2h, zh, preferred_element_type=f32)
                + jnp.dot(m2l_ref[0, 0], zh, preferred_element_type=f32)
                + jnp.dot(m2h, zl, preferred_element_type=f32)
            )
            pr = partial_[:qs].reshape(qs * n1, mb)
            pi = partial_[qs:].reshape(qs * n1, mb)

            @pl.when(ci == 0)
            def _():
                outr_ref[:] = pr
                outi_ref[:] = pi

            @pl.when(ci != 0)
            def _():
                outr_ref[:] += pr
                outi_ref[:] += pi

        return kernel

    def run_variant(stage):
        num_mb = n // mb
        grid = (num_mb, meta.qb, meta.nc)
        rows = meta.n_rows_padded

        def fn(re, im, seed):
            re = re * (1.0 + seed * 1e-30)
            re3 = re.reshape(n1, meta.n2, n)
            im3 = im.reshape(n1, meta.n2, n)
            outr, outi = pl.pallas_call(
                make_kernel(stage),
                grid=grid,
                in_specs=[
                    pl.BlockSpec(
                        (n1, c, mb), lambda bm, qb, ci: (0, ci, bm)
                    ),
                    pl.BlockSpec(
                        (n1, c, mb), lambda bm, qb, ci: (0, ci, bm)
                    ),
                    pl.BlockSpec(
                        (2 * n1, 2 * n1), lambda bm, qb, ci: (0, 0)
                    ),
                    pl.BlockSpec(
                        (2 * n1, 2 * n1), lambda bm, qb, ci: (0, 0)
                    ),
                    pl.BlockSpec(
                        (1, n1, c, 1), lambda bm, qb, ci: (ci, 0, 0, 0)
                    ),
                    pl.BlockSpec(
                        (1, n1, c, 1), lambda bm, qb, ci: (ci, 0, 0, 0)
                    ),
                    pl.BlockSpec(
                        (1, 1, 2 * qs, 2 * c),
                        lambda bm, qb, ci: (qb, ci, 0, 0),
                    ),
                    pl.BlockSpec(
                        (1, 1, 2 * qs, 2 * c),
                        lambda bm, qb, ci: (qb, ci, 0, 0),
                    ),
                ],
                out_specs=[
                    pl.BlockSpec(
                        (qs * n1, mb), lambda bm, qb, ci: (qb, bm)
                    ),
                    pl.BlockSpec(
                        (qs * n1, mb), lambda bm, qb, ci: (qb, bm)
                    ),
                ],
                out_shape=[
                    jax.ShapeDtypeStruct((rows, n), jnp.float32),
                    jax.ShapeDtypeStruct((rows, n), jnp.float32),
                ],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=(
                        "parallel", "arbitrary", "arbitrary"
                    ),
                    vmem_limit_bytes=100 * 1024 * 1024,
                ),
            )(
                re3, im3,
                f["fp_m1_hi"], f["fp_m1_lo"],
                f["fp_twc"], f["fp_tws"],
                f["fp_m2_hi"], f["fp_m2_lo"],
            )
            return outr[0, 0] + outi[0, 0] + outr[n1 - 1, n - 1]

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

    results = {"ngrid": n}
    for stage in ("dma", "s1", "s1tw", "s1twtr", "full"):
        try:
            results[stage] = run_variant(stage)
            print(f"# {stage}: {results[stage]}", flush=True)
        except Exception as e:
            results[stage] = None
            print(f"# {stage}: FAILED {str(e)[:160]}", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
