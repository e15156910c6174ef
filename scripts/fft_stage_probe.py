"""
Stage-level cost decomposition of one four-step FFT axis pass at the
production grid size. Times stage-1 matmul, twiddle pass, stage-2
matmul (cropped), and candidate fusions in isolation to locate the gap
between the measured per-axis pass (~92 ms at 20480) and its HBM floor
(~2.5 passes over 6.7 GB of split re/im data). Scalar-fold timing per
bench.py rules (fresh seed per repeat, result folded to a scalar).
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
    from jax import lax

    from ska_sdp_cip_tpu.ops.fft import (
        _stage1_block,
        _stage2_block,
        fft_plan_arrays,
        make_fft_plan,
    )

    n = NGRID
    npix = n // 2
    crop0 = (n - npix) // 2
    plan = make_fft_plan(n, shifted=True)
    n1, n2 = plan.n1, plan.n2
    f = fft_plan_arrays(plan)
    prec = lax.Precision.HIGH

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

    results = {"ngrid": n, "n1": n1, "n2": n2}

    def record(name, fn):
        results[name] = timed(fn)
        print(f"# {name}: {results[name]}", flush=True)

    s = 1.0
    m1 = _stage1_block(f["fft_d1_cos"], f["fft_d1_sin"], s)

    # --- first-axis pass pieces (stage 1 contracts the LEADING axis) ---
    def stage1_first(re, im, seed):
        re = re * (1.0 + seed * 1e-30)
        x2 = jnp.concatenate(
            [re.reshape(n1, n2 * n), im.reshape(n1, n2 * n)], axis=0
        )
        y = jnp.dot(m1, x2, precision=prec)
        return y[0, 0] + y[1, 1]

    record("stage1_first_dot_s", stage1_first)

    def stage1_first_einsum(re, im, seed):
        re = re * (1.0 + seed * 1e-30)
        x2 = jnp.concatenate(
            [re.reshape(n1, n2, n), im.reshape(n1, n2, n)], axis=0
        )
        y = jnp.einsum("kj,jnm->knm", m1, x2, precision=prec)
        return y[0, 0, 0] + y[1, 1, 1]

    record("stage1_first_einsum_s", stage1_first_einsum)

    def twiddle_only(re, im, seed):
        re = re * (1.0 + seed * 1e-30)
        yr = re.reshape(n1, n2, n)
        yi = im.reshape(n1, n2, n)
        tr = f["fft_tw_cos"][:, :, None]
        ti = f["fft_tw_sin"][:, :, None]
        z2 = jnp.concatenate(
            [yr * tr - yi * ti, yr * ti + yi * tr], axis=1
        )
        return z2[0, 0, 0] + z2[1, 1, 1]

    record("twiddle_pass_s", twiddle_only)

    # stage 2 cropped, middle-axis einsum (current form)
    k2a, k2b = crop0 // n1, -(-(crop0 + npix) // n1)
    d2c = f["fft_d2_cos"][:, k2a:k2b]
    d2s = f["fft_d2_sin"][:, k2a:k2b]
    m2 = _stage2_block(d2c, d2s, s)
    q = d2c.shape[1]

    def stage2_first(re, im, seed):
        re = re * (1.0 + seed * 1e-30)
        z2 = jnp.concatenate(
            [re.reshape(n1, n2, n), im.reshape(n1, n2, n)], axis=1
        )
        out = jnp.einsum("knm,nq->qkm", z2, m2, precision=prec)
        return out[0, 0, 0] + out[1, 1, 1]

    record("stage2_first_einsum_s", stage2_first)

    # stage 2 as batched-over-k1 matmul with per-k1 fused twiddle
    # factors: rhs[k1] = block2(D2 * tw[k1, :]) of shape (2 n2, 2 q).
    twc = np.asarray(f["fft_tw_cos"])
    tws = np.asarray(f["fft_tw_sin"])
    d2c_h = np.asarray(d2c)
    d2s_h = np.asarray(d2s)
    # complex: (d2c + i s d2s) * (twc + i s tws), s = +1
    fc = twc[:, :, None] * d2c_h[None, :, :] - tws[:, :, None] * d2s_h[None, :, :]
    fs = twc[:, :, None] * d2s_h[None, :, :] + tws[:, :, None] * d2c_h[None, :, :]
    mk = jnp.asarray(
        np.concatenate(
            [
                np.concatenate([fc, fs], axis=2),
                np.concatenate([-fs, fc], axis=2),
            ],
            axis=1,
        )
    )  # (n1, 2 n2, 2 q)

    def stage2_batched(re, im, seed):
        re = re * (1.0 + seed * 1e-30)
        z2 = jnp.concatenate(
            [re.reshape(n1, n2, n), im.reshape(n1, n2, n)], axis=1
        )
        out = jnp.einsum("kam,kab->kbm", z2, mk, precision=prec)
        return out[0, 0, 0] + out[1, 1, 1]

    record("stage2_batched_fused_s", stage2_batched)

    # full first-axis pass, batched-fused form (stage1 dot + stage2
    # batched, twiddle folded into the stage-2 factors; output is in
    # (k1, k2) permuted order — order fixed once after the plane loop).
    def first_axis_fused(re, im, seed):
        re = re * (1.0 + seed * 1e-30)
        x2 = jnp.concatenate(
            [re.reshape(n1, n2 * n), im.reshape(n1, n2 * n)], axis=0
        )
        y = jnp.dot(m1, x2, precision=prec)  # (2 n1, n2 * n)
        z2 = jnp.concatenate(
            [y[:n1].reshape(n1, n2, n), y[n1:].reshape(n1, n2, n)],
            axis=1,
        )
        out = jnp.einsum("kam,kab->kbm", z2, mk, precision=prec)
        return out[0, 0, 0] + out[1, 1, 1]

    record("first_axis_fused_s", first_axis_fused)

    # transpose pass (what the 2-pass-both-leading plan would pay)
    def transpose_pass(re, im, seed):
        re = re * (1.0 + seed * 1e-30)
        a = re.T
        b = im.T
        return a[0, 0] + b[1, 1] + a[n - 1, n - 1]

    record("transpose_pass_s", transpose_pass)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
