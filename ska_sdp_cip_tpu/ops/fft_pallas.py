"""
Fused four-step DFT axis pass as a single Pallas TPU kernel.

The XLA matmul FFT (ops/fft.py) is HBM-bound: stage-1 dot, twiddle,
and stage-2 dot each materialize a full grid-sized intermediate, and
the measured per-axis pass runs at ~330-450 GB/s effective over ~3.5
full-array round trips (see scripts/fft_stage_probe.py; 92 ms per
axis at 20480^2 against a ~35 ms floor). This kernel performs
stage 1 -> twiddle -> stage 2 entirely in VMEM per (lane-block,
output-row-block, j2-chunk): the input is read once per output-row
block and the (cropped) output written exactly once, cutting HBM
traffic to ~QB reads + 1 write of the array.

Shape/layout notes (why this composition is relayout-light):

* the pass transforms the FIRST axis, so stage 1 contracts the
  leading n1 axis of the input viewed as (n1, n2, m) — a clean
  (2n1, 2n1) x (2n1, C*MB) MXU dot with the (C, MB) minor dims
  merged, which is layout-identical (no data movement);
* the only physical relayout per chunk is the (n1, C, MB) ->
  (C, n1, MB) transpose between the stages (sublane-granular VMEM
  copies, no lane shuffles);
* stage 2 is a (2QS, 2C) x (2C, n1*MB) dot whose output rows are
  already (k2-major, k1) — the standard four-step output order — so
  the accumulated block reshapes to (QS*n1, MB) for free.

Complex arithmetic rides as 2x2 real block factors and all dots use
the bf16x3 split-precision scheme (~1e-6 relative, far inside the
gridder's 1e-4 contract) with the hi/lo factor splits precomputed on
the host. The w-stacking invert calls this once per plane per axis
(reference hot loop: /root/reference/src/ska_sdp_cip/invert.py:170-183).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fft import FFTPlan

#: Lane-block width (output columns per kernel instance).
MB = 128

#: Target VMEM bytes for one output-row-block accumulator component.
#: QB (input re-reads) is chosen as the smallest split meeting this.
#: 6 MiB keeps QB=1 at the production sizes (measured on the v5e:
#: QB=1 45.7 ms vs QB=2 54.3 ms per 15360^2 axis pass — the extra
#: VMEM is cheaper than re-reading the input).
_OUT_BLOCK_BYTES = 6 * 1024 * 1024


def _pick_chunk(n2: int) -> int:
    """
    Largest divisor of n2 that is <= 64 (j2 chunk size C). Measured
    on the v5e at 15360^2 (QB=1): C=64 45.0 ms, C=32 46.1 ms, C=16
    61.9 ms per axis pass; C=128 exceeds VMEM.
    """
    for c in range(min(n2, 64), 0, -1):
        if n2 % c == 0:
            return c
    return 1


def _pick_qb(q: int, n1: int) -> int:
    """Smallest output-row split with QS*n1*MB*4 <= _OUT_BLOCK_BYTES."""
    max_qs = max(_OUT_BLOCK_BYTES // (n1 * MB * 4), 1)
    qb = -(-q // max_qs)
    return qb


@dataclass(frozen=True)
class FusedPassMeta:
    """Static geometry of one fused first-axis pass."""

    n1: int
    n2: int
    c: int
    qb: int
    qs: int
    k2a: int
    trim0: int
    size: int
    mb: int = MB
    #: Input-crop pruning (predict's forward FFT): only j1 columns
    #: [j1a, j1a + n1i) of the stage-1 factor are contracted, and the
    #: caller supplies only rows [pad_lo, pad_lo + in_size) of the
    #: covering (n1i * n2, m) input window. n1i == 0 means no crop.
    n1i: int = 0
    j1a: int = 0
    pad_lo: int = 0
    in_size: int = 0

    @property
    def nc(self) -> int:
        return self.n2 // self.c

    @property
    def n1_in(self) -> int:
        return self.n1i or self.n1

    @property
    def n_rows_padded(self) -> int:
        return self.qb * self.qs * self.n1


def fused_pass_meta(
    plan: FFTPlan,
    out_crop: tuple | None,
    *,
    in_crop: tuple | None = None,
    chunk: int | None = None,
    qb: int | None = None,
    mb: int = MB,
) -> FusedPassMeta:
    """
    Geometry (crop pruning + block splits) for one fused pass.
    ``out_crop=(start, size)`` prunes stage 2 to the covering output
    range (the invert's image crop); ``in_crop=(start, size)`` prunes
    stage 1 to the covering j1 range (the predict's zero-padded
    image). ``chunk``/``qb`` override the auto-picked j2 chunk size
    and output-row split (tuning knobs; measured on hardware).
    """
    n1, n2 = plan.n1, plan.n2
    if out_crop is not None:
        c0, size = out_crop
        k2a, k2b = c0 // n1, -(-(c0 + size) // n1)
    else:
        k2a, k2b = 0, n2
        c0, size = 0, plan.n
    q = k2b - k2a
    if qb is None:
        qb = _pick_qb(q, n1)
    qs = -(-q // qb)
    if chunk is not None:
        if n2 % chunk:
            raise ValueError(f"chunk {chunk} does not divide n2={n2}")
        c_pick = chunk
    else:
        c_pick = _pick_chunk(n2)
    n1i = j1a = pad_lo = in_size = 0
    if in_crop is not None:
        ci0, in_size = in_crop
        j1a, j1b = ci0 // n2, -(-(ci0 + in_size) // n2)
        n1i = j1b - j1a
        pad_lo = ci0 - j1a * n2
    return FusedPassMeta(
        mb=mb,
        n1=n1,
        n2=n2,
        c=c_pick,
        qb=qb,
        qs=qs,
        k2a=k2a,
        trim0=c0 - k2a * n1,
        size=size,
        n1i=n1i,
        j1a=j1a,
        pad_lo=pad_lo,
        in_size=in_size,
    )


def _split_hi_lo(a: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """bf16 hi/lo split of a host f32 array (for bf16x3 dots)."""
    import ml_dtypes

    hi = a.astype(ml_dtypes.bfloat16)
    lo = (a - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
    return hi, lo


def fused_pass_host_arrays(
    plan: FFTPlan,
    meta: FusedPassMeta,
    *,
    sign: int,
    prefix: str,
) -> dict:
    """
    Host factor arrays for one fused pass (device-put by the caller
    next to the other plan arrays). Sign is folded into the factors
    so the kernel itself is sign-free:

    * ``{prefix}_m1_hi/lo``: (2n1, 2n1i) stage-1 block
      [[C,-sS],[sS,C]] (j1 columns sliced to the in-crop window)
    * ``{prefix}_twc/tws``: (NC, n1, C, 1) twiddle cos / sign*sin
    * ``{prefix}_m2_hi/lo``: (QB, NC, 2QS, 2C) transposed stage-2
      block [[C2^T, -sS2^T], [sS2^T, C2^T]] per (q-block, j2-chunk),
      rows beyond the cropped q zero-padded.
    """
    s = float(sign)
    n1, n2, c = meta.n1, meta.n2, meta.c
    qb, qs, k2a = meta.qb, meta.qs, meta.k2a

    d1c = plan.d1_cos[:, meta.j1a : meta.j1a + meta.n1_in]
    d1s = plan.d1_sin[:, meta.j1a : meta.j1a + meta.n1_in]
    m1 = np.block(
        [[d1c, -s * d1s], [s * d1s, d1c]]
    ).astype(np.float32)

    twc = plan.tw_cos.reshape(n1, meta.nc, c)
    tws = (s * plan.tw_sin).reshape(n1, meta.nc, c)
    twc = np.ascontiguousarray(twc.transpose(1, 0, 2))[..., None]
    tws = np.ascontiguousarray(tws.transpose(1, 0, 2))[..., None]

    # Stage-2 factors, transposed and pre-blocked per (qb, chunk).
    q = qb * qs
    d2c = np.zeros((n2, q), np.float32)
    d2s = np.zeros((n2, q), np.float32)
    q_real = min(q, plan.d2_cos.shape[1] - k2a)
    d2c[:, :q_real] = plan.d2_cos[:, k2a : k2a + q_real]
    d2s[:, :q_real] = plan.d2_sin[:, k2a : k2a + q_real]
    m2 = np.zeros((qb, meta.nc, 2 * qs, 2 * c), np.float32)
    for b in range(qb):
        for ci in range(meta.nc):
            cc = d2c[ci * c : (ci + 1) * c, b * qs : (b + 1) * qs].T
            ss = d2s[ci * c : (ci + 1) * c, b * qs : (b + 1) * qs].T
            m2[b, ci] = np.block([[cc, -s * ss], [s * ss, cc]])

    m1_hi, m1_lo = _split_hi_lo(m1)
    m2_hi, m2_lo = _split_hi_lo(m2)
    return {
        f"{prefix}_m1_hi": m1_hi,
        f"{prefix}_m1_lo": m1_lo,
        f"{prefix}_twc": twc.astype(np.float32),
        f"{prefix}_tws": tws.astype(np.float32),
        f"{prefix}_m2_hi": m2_hi,
        f"{prefix}_m2_lo": m2_lo,
    }


def _kernel(
    re_ref,
    im_ref,
    m1h_ref,
    m1l_ref,
    twc_ref,
    tws_ref,
    m2h_ref,
    m2l_ref,
    outr_ref,
    outi_ref,
    *,
    n1: int,
    n1i: int,
    c: int,
    qs: int,
    mb: int,
    tiled: bool = False,
):
    ci = pl.program_id(2)
    f32 = jnp.float32

    # Stage 1: contract the n1i covered j1 rows (bf16x3); (C, MB)
    # merged minor dims. Tiled inputs arrive as (1, 1, n1i, C, MB)
    # blocks (contiguous fetches; see pretile_first_axis).
    xr = re_ref[0, 0] if tiled else re_ref[:]
    xi = im_ref[0, 0] if tiled else im_ref[:]
    x2 = jnp.concatenate([xr, xi], axis=0)
    x2 = x2.reshape(2 * n1i, c * mb)
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

    # Twiddle (sign folded into tws on the host).
    twc = twc_ref[0]
    tws = tws_ref[0]
    zr = yr * twc - yi * tws
    zi = yr * tws + yi * twc

    # Relayout (n1, C, MB) -> (C, n1*MB) and stage 2 (bf16x3).
    zrt = zr.transpose(1, 0, 2).reshape(c, n1 * mb)
    zit = zi.transpose(1, 0, 2).reshape(c, n1 * mb)
    z2 = jnp.concatenate([zrt, zit], axis=0)
    zh = z2.astype(jnp.bfloat16)
    zl = (z2 - zh.astype(f32)).astype(jnp.bfloat16)
    m2h = m2h_ref[0, 0]
    partial = (
        jnp.dot(m2h, zh, preferred_element_type=f32)
        + jnp.dot(m2l_ref[0, 0], zh, preferred_element_type=f32)
        + jnp.dot(m2h, zl, preferred_element_type=f32)
    )
    pr = partial[:qs].reshape(qs * n1, mb)
    pi = partial[qs:].reshape(qs * n1, mb)

    @pl.when(ci == 0)
    def _init():
        outr_ref[:] = pr
        outi_ref[:] = pi

    @pl.when(ci != 0)
    def _accumulate():
        outr_ref[:] += pr
        outi_ref[:] += pi


def _pretile_kernel(in_re, in_im, out_re, out_im, *, nc, c, num_mb, mb):
    """One j1 row-slab (1, n2, m) -> tiled (nc, num_mb, 1, c, mb)."""
    x = in_re[0]
    y = in_im[0]
    xt = x.reshape(nc, c, num_mb, mb).transpose(0, 2, 1, 3)
    yt = y.reshape(nc, c, num_mb, mb).transpose(0, 2, 1, 3)
    out_re[:, :, 0] = xt
    out_im[:, :, 0] = yt


@partial(jax.jit, static_argnames=("meta", "interpret"))
def pretile_first_axis(re, im, *, meta: FusedPassMeta, interpret=False):
    """
    Restructure the fused pass's input into CONTIGUOUS (n1, C, MB)
    tiles: layout (NC, num_mb, n1, C, MB). The fused kernel's natural
    input DMA gathers n1*C strided 512-byte rows per block (~54 GB/s,
    35 of the 45 ms pass at 15360^2); this kernel reads each j1
    row-slab (1, n2, m) as ONE contiguous fetch and writes 32 KB
    tiled chunks, so the downstream pass fetches 4 MB contiguous
    blocks instead. (An XLA pre-transpose was measured SLOWER — its
    transpose is itself strided; this kernel keeps both sides of the
    restructure in large DMAs.)
    """
    n1i, n2, c, mb = meta.n1_in, meta.n2, meta.c, meta.mb
    m = re.shape[1]
    num_mb = m // mb
    nc = meta.nc
    if re.shape[0] != n1i * n2:
        raise ValueError(
            f"pretile input shape {re.shape} != ({n1i * n2}, m)"
        )
    re3 = re.reshape(n1i, n2, m)
    im3 = im.reshape(n1i, n2, m)
    out_shape = [
        jax.ShapeDtypeStruct((nc, num_mb, n1i, c, mb), jnp.float32),
        jax.ShapeDtypeStruct((nc, num_mb, n1i, c, mb), jnp.float32),
    ]
    in_specs = [
        pl.BlockSpec((1, n2, m), lambda j1: (j1, 0, 0)),
        pl.BlockSpec((1, n2, m), lambda j1: (j1, 0, 0)),
    ]
    out_specs = [
        pl.BlockSpec(
            (nc, num_mb, 1, c, mb), lambda j1: (0, 0, j1, 0, 0)
        ),
        pl.BlockSpec(
            (nc, num_mb, 1, c, mb), lambda j1: (0, 0, j1, 0, 0)
        ),
    ]
    return pl.pallas_call(
        partial(
            _pretile_kernel, nc=nc, c=c, num_mb=num_mb, mb=mb
        ),
        grid=(n1i,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(re3, im3)


@partial(
    jax.jit,
    static_argnames=("meta", "prefix", "interpret", "tiled"),
)
def fft_first_axis_fused(
    re,
    im,
    f: dict,
    *,
    meta: FusedPassMeta,
    prefix: str,
    interpret: bool = False,
    tiled: bool = False,
):
    """
    DFT along the FIRST axis of (n, m) split arrays via the fused
    Pallas pass. ``f`` holds the arrays from
    :func:`fused_pass_host_arrays` (device-put). Output is cropped to
    ``meta.size`` rows, numerically matching
    ``ops.fft.fft_first_axis(..., out_crop=...)`` to bf16x3 accuracy.
    ``m`` must be a multiple of 128.
    """
    n1, n2, c, qs = meta.n1, meta.n2, meta.c, meta.qs
    mb = meta.mb
    n1i = meta.n1_in
    n = n1 * n2
    if tiled:
        # Input already restructured by pretile_first_axis:
        # (NC, num_mb, n1i, C, MB); each block fetch is ONE
        # contiguous n1i*C*MB*4-byte DMA. num_mb follows the input's
        # m; every other dim must match THIS meta.
        if (
            re.ndim != 5
            or re.shape[0] != meta.nc
            or re.shape[2:] != (n1i, c, mb)
        ):
            raise ValueError(
                f"bad tiled input shape {re.shape} (want "
                f"({meta.nc}, m/{mb}, {n1i}, {c}, {mb}))"
            )
        num_mb = re.shape[1]
        m = num_mb * mb
    else:
        m = re.shape[1]
        rows_in = meta.in_size if meta.in_size else n
        if re.shape != (rows_in, m) or m % mb:
            raise ValueError(
                f"bad input shape {re.shape} (want ({rows_in}, {m}))"
            )
        if meta.in_size:
            # Zero-pad the cropped rows into the covering j1 window
            # (stage-1 pruning; the XLA path does the same,
            # ops/fft.py).
            shape = (n1i * n2, m)
            re = jnp.zeros(shape, re.dtype).at[
                meta.pad_lo : meta.pad_lo + meta.in_size
            ].set(re)
            im = jnp.zeros(shape, im.dtype).at[
                meta.pad_lo : meta.pad_lo + meta.in_size
            ].set(im)
        num_mb = m // mb
    grid = (num_mb, meta.qb, meta.nc)

    # NOTE on input DMA: each (n1, C, MB) block gathers n1*C strided
    # 512-byte rows and the block fetch runs at ~54 GB/s (the
    # DMA-only ablation is 35 of the 45 ms pass at 15360^2,
    # scripts/fft_ablation_probe.py). An explicit XLA pre-tiling
    # transpose into contiguous blocks was measured SLOWER overall
    # (57 ms: the 5-D transpose pass costs more than the strided DMA
    # saves); ``tiled=True`` instead takes input restructured by the
    # PALLAS :func:`pretile_first_axis` kernel (large DMAs on both
    # sides) and fetches contiguous tiles here.
    if tiled:
        re3, im3 = re, im
    else:
        re3 = re.reshape(n1i, n2, m)
        im3 = im.reshape(n1i, n2, m)

    if tiled:
        data_specs = [
            pl.BlockSpec(
                (1, 1, n1i, c, mb),
                lambda bm, qb, ci: (ci, bm, 0, 0, 0),
            ),
            pl.BlockSpec(
                (1, 1, n1i, c, mb),
                lambda bm, qb, ci: (ci, bm, 0, 0, 0),
            ),
        ]
    else:
        data_specs = [
            pl.BlockSpec((n1i, c, mb), lambda bm, qb, ci: (0, ci, bm)),
            pl.BlockSpec((n1i, c, mb), lambda bm, qb, ci: (0, ci, bm)),
        ]
    in_specs = data_specs + [
        pl.BlockSpec((2 * n1, 2 * n1i), lambda bm, qb, ci: (0, 0)),
        pl.BlockSpec((2 * n1, 2 * n1i), lambda bm, qb, ci: (0, 0)),
        pl.BlockSpec((1, n1, c, 1), lambda bm, qb, ci: (ci, 0, 0, 0)),
        pl.BlockSpec((1, n1, c, 1), lambda bm, qb, ci: (ci, 0, 0, 0)),
        pl.BlockSpec(
            (1, 1, 2 * qs, 2 * c), lambda bm, qb, ci: (qb, ci, 0, 0)
        ),
        pl.BlockSpec(
            (1, 1, 2 * qs, 2 * c), lambda bm, qb, ci: (qb, ci, 0, 0)
        ),
    ]
    out_specs = [
        pl.BlockSpec((qs * n1, mb), lambda bm, qb, ci: (qb, bm)),
        pl.BlockSpec((qs * n1, mb), lambda bm, qb, ci: (qb, bm)),
    ]
    rows = meta.n_rows_padded
    out_shape = [
        jax.ShapeDtypeStruct((rows, m), jnp.float32),
        jax.ShapeDtypeStruct((rows, m), jnp.float32),
    ]

    outr, outi = pl.pallas_call(
        partial(
            _kernel, n1=n1, n1i=n1i, c=c, qs=qs, mb=mb, tiled=tiled
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        re3,
        im3,
        f[f"{prefix}_m1_hi"],
        f[f"{prefix}_m1_lo"],
        f[f"{prefix}_twc"],
        f[f"{prefix}_tws"],
        f[f"{prefix}_m2_hi"],
        f[f"{prefix}_m2_lo"],
    )
    t0 = meta.trim0
    return (
        outr[t0 : t0 + meta.size],
        outi[t0 : t0 + meta.size],
    )


def fft2_to_image_fused(
    f: dict,
    grid_re,
    grid_im,
    *,
    meta: FusedPassMeta,
    prefix: str,
    interpret: bool = False,
):
    """
    Centred inverse 2-D DFT of the (N, N) uv grid cropped to
    (npix, npix), as two fused first-axis passes with an explicit
    transpose between them (fft2 = (F (F G)^T)^T with symmetric
    square factors). Matches ops.gridder._fft2_to_image.
    """
    a_re, a_im = fft_first_axis_fused(
        grid_re, grid_im, f, meta=meta, prefix=prefix, interpret=interpret
    )
    b_re, b_im = fft_first_axis_fused(
        a_re.T, a_im.T, f, meta=meta, prefix=prefix, interpret=interpret
    )
    return b_re.T, b_im.T


def fft2_from_image_fused(
    f: dict,
    img_re,
    img_im,
    *,
    meta: FusedPassMeta,
    prefix: str,
    interpret: bool = False,
):
    """
    Centred forward 2-D DFT of an (npix, npix) image zero-padded to
    the (N, N) grid, as two in-cropped fused first-axis passes
    (adjoint of :func:`fft2_to_image_fused`; matches
    ops.gridder._fft2_from_image). ``meta`` must be built with
    ``in_crop`` and sign=-1 factors.
    """
    a_re, a_im = fft_first_axis_fused(
        img_re, img_im, f, meta=meta, prefix=prefix, interpret=interpret
    )
    b_re, b_im = fft_first_axis_fused(
        a_re.T, a_im.T, f, meta=meta, prefix=prefix, interpret=interpret
    )
    return b_re.T, b_im.T
