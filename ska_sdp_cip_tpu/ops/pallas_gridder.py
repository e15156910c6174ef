"""
Pallas TPU gridding kernels (strip-resident, write-once).

Round-1's kernel accumulated each visibility block into a VMEM patch
and flushed it to the HBM uv-plane with a read-modify-write DMA on
every (tile, plane) visit — ~7 GB of HBM round trips per invert on the
bench workload, comparable to the MXU time itself. This version keeps
a *strip* of the plane resident in VMEM instead and writes every grid
row exactly once:

* the plan orders each plane's blocks by x-strip (strip s = tile
  column s, rows ``[s*tile_x, s*tile_x + patch_x)``), with an explicit
  sentinel step after each strip;
* block steps DMA their packed data HBM -> VMEM (double-buffered) and
  accumulate one ``(patch_x, B) x (patch_y, B)^T`` MXU contraction
  directly into the resident strip at the block's lane origin — the
  row origin is always 0 because a strip is exactly one tile column;
* a sentinel writes the strip's ``tile_x`` owned rows to HBM
  (write-only — no read-modify-write), rolls the ``patch_x - tile_x``
  carry rows into the second strip buffer, and zeroes the rest. The
  carry is tiny (8 rows for support 6) because patches only overhang
  one tile column by ``patch_x - tile_x`` rows.

Blocks are (tile, w-bin)-pure and the plan's floor binning gives each
block a window of exactly ``support`` planes, so the per-plane step
programs contain no wasted block visits. All step scheduling (DMA
prefetch targets, buffer parities, drain bookkeeping) is precomputed
on the host into the plan's step tables (ops/plan.py:build_step_tables)
and read from SMEM — the kernel itself is branch-light straight-line
code.

Data layouts are lane-major: per-visibility columns are stored
(8, num_vis) so HBM slices are (8, B) with the sliced axis a multiple
of the 128-lane tile. Accuracy is identical to the XLA path (same
kernel math, f32 with bf16x3 contractions); tests assert elementwise
agreement in interpret mode.

This replaces the C++ ducc0 wgridder's gridding loop
(reference: src/ska_sdp_cip/invert.py:170-183).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.hostmem import alloc_populated
from .kernels import es_kernel_jnp
from .plan import (
    NUM_IN_BUFFERS,
    NUM_OUT_BUFFERS,
    NUM_OUT_BUFFERS_GROUP,
    PAIR_FLAG_SHIFT,
    PREFETCH_DEPTH,
    STEP_WIDTHS,
    GridderPlan,
)

#: Kernel DMA rows: xpos, ypos, ws, block_len (broadcast), split
#: visibilities (re, im), 2 alignment-pad rows — an (8, B) slice is a
#: whole f32 sublane tile, so each block needs ONE aligned input DMA.
#: Only the first PACK_REAL rows are staged from the host; the drivers
#: assemble the (8, V) layout on device per call.
PACK_COLS = 8
PACK_REAL = 4


def pack_plan_columns(plan: GridderPlan) -> np.ndarray:
    """
    (4, num_vis) f32 packed per-visibility plan data. Positions are
    stored patch-relative (coordinate minus the block's patch origin)
    so kernel arguments keep full float32 precision on arbitrarily
    large grids; the block length rides along as a broadcast row so
    the kernel's lane mask needs no SMEM lookup.
    """
    num = plan.num_vis
    slot_block = np.arange(num) // plan.block
    # Pre-faulted zeros: a 200 MB np.zeros pays erratic single-thread
    # page faults on lazily-backed VM memory (utils/hostmem.py).
    packed = alloc_populated(PACK_REAL * num, np.float32).reshape(
        PACK_REAL, num
    )
    packed[0] = (
        plan.x0 - plan.block_ox[slot_block]
    ).astype(np.float32) + plan.fx
    packed[1] = (
        plan.y0 - plan.block_oy[slot_block]
    ).astype(np.float32) + plan.fy
    packed[2] = plan.ws
    packed[3] = plan.block_len[slot_block].astype(np.float32)
    return packed


def _dot3_pair_m(lhs_a, lhs_b, rhs, m):
    """
    Two f32-accurate (m, B) x (B, n) contractions against a SHARED
    right operand, with the bf16x3 precision passes stacked along the
    M axis: one (4m, B) dot against rhs_hi plus one (2m, B) dot
    against rhs_lo. Six independent 128-row dots would serialize on a
    single MXU tile each; the stacked forms present 4 and 2 M-tiles
    per instruction for the MXU array to fill. Contraction is over
    the LAST axis of both operands.
    """
    contract = (((1,), (1,)), ((), ()))
    a_hi = lhs_a.astype(jnp.bfloat16)
    b_hi = lhs_b.astype(jnp.bfloat16)
    a_lo = (lhs_a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_lo = (lhs_b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    r_hi = rhs.astype(jnp.bfloat16)
    r_lo = (rhs - r_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    big = lax.dot_general(
        jnp.concatenate([a_hi, a_lo, b_hi, b_lo], axis=0),
        r_hi,
        contract,
        preferred_element_type=jnp.float32,
    )
    cross = lax.dot_general(
        jnp.concatenate([a_hi, b_hi], axis=0),
        r_lo,
        contract,
        preferred_element_type=jnp.float32,
    )
    out_a = big[0:m] + big[m : 2 * m] + cross[0:m]
    out_b = big[2 * m : 3 * m] + big[3 * m : 4 * m] + cross[m : 2 * m]
    return out_a, out_b


def _dot3_multi_m(lhs, rhs, m):
    """
    N f32-accurate (m, B) x (B, n) contractions against a SHARED right
    operand (the plane-group kernels' re/im x plane forms), bf16x3
    passes stacked along M: one (2N m, B) dot against rhs_hi plus one
    (N m, B) dot against rhs_lo. Contraction is over the LAST axis of
    both operands. Same arithmetic per output as :func:`_dot3_pair_m`.
    """
    n = len(lhs)
    contract = (((1,), (1,)), ((), ()))
    his = [x.astype(jnp.bfloat16) for x in lhs]
    los = [
        (x - h.astype(jnp.float32)).astype(jnp.bfloat16)
        for x, h in zip(lhs, his)
    ]
    r_hi = rhs.astype(jnp.bfloat16)
    r_lo = (rhs - r_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    big = lax.dot_general(
        jnp.concatenate(his + los, axis=0),
        r_hi,
        contract,
        preferred_element_type=jnp.float32,
    )
    cross = lax.dot_general(
        jnp.concatenate(his, axis=0),
        r_lo,
        contract,
        preferred_element_type=jnp.float32,
    )
    return [
        big[i * m : (i + 1) * m]
        + big[(n + i) * m : (n + i + 1) * m]
        + cross[i * m : (i + 1) * m]
        for i in range(n)
    ]


def _dot3_multi_mk(lhs, rhs, m):
    """
    N f32-accurate (m, K) x (K, n) contractions against a SHARED right
    operand — the degrid direction with the contraction over the
    STRIP-LANE axis (K = patch_y = 128) instead of the patch-row axis
    (K = patch_x = 48): the 128-deep MXU systolic array runs fully
    filled instead of at 48/128 occupancy for identical MAC counts
    (measured 68.5 -> ~53 ms on the 5.8M-vis degrid). bf16x3 passes
    stacked along the lhs row axis; lhs axis 1 contracts with rhs
    axis 0.
    """
    n = len(lhs)
    contract = (((1,), (0,)), ((), ()))
    his = [x.astype(jnp.bfloat16) for x in lhs]
    los = [
        (x - h.astype(jnp.float32)).astype(jnp.bfloat16)
        for x, h in zip(lhs, his)
    ]
    r_hi = rhs.astype(jnp.bfloat16)
    r_lo = (rhs - r_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    big = lax.dot_general(
        jnp.concatenate(his + los, axis=0),
        r_hi,
        contract,
        preferred_element_type=jnp.float32,
    )
    cross = lax.dot_general(
        jnp.concatenate(his, axis=0),
        r_lo,
        contract,
        preferred_element_type=jnp.float32,
    )
    return [
        big[i * m : (i + 1) * m]
        + big[(n + i) * m : (n + i + 1) * m]
        + cross[i * m : (i + 1) * m]
        for i in range(n)
    ]


def _decode_step(step_val, step_aux, j):
    """
    Shared step decode (encoding: ops/plan.py:build_step_tables):
    (value, prefetch block, strip buffer, input parity, out parity).
    """
    v = step_val[j]
    aux = step_aux[j]
    pref = (aux >> 8) - 1
    out_par = (aux >> 4) & 15
    sbuf = (aux >> 3) & 1
    par = aux & 7
    return v, pref, sbuf, par, out_par


def _kernel_factors(plan: GridderPlan, pack, wp_ref, wstacking):
    """VPU build of the separable kernel matrices for one block."""
    PX, PY, B, W = plan.patch_x, plan.patch_y, plan.block, plan.support
    xpos = pack[0:1, :]
    ypos = pack[1:2, :]
    ws = pack[2:3, :]
    lenf = pack[3:4, :]
    inv_half = jnp.float32(2.0 / W)
    iota_x = lax.broadcasted_iota(jnp.int32, (PX, B), 0).astype(
        jnp.float32
    )
    iota_y = lax.broadcasted_iota(jnp.int32, (PY, B), 0).astype(
        jnp.float32
    )
    ax = es_kernel_jnp((iota_x - xpos) * inv_half, plan.beta)
    ay = es_kernel_jnp((iota_y - ypos) * inv_half, plan.beta)
    lane = (
        lax.broadcasted_iota(jnp.int32, (1, B), 1).astype(jnp.float32)
        < lenf
    )
    if wstacking:
        inv_whalf = 2.0 / (W * plan.dw)
        kw = es_kernel_jnp((wp_ref[0, 0] - ws) * inv_whalf, plan.beta)
    else:
        kw = jnp.ones_like(ws)
    amp = jnp.where(lane, kw, 0.0)
    return ax, ay, amp


def _kernel_factors_group(plan: GridderPlan, pack, wp_ref):
    """
    VPU build of the separable kernel matrices for one block visiting
    a PLANE GROUP: shared ax/ay plus per-plane amplitudes. The G w
    factors are evaluated in one (G, Bw) transcendental pass. Group
    plans exist only when w-stacking is on. ``pack`` may be the
    MULTI-width (8, 2B) or (8, 4B) slice of a packed step (two or
    four same-tile blocks side by side): positions are patch-relative
    to the shared origin and the lane mask folds the per-block lane
    index, so all factor math is width-agnostic.
    """
    G = plan.plane_group
    PX, PY, B, W = plan.patch_x, plan.patch_y, plan.block, plan.support
    Bw = pack.shape[1]
    xpos = pack[0:1, :]
    ypos = pack[1:2, :]
    ws = pack[2:3, :]
    lenf = pack[3:4, :]
    inv_half = jnp.float32(2.0 / W)
    iota_x = lax.broadcasted_iota(jnp.int32, (PX, Bw), 0).astype(
        jnp.float32
    )
    iota_y = lax.broadcasted_iota(jnp.int32, (PY, Bw), 0).astype(
        jnp.float32
    )
    ax = es_kernel_jnp((iota_x - xpos) * inv_half, plan.beta)
    ay = es_kernel_jnp((iota_y - ypos) * inv_half, plan.beta)
    lane_i = lax.broadcasted_iota(jnp.int32, (1, Bw), 1)
    if Bw > B:
        # Per-block lane index for the length mask of multi-block
        # (pair/quad) steps.
        lane_i = lane_i - B * (lane_i // B)
    lane = lane_i.astype(jnp.float32) < lenf
    inv_whalf = jnp.float32(2.0 / (W * plan.dw))
    z = (
        jnp.concatenate(
            [wp_ref[0, i] - ws for i in range(G)], axis=0
        )
        * inv_whalf
    )
    kw = es_kernel_jnp(z, plan.beta)
    amp = jnp.where(lane, kw, 0.0)
    return ax, ay, [amp[i : i + 1, :] for i in range(G)]


def _grid_strip_group_kernel_factory(plan: GridderPlan):
    """Plane-group variant of :func:`_grid_strip_kernel_factory`: G
    adjacent w-planes' strips stay resident and every block visit
    grids onto all of them, dividing block-steps by ~G and sharing
    one ES build across the group. Step tables are packed-width
    (ops/plan.py:build_step_tables, STEP_WIDTHS): a step may cover 2
    or 4 same-tile id-consecutive blocks fetched by one wide DMA and
    gridded by one wide-K contraction — dividing per-step scalar
    overhead on dense workloads."""
    G = plan.plane_group
    PX, PY = plan.patch_x, plan.patch_y
    B = plan.block
    SX = plan.tile_x
    CARRY = PX - SX
    NS = plan.num_strips
    NY = plan.seg_width
    BMASK = (1 << PAIR_FLAG_SHIFT) - 1

    def kernel(*refs):
        (step_val, step_aux, first_blk, blk_oy, count, seg_base) = (
            refs[:6]
        )
        packed_hbm, wp_ref = refs[6:8]
        outs = refs[8 : 8 + 2 * G]  # re_0, im_0, re_1, im_1, ...
        strip_re, strip_im, pack_buf, in_sems, out_sems = refs[
            8 + 2 * G :
        ]
        j = pl.program_id(0)
        cnt = count[0]

        def in_copy(b, par, width):
            s = pl.multiple_of(b * B, B)
            return pltpu.make_async_copy(
                packed_hbm.at[:, pl.ds(s, width * B)],
                pack_buf.at[par, :, pl.ds(0, width * B)],
                in_sems.at[par],
            )

        def start_fetch(enc, par):
            """enc = (block << 2) | width_code, >= 0."""
            blk = jnp.maximum(enc >> 2, 0)
            for code, width in enumerate(STEP_WIDTHS):

                @pl.when((enc & 3) == code)
                def _(width=width):
                    in_copy(blk, par, width).start()

        @pl.when(j == 0)
        def _():
            strip_re[0] = jnp.zeros((G, PX, NY), jnp.float32)
            strip_im[0] = jnp.zeros((G, PX, NY), jnp.float32)
            for slot in range(PREFETCH_DEPTH):
                head = first_blk[slot]

                @pl.when(head >= 0)
                def _():
                    start_fetch(jnp.maximum(head, 0), slot)

        v, pref, sbuf, par, _out_par = _decode_step(
            step_val, step_aux, j
        )
        active = j < cnt

        @pl.when(active & (pref >= 0))
        def _():
            start_fetch(
                jnp.maximum(pref, 0),
                (par + PREFETCH_DEPTH) % NUM_IN_BUFFERS,
            )

        def grid_block(b, width):
            in_copy(b, par, width).wait()
            pack = pack_buf[par, :, pl.ds(0, width * B)]
            ax, ay, amps = _kernel_factors_group(plan, pack, wp_ref)
            vre = pack[4:5, :]
            vim = pack[5:6, :]
            lhs = []
            for amp in amps:
                lhs.append(ax * (vre * amp))
                lhs.append(ax * (vim * amp))
            patches = _dot3_multi_m(lhs, ay, PX)
            oy = pl.multiple_of(blk_oy[b] - seg_base[0], 128)
            for i in range(G):
                strip_re[sbuf, i, :, pl.ds(oy, PY)] = (
                    strip_re[sbuf, i, :, pl.ds(oy, PY)]
                    + patches[2 * i]
                )
                strip_im[sbuf, i, :, pl.ds(oy, PY)] = (
                    strip_im[sbuf, i, :, pl.ds(oy, PY)]
                    + patches[2 * i + 1]
                )

        @pl.when(active & (v >= 0))
        def _():
            b = jnp.maximum(v, 0) & BMASK
            wcode = (jnp.maximum(v, 0) >> PAIR_FLAG_SHIFT) & 3
            for code, width in enumerate(STEP_WIDTHS):

                @pl.when(wcode == code)
                def _(width=width):
                    grid_block(b, width)

        @pl.when(active & (v < 0))
        def _():
            s = -1 - v
            cur = sbuf
            other = 1 - cur

            def out_copies(buf, strip_idx, rows):
                r0 = pl.multiple_of(strip_idx * SX, 8)
                copies = []
                for i in range(G):
                    copies.append(
                        pltpu.make_async_copy(
                            strip_re.at[buf, i, pl.ds(0, rows), :],
                            outs[2 * i].at[pl.ds(r0, rows), :],
                            out_sems.at[buf, 2 * i],
                        )
                    )
                    copies.append(
                        pltpu.make_async_copy(
                            strip_im.at[buf, i, pl.ds(0, rows), :],
                            outs[2 * i + 1].at[pl.ds(r0, rows), :],
                            out_sems.at[buf, 2 * i + 1],
                        )
                    )
                return copies

            # The other buffer's writes (strip s-1) must land before
            # the carry roll reuses it.
            @pl.when(s >= 1)
            def _():
                for copy in out_copies(other, s - 1, SX):
                    copy.wait()

            strip_re[other, :, 0:CARRY, :] = strip_re[cur, :, SX:PX, :]
            strip_re[other, :, CARRY:PX, :] = jnp.zeros(
                (G, PX - CARRY, NY), jnp.float32
            )
            strip_im[other, :, 0:CARRY, :] = strip_im[cur, :, SX:PX, :]
            strip_im[other, :, CARRY:PX, :] = jnp.zeros(
                (G, PX - CARRY, NY), jnp.float32
            )

            @pl.when(s < NS - 1)
            def _():
                for copy in out_copies(cur, s, SX):
                    copy.start()

            @pl.when(s == NS - 1)
            def _():
                # Final strip owns its carry rows too; drain inline.
                for copy in out_copies(cur, s, PX):
                    copy.start()
                for copy in out_copies(cur, s, PX):
                    copy.wait()

    return kernel


def _degrid_strip_group_kernel_factory(plan: GridderPlan):
    """Plane-group variant of :func:`_degrid_strip_kernel_factory`:
    each block visit reads all G resident plane strips and writes the
    SUMMED group contribution, dividing block-steps and out-DMAs by
    ~G. Step tables are packed-width (ops/plan.py:build_step_tables,
    STEP_WIDTHS): a step may cover 2 or 4 same-tile id-consecutive
    blocks with one wide input DMA, one wide contraction, and one
    wide output DMA."""
    G = plan.plane_group
    PX, PY = plan.patch_x, plan.patch_y
    B = plan.block
    SX = plan.tile_x
    NS = plan.num_strips
    BMASK = (1 << PAIR_FLAG_SHIFT) - 1
    # TIMING-ONLY ablation (WRONG outputs): CIP_ABLATE=noout skips the
    # per-step output DMA ring entirely, isolating its share of the
    # degrid step cost (see scripts/predict_ablation_probe.py).
    noout = "noout" in (
        __import__("os").environ.get("CIP_ABLATE") or ""
    ).split(",")
    if noout:
        import warnings

        warnings.warn(
            "CIP_ABLATE=noout is active: the degrid kernel built now "
            "SKIPS its output DMA and returns WRONG visibilities "
            "(timing-only ablation, baked in for this factory's "
            "lifetime)",
            stacklevel=2,
        )

    def kernel(*refs):
        (
            step_val,
            step_aux,
            step_aux2,
            first_blk,
            last_blks,
            blk_oy,
            count,
            seg_base,
        ) = refs[:8]
        packed_hbm, wp_ref = refs[8:10]
        grids_hbm = refs[10 : 10 + 2 * G]  # re_0, im_0, re_1, ...
        out_hbm = refs[11 + 2 * G]  # refs[10 + 2G] is the zeros alias
        (
            gbuf_re,
            gbuf_im,
            pack_buf,
            con_buf,
            in_sems,
            grid_sems,
            out_sems,
        ) = refs[12 + 2 * G :]
        j = pl.program_id(0)
        cnt = count[0]

        def pack_copy(b, par, width):
            s = pl.multiple_of(b * B, B)
            return pltpu.make_async_copy(
                packed_hbm.at[:, pl.ds(s, width * B)],
                pack_buf.at[par, :, pl.ds(0, width * B)],
                in_sems.at[par],
            )

        def start_fetch(enc, par):
            """enc = (block << 2) | width_code, >= 0."""
            blk = jnp.maximum(enc >> 2, 0)
            for code, width in enumerate(STEP_WIDTHS):

                @pl.when((enc & 3) == code)
                def _(width=width):
                    pack_copy(blk, par, width).start()

        def grid_copies(strip_idx, buf):
            r0 = pl.multiple_of(strip_idx * SX, 8)
            copies = []
            for i in range(G):
                copies.append(
                    pltpu.make_async_copy(
                        grids_hbm[2 * i].at[pl.ds(r0, PX), :],
                        gbuf_re.at[buf, i],
                        grid_sems.at[buf, 2 * i],
                    )
                )
                copies.append(
                    pltpu.make_async_copy(
                        grids_hbm[2 * i + 1].at[pl.ds(r0, PX), :],
                        gbuf_im.at[buf, i],
                        grid_sems.at[buf, 2 * i + 1],
                    )
                )
            return copies

        def out_copy(b, par, width):
            s = pl.multiple_of(b * B, B)
            return pltpu.make_async_copy(
                con_buf.at[par, :, pl.ds(0, width * B)],
                out_hbm.at[:, pl.ds(s, width * B)],
                out_sems.at[par],
            )

        def wait_out(enc, par):
            """enc = (block << 2) | width_code, >= 0."""
            blk = jnp.maximum(enc >> 2, 0)
            for code, width in enumerate(STEP_WIDTHS):

                @pl.when((enc & 3) == code)
                def _(width=width):
                    out_copy(blk, par, width).wait()

        @pl.when(j == 0)
        def _():
            for copy in grid_copies(0, 0):
                copy.start()
            for slot in range(PREFETCH_DEPTH):
                head = first_blk[slot]

                @pl.when(head >= 0)
                def _():
                    start_fetch(jnp.maximum(head, 0), slot)

        v, pref, sbuf, par, out_par = _decode_step(
            step_val, step_aux, j
        )
        prev2 = step_aux2[j] - 1
        active = j < cnt

        @pl.when(active & (pref >= 0))
        def _():
            start_fetch(
                jnp.maximum(pref, 0),
                (par + PREFETCH_DEPTH) % NUM_IN_BUFFERS,
            )

        @pl.when(active & (v < 0))
        def _():
            s = -1 - v
            cur = sbuf
            for copy in grid_copies(s, cur):
                copy.wait()

            @pl.when(s + 1 < NS)
            def _():
                for copy in grid_copies(s + 1, 1 - cur):
                    copy.start()

            @pl.when(s == NS - 1)
            def _():
                if not noout:
                    for slot in range(NUM_OUT_BUFFERS_GROUP):
                        enc = last_blks[slot]

                        @pl.when(enc >= 0)
                        def _():
                            wait_out(
                                jnp.maximum(enc >> 4, 0), enc & 15
                            )

        def degrid_block(b, width):
            pack_copy(b, par, width).wait()
            pack = pack_buf[par, :, pl.ds(0, width * B)]
            ax, ay, amps = _kernel_factors_group(plan, pack, wp_ref)
            oy = pl.multiple_of(blk_oy[b] - seg_base[0], 128)
            lhs = []
            for i in range(G):
                lhs.append(gbuf_re[sbuf, i, :, pl.ds(oy, PY)])
                lhs.append(gbuf_im[sbuf, i, :, pl.ds(oy, PY)])
            # Contract over the 128-lane strip axis (full MXU fill;
            # see _dot3_multi_mk), then weight-reduce the patch_x rows
            # on the VPU.
            t = _dot3_multi_mk(lhs, ay, PX)
            con_re = jnp.zeros((1, width * B), jnp.float32)
            con_im = jnp.zeros((1, width * B), jnp.float32)
            for i in range(G):
                con_re = con_re + (
                    jnp.sum(t[2 * i] * ax, axis=0, keepdims=True)
                    * amps[i]
                )
                con_im = con_im + (
                    jnp.sum(t[2 * i + 1] * ax, axis=0, keepdims=True)
                    * amps[i]
                )

            if noout:
                # Timing ablation: keep the stores (so the math is not
                # DCE'd) but skip the DMA ring entirely.
                con_buf[0, 0:1, pl.ds(0, width * B)] = con_re
                con_buf[0, 1:2, pl.ds(0, width * B)] = con_im
            else:
                @pl.when(prev2 >= 0)
                def _():
                    wait_out(jnp.maximum(prev2, 0), out_par)

                con_buf[out_par, 0:1, pl.ds(0, width * B)] = con_re
                con_buf[out_par, 1:2, pl.ds(0, width * B)] = con_im
                out_copy(b, out_par, width).start()

        @pl.when(active & (v >= 0))
        def _():
            b = jnp.maximum(v, 0) & BMASK
            wcode = (jnp.maximum(v, 0) >> PAIR_FLAG_SHIFT) & 3
            for code, width in enumerate(STEP_WIDTHS):

                @pl.when(wcode == code)
                def _(width=width):
                    degrid_block(b, width)

    return kernel


def _grid_strip_kernel_factory(plan: GridderPlan):
    PX, PY = plan.patch_x, plan.patch_y
    B = plan.block
    SX = plan.tile_x
    CARRY = PX - SX
    NS = plan.num_strips
    NY = plan.seg_width
    wstacking = plan.wstacking

    def kernel(
        # scalar prefetch
        step_val,
        step_aux,
        first_blk,
        blk_oy,
        count,
        seg_base,
        # inputs
        packed_hbm,
        wp_ref,
        # outputs
        out_re,
        out_im,
        # scratch
        strip_re,
        strip_im,
        pack_buf,
        in_sems,
        out_sems,
    ):
        j = pl.program_id(0)
        cnt = count[0]

        def in_copy(b, par):
            s = pl.multiple_of(b * B, B)
            return pltpu.make_async_copy(
                packed_hbm.at[:, pl.ds(s, B)],
                pack_buf.at[par],
                in_sems.at[par],
            )

        @pl.when(j == 0)
        def _():
            strip_re[0] = jnp.zeros((PX, NY), jnp.float32)
            strip_im[0] = jnp.zeros((PX, NY), jnp.float32)
            for slot in range(PREFETCH_DEPTH):
                head = first_blk[slot]

                @pl.when(head >= 0)
                def _():
                    in_copy(jnp.maximum(head, 0), slot).start()

        v, pref, sbuf, par, _out_par = _decode_step(
            step_val, step_aux, j
        )
        active = j < cnt

        @pl.when(active & (pref >= 0))
        def _():
            in_copy(
                jnp.maximum(pref, 0),
                (par + PREFETCH_DEPTH) % NUM_IN_BUFFERS,
            ).start()

        @pl.when(active & (v >= 0))
        def _():
            b = jnp.maximum(v, 0)
            in_copy(b, par).wait()
            ax, ay, amp = _kernel_factors(
                plan, pack_buf[par], wp_ref, wstacking
            )
            vre = pack_buf[par][4:5, :]
            vim = pack_buf[par][5:6, :]
            patch_re, patch_im = _dot3_pair_m(
                ax * (vre * amp), ax * (vim * amp), ay, PX
            )
            oy = pl.multiple_of(blk_oy[b] - seg_base[0], 128)
            strip_re[sbuf, :, pl.ds(oy, PY)] = (
                strip_re[sbuf, :, pl.ds(oy, PY)] + patch_re
            )
            strip_im[sbuf, :, pl.ds(oy, PY)] = (
                strip_im[sbuf, :, pl.ds(oy, PY)] + patch_im
            )

        @pl.when(active & (v < 0))
        def _():
            s = -1 - v
            cur = sbuf
            other = 1 - cur

            def out_copies(buf, strip_idx, rows):
                r0 = pl.multiple_of(strip_idx * SX, 8)
                return (
                    pltpu.make_async_copy(
                        strip_re.at[buf, pl.ds(0, rows), :],
                        out_re.at[pl.ds(r0, rows), :],
                        out_sems.at[buf, 0],
                    ),
                    pltpu.make_async_copy(
                        strip_im.at[buf, pl.ds(0, rows), :],
                        out_im.at[pl.ds(r0, rows), :],
                        out_sems.at[buf, 1],
                    ),
                )

            # The other buffer's write (strip s-1) must land before the
            # carry roll reuses it.
            @pl.when(s >= 1)
            def _():
                for copy in out_copies(other, s - 1, SX):
                    copy.wait()

            strip_re[other, 0:CARRY, :] = strip_re[cur, SX:PX, :]
            strip_re[other, CARRY:PX, :] = jnp.zeros(
                (PX - CARRY, NY), jnp.float32
            )
            strip_im[other, 0:CARRY, :] = strip_im[cur, SX:PX, :]
            strip_im[other, CARRY:PX, :] = jnp.zeros(
                (PX - CARRY, NY), jnp.float32
            )

            @pl.when(s < NS - 1)
            def _():
                for copy in out_copies(cur, s, SX):
                    copy.start()

            @pl.when(s == NS - 1)
            def _():
                # Final strip owns its carry rows too; drain inline.
                for copy in out_copies(cur, s, PX):
                    copy.start()
                for copy in out_copies(cur, s, PX):
                    copy.wait()

    return kernel


def _degrid_strip_kernel_factory(plan: GridderPlan):
    PX, PY = plan.patch_x, plan.patch_y
    B = plan.block
    SX = plan.tile_x
    NS = plan.num_strips
    wstacking = plan.wstacking

    def kernel(
        # scalar prefetch
        step_val,
        step_aux,
        step_aux2,
        first_blk,
        last_blks,
        blk_oy,
        count,
        seg_base,
        # inputs
        packed_hbm,
        wp_ref,
        grid_re_hbm,
        grid_im_hbm,
        out_in,
        # outputs (aliased to out_in)
        out_hbm,
        # scratch
        gbuf_re,
        gbuf_im,
        pack_buf,
        con_buf,
        in_sems,
        grid_sems,
        out_sems,
    ):
        j = pl.program_id(0)
        cnt = count[0]

        def pack_copy(b, par):
            s = pl.multiple_of(b * B, B)
            return pltpu.make_async_copy(
                packed_hbm.at[:, pl.ds(s, B)],
                pack_buf.at[par],
                in_sems.at[par],
            )  # noqa: E306

        def grid_copies(strip_idx, buf):
            r0 = pl.multiple_of(strip_idx * SX, 8)
            return (
                pltpu.make_async_copy(
                    grid_re_hbm.at[pl.ds(r0, PX), :],
                    gbuf_re.at[buf],
                    grid_sems.at[buf, 0],
                ),
                pltpu.make_async_copy(
                    grid_im_hbm.at[pl.ds(r0, PX), :],
                    gbuf_im.at[buf],
                    grid_sems.at[buf, 1],
                ),
            )

        def out_copy(b, par):
            s = pl.multiple_of(b * B, B)
            return pltpu.make_async_copy(
                con_buf.at[par],
                out_hbm.at[:, pl.ds(s, B)],
                out_sems.at[par],
            )

        @pl.when(j == 0)
        def _():
            for copy in grid_copies(0, 0):
                copy.start()
            for slot in range(PREFETCH_DEPTH):
                head = first_blk[slot]

                @pl.when(head >= 0)
                def _():
                    pack_copy(jnp.maximum(head, 0), slot).start()

        v, pref, sbuf, par, out_par = _decode_step(
            step_val, step_aux, j
        )
        prev2 = step_aux2[j] - 1
        active = j < cnt

        @pl.when(active & (pref >= 0))
        def _():
            pack_copy(
                jnp.maximum(pref, 0),
                (par + PREFETCH_DEPTH) % NUM_IN_BUFFERS,
            ).start()

        @pl.when(active & (v < 0))
        def _():
            # Sentinel opens strip s: its rows were prefetched at the
            # previous sentinel (or step 0); prefetch the next strip.
            s = -1 - v
            cur = sbuf
            for copy in grid_copies(s, cur):
                copy.wait()

            @pl.when(s + 1 < NS)
            def _():
                for copy in grid_copies(s + 1, 1 - cur):
                    copy.start()

            # Last sentinel drains the trailing contribution writes
            # (blocks last and last-1; parity rides in the encoding).
            @pl.when(s == NS - 1)
            def _():
                for slot in range(NUM_OUT_BUFFERS):
                    enc = last_blks[slot]

                    @pl.when(enc >= 0)
                    def _():
                        out_copy(
                            jnp.maximum(enc >> 4, 0), enc & 15
                        ).wait()

        @pl.when(active & (v >= 0))
        def _():
            b = jnp.maximum(v, 0)
            pack_copy(b, par).wait()
            ax, ay, amp = _kernel_factors(
                plan, pack_buf[par], wp_ref, wstacking
            )
            oy = pl.multiple_of(blk_oy[b] - seg_base[0], 128)
            patch_re = gbuf_re[sbuf, :, pl.ds(oy, PY)]
            patch_im = gbuf_im[sbuf, :, pl.ds(oy, PY)]
            # Contract over the 128-lane strip axis (full MXU fill;
            # see _dot3_multi_mk), then weight-reduce patch_x rows.
            t_re, t_im = _dot3_multi_mk(
                [patch_re, patch_im], ay, PX
            )  # (PX, B) each
            con_re = jnp.sum(t_re * ax, axis=0, keepdims=True) * amp
            con_im = jnp.sum(t_im * ax, axis=0, keepdims=True) * amp

            # Reuse of this ring slot must wait for the out-DMA of
            # the block NUM_OUT_BUFFERS steps back (same out parity).
            @pl.when(prev2 >= 0)
            def _():
                out_copy(jnp.maximum(prev2, 0), out_par).wait()

            con_buf[out_par, 0:1, :] = con_re
            con_buf[out_par, 1:2, :] = con_im
            out_copy(b, out_par).start()

    return kernel


def build_grid_planes_pallas(plan: GridderPlan, *, interpret: bool = False):
    """
    Returns ``grid_plane(step_val, step_aux, first_block, block_oy,
    count, seg_base, data, w_p) -> (alloc_re, alloc_im)``: grid one
    w-plane's blocks onto the padded uv alloc, every row written
    exactly once.
    """
    PX = plan.patch_x
    B = plan.block
    NY = plan.seg_width
    num_steps = max(plan.step_val.shape[-1], 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(num_steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # packed+vis (8, V)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # w_p (1, 1)
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, PX, NY), jnp.float32),
            pltpu.VMEM((2, PX, NY), jnp.float32),
            pltpu.VMEM((NUM_IN_BUFFERS, PACK_COLS, B), jnp.float32),
            pltpu.SemaphoreType.DMA((NUM_IN_BUFFERS,)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )

    kernel = _grid_strip_kernel_factory(plan)

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(
                (plan.nalloc_x, plan.seg_width), jnp.float32
            ),
            jax.ShapeDtypeStruct(
                (plan.nalloc_x, plan.seg_width), jnp.float32
            ),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )

    def grid_plane(
        step_val, step_aux, first_block, block_oy, count, seg_base,
        data, w_p,
    ):
        return call(
            step_val,
            step_aux,
            first_block,
            block_oy,
            count,
            seg_base,
            data,
            w_p.reshape(1, 1),
        )

    return grid_plane


def build_grid_planes_pallas_group(
    plan: GridderPlan, *, interpret: bool = False
):
    """
    Returns ``grid_group(step_val, step_aux, first_block, block_oy,
    count, seg_base, data, w_g) -> [re_0, im_0, ..., re_{G-1},
    im_{G-1}]``: grid one PLANE GROUP's blocks onto G padded uv allocs
    in one kernel pass (``w_g`` is the (G,) vector of plane w's).
    Requires a plan built with ``plane_group == G > 1`` (its step
    tables schedule groups).
    """
    G = plan.plane_group
    if G < 2:
        raise ValueError("plan was not built with plane_group > 1")
    PX = plan.patch_x
    B = plan.block
    NY = plan.seg_width
    num_steps = max(plan.step_val.shape[-1], 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(num_steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # packed+vis (8, V)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # w_g (1, G)
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY) for _ in range(2 * G)
        ],
        scratch_shapes=[
            pltpu.VMEM((2, G, PX, NY), jnp.float32),
            pltpu.VMEM((2, G, PX, NY), jnp.float32),
            # Quad-width input slots: packed steps fetch up to
            # (8, 4B) (width codes 1/2/4, ops/plan.py STEP_WIDTHS).
            pltpu.VMEM(
                (NUM_IN_BUFFERS, PACK_COLS, 4 * B), jnp.float32
            ),
            pltpu.SemaphoreType.DMA((NUM_IN_BUFFERS,)),
            pltpu.SemaphoreType.DMA((2, 2 * G)),
        ],
    )

    kernel = _grid_strip_group_kernel_factory(plan)

    alloc = jax.ShapeDtypeStruct(
        (plan.nalloc_x, plan.seg_width), jnp.float32
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[alloc] * (2 * G),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )

    def grid_group(
        step_val, step_aux, first_block, block_oy, count, seg_base,
        data, w_g,
    ):
        return call(
            step_val,
            step_aux,
            first_block,
            block_oy,
            count,
            seg_base,
            data,
            w_g.reshape(1, G),
        )

    return grid_group


def build_degrid_planes_pallas_group(
    plan: GridderPlan, *, interpret: bool = False
):
    """
    Returns ``degrid_group(step_val, step_aux, step_aux2, first_block,
    last_blocks, block_oy, count, seg_base, packed, grids, w_g)
    -> (2, num_vis)`` where ``grids`` is the [re_0, im_0, ...] list of
    G (already FFT'd and unfolded) uv allocs: the SUMMED visibility
    contributions of one plane group. The caller accumulates across
    groups.
    """
    G = plan.plane_group
    if G < 2:
        raise ValueError("plan was not built with plane_group > 1")
    PX = plan.patch_x
    B = plan.block
    NY = plan.seg_width
    num_vis = plan.num_vis
    num_steps = max(plan.step_val.shape[-1], 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=8,
        grid=(num_steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # packed
            pl.BlockSpec(memory_space=pltpu.SMEM),  # w_g
        ]
        + [
            pl.BlockSpec(memory_space=pl.ANY)  # alloc re/im per plane
            for _ in range(2 * G)
        ]
        + [
            pl.BlockSpec(memory_space=pl.ANY),  # out zeros
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, G, PX, NY), jnp.float32),
            pltpu.VMEM((2, G, PX, NY), jnp.float32),
            # Quad-width input/output slots: packed steps move up to
            # 4B (width codes 1/2/4, ops/plan.py STEP_WIDTHS).
            pltpu.VMEM(
                (NUM_IN_BUFFERS, PACK_COLS, 4 * B), jnp.float32
            ),
            pltpu.VMEM(
                (NUM_OUT_BUFFERS_GROUP, 2, 4 * B), jnp.float32
            ),
            pltpu.SemaphoreType.DMA((NUM_IN_BUFFERS,)),
            pltpu.SemaphoreType.DMA((2, 2 * G)),
            pltpu.SemaphoreType.DMA((NUM_OUT_BUFFERS_GROUP,)),
        ],
    )

    kernel = _degrid_strip_group_kernel_factory(plan)

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((2, num_vis), jnp.float32),
        # out zeros input (position 10 + 2G after 8 prefetch + packed,
        # w_g, and the 2G alloc inputs) aliases the output
        input_output_aliases={10 + 2 * G: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )

    def degrid_group(
        step_val,
        step_aux,
        step_aux2,
        first_block,
        last_blocks,
        block_oy,
        count,
        seg_base,
        packed,
        grids,
        w_g,
    ):
        zeros = jnp.zeros((2, num_vis), jnp.float32)
        return call(
            step_val,
            step_aux,
            step_aux2,
            first_block,
            last_blocks,
            block_oy,
            count,
            seg_base,
            packed,
            w_g.reshape(1, G),
            *grids,
            zeros,
        )

    return degrid_group


def build_degrid_planes_pallas(
    plan: GridderPlan, *, interpret: bool = False
):
    """
    Returns ``degrid_plane(step_val, step_aux, step_aux2, first_block,
    last_blocks, block_oy, count, packed, alloc_re, alloc_im, w_p)
    -> (2, num_vis)``: per-plane visibility contributions read off a
    (already FFT'd and unfolded) uv alloc. The caller accumulates
    across planes.
    """
    PX = plan.patch_x
    B = plan.block
    NY = plan.seg_width
    num_vis = plan.num_vis
    num_steps = max(plan.step_val.shape[-1], 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=8,
        grid=(num_steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # packed
            pl.BlockSpec(memory_space=pltpu.SMEM),  # w_p
            pl.BlockSpec(memory_space=pl.ANY),  # alloc_re
            pl.BlockSpec(memory_space=pl.ANY),  # alloc_im
            pl.BlockSpec(memory_space=pl.ANY),  # out zeros
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, PX, NY), jnp.float32),
            pltpu.VMEM((2, PX, NY), jnp.float32),
            pltpu.VMEM((NUM_IN_BUFFERS, PACK_COLS, B), jnp.float32),
            pltpu.VMEM((NUM_OUT_BUFFERS, 2, B), jnp.float32),
            pltpu.SemaphoreType.DMA((NUM_IN_BUFFERS,)),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((NUM_OUT_BUFFERS,)),
        ],
    )

    kernel = _degrid_strip_kernel_factory(plan)

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((2, num_vis), jnp.float32),
        # out zeros input (position 12 after 8 prefetch + packed, w_p,
        # alloc_re, alloc_im) aliases the output
        input_output_aliases={12: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )

    def degrid_plane(
        step_val,
        step_aux,
        step_aux2,
        first_block,
        last_blocks,
        block_oy,
        count,
        seg_base,
        packed,
        alloc_re,
        alloc_im,
        w_p,
    ):
        zeros = jnp.zeros((2, num_vis), jnp.float32)
        return call(
            step_val,
            step_aux,
            step_aux2,
            first_block,
            last_blocks,
            block_oy,
            count,
            seg_base,
            packed,
            w_p.reshape(1, 1),
            alloc_re,
            alloc_im,
            zeros,
        )

    return degrid_plane
