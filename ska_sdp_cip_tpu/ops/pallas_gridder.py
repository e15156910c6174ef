"""
Pallas TPU gridding kernel.

The XLA gridder (ops/gridder.py) threads the full padded uv grid
through a scan as a carry; XLA's handling of that carry (copies around
control flow) caps throughput. This kernel takes explicit control:

* the plane's uv grid lives in HBM (aliased in/out operand);
* each sequential grid step processes one visibility block: its packed
  per-visibility data is DMA'd HBM -> VMEM double-buffered, kernel
  matrices are built on the VPU, and the patch contribution is one
  (P, B) x (P, B)^T MXU contraction accumulated into a VMEM patch;
* blocks are sorted by uv tile (the plan guarantees each (plane, tile)
  is one contiguous visit), so the patch is flushed to HBM with a
  read-modify-write DMA only when the tile changes — dense central
  tiles amortize one 2x64KB flush over many blocks.

Data layouts are lane-major: per-visibility columns are stored
(8, num_vis) so HBM slices are (8, B) with the sliced axis a multiple
of the 128-lane tile (Mosaic requires slice shapes aligned to the
tiling). Scalar block metadata rides in SMEM via
PrefetchScalarGridSpec. Accuracy is identical to the XLA path (same
kernel math, f32); tests assert elementwise agreement in interpret
mode.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .kernels import es_kernel_jnp
from .plan import GridderPlan

#: Packed per-visibility rows: fx, fy, ws, x0 (bitcast), y0 (bitcast)
PACK_COLS = 8


def pack_plan_columns(plan: GridderPlan) -> np.ndarray:
    """(8, num_vis) f32 packed per-visibility plan data (one DMA/block)."""
    num = plan.num_vis
    packed = np.zeros((PACK_COLS, num), np.float32)
    packed[0] = plan.fx
    packed[1] = plan.fy
    packed[2] = plan.ws
    packed[3] = plan.x0.view(np.float32)
    packed[4] = plan.y0.view(np.float32)
    return packed


def _dot3_bf16(lhs, rhs, contract):
    """
    f32-accurate contraction from three native bf16 MXU passes
    (a_hi*b_hi + a_hi*b_lo + a_lo*b_hi): Mosaic supports neither
    HIGH nor HIGHEST dot precision in-kernel, and single-pass bf16
    (2^-8 products) misses the gridder's 1e-4..1e-5 accuracy contract.
    """
    lhs_hi = lhs.astype(jnp.bfloat16)
    rhs_hi = rhs.astype(jnp.bfloat16)
    lhs_lo = (lhs - lhs_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    rhs_lo = (rhs - rhs_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    def dot(a, b):
        return lax.dot_general(
            a, b, contract, preferred_element_type=jnp.float32
        )

    return dot(lhs_hi, rhs_hi) + dot(lhs_hi, rhs_lo) + dot(lhs_lo, rhs_hi)


def _grid_plane_kernel_factory(plan: GridderPlan):
    PX, PY = plan.patch_x, plan.patch_y
    B, W = plan.block, plan.support
    beta = plan.beta
    inv_whalf = 2.0 / (W * plan.dw)
    wstacking = plan.wstacking

    def kernel(
        # scalar prefetch
        active_row,
        block_start,
        block_len,
        block_ox,
        block_oy,
        active_count,
        # inputs
        packed_hbm,
        vis_hbm,
        wp_ref,
        alloc_re_in,
        alloc_im_in,
        # outputs (aliased to alloc inputs)
        alloc_re,
        alloc_im,
        # scratch
        pack_buf,
        vis_buf,
        patch_re,
        patch_im,
        tmp_re,
        tmp_im,
        prev,
        dma_sems,
        flush_sems,
    ):
        i = pl.program_id(0)
        n = pl.num_programs(0)
        count = active_count[0]

        def block_meta(slot):
            b = jnp.maximum(active_row[jnp.minimum(slot, n - 1)], 0)
            # Alignment facts for Mosaic: slots are block-aligned
            # (start == b * B), patch origins are tile-aligned
            # (tile_x multiple of 8, tile_y multiple of 128).
            start = pl.multiple_of(b * B, B)
            ox = pl.multiple_of(block_ox[b], 8)
            oy = pl.multiple_of(block_oy[b], 128)
            return start, block_len[b], ox, oy

        def vis_dma(slot, buf):
            s, _, _, _ = block_meta(slot)
            return (
                pltpu.make_async_copy(
                    packed_hbm.at[:, pl.ds(s, B)],
                    pack_buf.at[buf],
                    dma_sems.at[buf, 0],
                ),
                pltpu.make_async_copy(
                    vis_hbm.at[:, pl.ds(s, B)],
                    vis_buf.at[buf],
                    dma_sems.at[buf, 1],
                ),
            )

        s_i, len_i, ox_i, oy_i = block_meta(i)

        @pl.when(i == 0)
        def _():
            @pl.when(count > 0)
            def _():
                for dma in vis_dma(0, 0):
                    dma.start()

            patch_re[:] = jnp.zeros((PX, PY), jnp.float32)
            patch_im[:] = jnp.zeros((PX, PY), jnp.float32)
            prev[0] = ox_i
            prev[1] = oy_i

        # Inactive tail steps (i >= count) skip their DMAs entirely.
        @pl.when(i + 1 < count)
        def _():
            for dma in vis_dma(i + 1, (i + 1) % 2):
                dma.start()

        # Flush the accumulated patch when the tile changes
        changed = jnp.logical_or(ox_i != prev[0], oy_i != prev[1])

        def flush(ox, oy):
            # Re-state alignment facts (origins may come back from the
            # SMEM carry, where Mosaic loses track of divisibility).
            ox = pl.multiple_of(ox, 8)
            oy = pl.multiple_of(oy, 128)
            read_re = pltpu.make_async_copy(
                alloc_re.at[pl.ds(ox, PX), pl.ds(oy, PY)],
                tmp_re,
                flush_sems.at[0],
            )
            read_im = pltpu.make_async_copy(
                alloc_im.at[pl.ds(ox, PX), pl.ds(oy, PY)],
                tmp_im,
                flush_sems.at[1],
            )
            read_re.start()
            read_im.start()
            read_re.wait()
            read_im.wait()
            tmp_re[:] = tmp_re[:] + patch_re[:]
            tmp_im[:] = tmp_im[:] + patch_im[:]
            write_re = pltpu.make_async_copy(
                tmp_re,
                alloc_re.at[pl.ds(ox, PX), pl.ds(oy, PY)],
                flush_sems.at[0],
            )
            write_im = pltpu.make_async_copy(
                tmp_im,
                alloc_im.at[pl.ds(ox, PX), pl.ds(oy, PY)],
                flush_sems.at[1],
            )
            write_re.start()
            write_im.start()
            write_re.wait()
            write_im.wait()
            patch_re[:] = jnp.zeros((PX, PY), jnp.float32)
            patch_im[:] = jnp.zeros((PX, PY), jnp.float32)

        @pl.when(jnp.logical_and(i > 0, changed))
        def _():
            flush(prev[0], prev[1])
            prev[0] = ox_i
            prev[1] = oy_i

        @pl.when(i < count)
        def _():
            for dma in vis_dma(i, i % 2):
                dma.wait()

        @pl.when(i < count)
        def _():
            buf = i % 2
            data = pack_buf[buf]  # (PACK_COLS, B)
            fx = data[0:1, :]
            fy = data[1:2, :]
            ws = data[2:3, :]
            x0 = lax.bitcast_convert_type(data[3:4, :], jnp.int32)
            y0 = lax.bitcast_convert_type(data[4:5, :], jnp.int32)
            vre = vis_buf[buf][0:1, :]
            vim = vis_buf[buf][1:2, :]

            iota_x = lax.broadcasted_iota(jnp.int32, (PX, B), 0)
            iota_y = lax.broadcasted_iota(jnp.int32, (PY, B), 0)
            rx = iota_x - (x0 - ox_i)
            ry = iota_y - (y0 - oy_i)
            inv_half = jnp.float32(2.0 / W)
            ax = es_kernel_jnp(
                (rx.astype(jnp.float32) - fx) * inv_half, beta
            )
            ay = es_kernel_jnp(
                (ry.astype(jnp.float32) - fy) * inv_half, beta
            )

            lane = lax.broadcasted_iota(jnp.int32, (1, B), 1) < len_i
            if wstacking:
                kw = es_kernel_jnp(
                    (wp_ref[0, 0] - ws) * inv_whalf, beta
                )
            else:
                kw = jnp.ones_like(ws)
            amp = jnp.where(lane, kw, 0.0)

            # patch[p, q] += sum_b ax[p, b] * val[b] * ay[q, b]
            contract = (((1,), (1,)), ((), ()))
            patch_re[:] = patch_re[:] + _dot3_bf16(
                ax * (vre * amp), ay, contract
            )
            patch_im[:] = patch_im[:] + _dot3_bf16(
                ax * (vim * amp), ay, contract
            )

        @pl.when(i == n - 1)
        def _():
            flush(ox_i, oy_i)

    return kernel


def _degrid_plane_kernel_factory(plan: GridderPlan):
    PX, PY = plan.patch_x, plan.patch_y
    B, W = plan.block, plan.support
    beta = plan.beta
    inv_whalf = 2.0 / (W * plan.dw)
    wstacking = plan.wstacking

    def kernel(
        # scalar prefetch
        active_row,
        block_start,
        block_len,
        block_ox,
        block_oy,
        active_count,
        # inputs
        packed_hbm,
        wp_ref,
        alloc_re_hbm,
        alloc_im_hbm,
        out_in,
        # outputs (out aliased)
        out_hbm,  # (2, num_vis) per-plane contributions
        # scratch
        pack_buf,
        patch_re,
        patch_im,
        con_buf,
        prev,
        dma_sems,
        patch_sems,
        out_sems,
    ):
        i = pl.program_id(0)
        n = pl.num_programs(0)
        count = active_count[0]

        def block_meta(slot):
            b = jnp.maximum(active_row[jnp.minimum(slot, n - 1)], 0)
            start = pl.multiple_of(b * B, B)
            ox = pl.multiple_of(block_ox[b], 8)
            oy = pl.multiple_of(block_oy[b], 128)
            return start, block_len[b], ox, oy

        def pack_dma(slot, buf):
            s, _, _, _ = block_meta(slot)
            return pltpu.make_async_copy(
                packed_hbm.at[:, pl.ds(s, B)],
                pack_buf.at[buf],
                dma_sems.at[buf],
            )

        def load_patch(ox, oy):
            ox = pl.multiple_of(ox, 8)
            oy = pl.multiple_of(oy, 128)
            read_re = pltpu.make_async_copy(
                alloc_re_hbm.at[pl.ds(ox, PX), pl.ds(oy, PY)],
                patch_re,
                patch_sems.at[0],
            )
            read_im = pltpu.make_async_copy(
                alloc_im_hbm.at[pl.ds(ox, PX), pl.ds(oy, PY)],
                patch_im,
                patch_sems.at[1],
            )
            read_re.start()
            read_im.start()
            read_re.wait()
            read_im.wait()

        s_i, len_i, ox_i, oy_i = block_meta(i)

        @pl.when(i == 0)
        def _():
            @pl.when(count > 0)
            def _():
                pack_dma(0, 0).start()
                load_patch(ox_i, oy_i)

            prev[0] = ox_i
            prev[1] = oy_i

        # Inactive tail steps (i >= count) skip their DMAs entirely.
        @pl.when(i + 1 < count)
        def _():
            pack_dma(i + 1, (i + 1) % 2).start()

        changed = jnp.logical_or(ox_i != prev[0], oy_i != prev[1])

        @pl.when(jnp.logical_and(jnp.logical_and(i > 0, changed), i < count))
        def _():
            load_patch(ox_i, oy_i)
            prev[0] = ox_i
            prev[1] = oy_i

        @pl.when(i < count)
        def _():
            pack_dma(i, i % 2).wait()

        # Wait for the step-(i-2) contribution write before reusing its
        # half of the double buffer (only if that step actually wrote).
        @pl.when(jnp.logical_and(i >= 2, (i - 2) < count))
        def _():
            prev_s, _, _, _ = block_meta(i - 2)
            pltpu.make_async_copy(
                con_buf.at[i % 2],
                out_hbm.at[:, pl.ds(prev_s, B)],
                out_sems.at[i % 2],
            ).wait()

        @pl.when(i < count)
        def _():
            buf = i % 2
            data = pack_buf[buf]
            fx = data[0:1, :]
            fy = data[1:2, :]
            ws = data[2:3, :]
            x0 = lax.bitcast_convert_type(data[3:4, :], jnp.int32)
            y0 = lax.bitcast_convert_type(data[4:5, :], jnp.int32)

            iota_x = lax.broadcasted_iota(jnp.int32, (PX, B), 0)
            iota_y = lax.broadcasted_iota(jnp.int32, (PY, B), 0)
            rx = iota_x - (x0 - ox_i)
            ry = iota_y - (y0 - oy_i)
            inv_half = jnp.float32(2.0 / W)
            ax = es_kernel_jnp(
                (rx.astype(jnp.float32) - fx) * inv_half, beta
            )
            ay = es_kernel_jnp(
                (ry.astype(jnp.float32) - fy) * inv_half, beta
            )

            lane = lax.broadcasted_iota(jnp.int32, (1, B), 1) < len_i
            if wstacking:
                kw = es_kernel_jnp(
                    (wp_ref[0, 0] - ws) * inv_whalf, beta
                )
            else:
                kw = jnp.ones_like(ws)
            amp = jnp.where(lane, kw, 0.0)

            # con[b] = sum_pq patch[p, q] ax[p, b] ay[q, b]
            #        = sum_q ay[q, b] * (patch^T @ ax)[q, b]
            contract0 = (((0,), (0,)), ((), ()))
            t_re = _dot3_bf16(patch_re[:], ax, contract0)  # (PY, B)
            t_im = _dot3_bf16(patch_im[:], ax, contract0)
            con_re = jnp.sum(t_re * ay, axis=0, keepdims=True) * amp
            con_im = jnp.sum(t_im * ay, axis=0, keepdims=True) * amp
            con_buf[buf, 0:1, :] = con_re
            con_buf[buf, 1:2, :] = con_im
            pltpu.make_async_copy(
                con_buf.at[buf],
                out_hbm.at[:, pl.ds(s_i, B)],
                out_sems.at[buf],
            ).start()

        @pl.when(i == n - 1)
        def _():
            # Drain outstanding contribution writes
            @pl.when(i < count)
            def _():
                pltpu.make_async_copy(
                    con_buf.at[i % 2],
                    out_hbm.at[:, pl.ds(s_i, B)],
                    out_sems.at[i % 2],
                ).wait()

            @pl.when(jnp.logical_and(i >= 1, (i - 1) < count))
            def _():
                prev_s, _, _, _ = block_meta(i - 1)
                pltpu.make_async_copy(
                    con_buf.at[(i - 1) % 2],
                    out_hbm.at[:, pl.ds(prev_s, B)],
                    out_sems.at[(i - 1) % 2],
                ).wait()

    return kernel


def build_degrid_planes_pallas(
    plan: GridderPlan, *, interpret: bool = False
):
    """
    Returns ``degrid_plane(active_row, block_start, block_len,
    block_ox, block_oy, active_count, packed, alloc_re, alloc_im, w_p)
    -> (2, num_vis)``: per-plane visibility contributions read off a
    (already FFT'd and unfolded) uv grid. The caller accumulates
    across planes.
    """
    B = plan.block
    num_vis = plan.num_vis
    num_steps = max(plan.active_table.shape[1], 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(num_steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # packed
            pl.BlockSpec(memory_space=pltpu.SMEM),  # w_p
            pl.BlockSpec(memory_space=pltpu.ANY),  # alloc_re
            pl.BlockSpec(memory_space=pltpu.ANY),  # alloc_im
            pl.BlockSpec(memory_space=pltpu.ANY),  # out zeros
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, PACK_COLS, plan.block), jnp.float32),
            pltpu.VMEM((plan.patch_x, plan.patch_y), jnp.float32),
            pltpu.VMEM((plan.patch_x, plan.patch_y), jnp.float32),
            pltpu.VMEM((2, 2, plan.block), jnp.float32),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    kernel = _degrid_plane_kernel_factory(plan)

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((2, num_vis), jnp.float32),
        # out zeros input (position 10 after 6 prefetch + packed, w_p,
        # alloc_re, alloc_im) aliases the output
        input_output_aliases={10: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )

    def degrid_plane(
        active_row,
        block_start,
        block_len,
        block_ox,
        block_oy,
        active_count,
        packed,
        alloc_re,
        alloc_im,
        w_p,
    ):
        zeros = jnp.zeros((2, num_vis), jnp.float32)
        return call(
            active_row,
            block_start,
            block_len,
            block_ox,
            block_oy,
            active_count,
            packed,
            w_p.reshape(1, 1),
            alloc_re,
            alloc_im,
            zeros,
        )

    return degrid_plane


def build_grid_planes_pallas(plan: GridderPlan, *, interpret: bool = False):
    """
    Returns ``grid_plane(active_row, block_start, block_len, block_ox,
    block_oy, active_count, packed, vis_split, w_p) -> (alloc_re,
    alloc_im)``: grid one w-plane's blocks onto a zeroed padded uv grid.
    """
    PX, PY, B = plan.patch_x, plan.patch_y, plan.block
    num_steps = max(plan.active_table.shape[1], 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(num_steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # packed (8, V)
            pl.BlockSpec(memory_space=pltpu.ANY),  # vis (2, V)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # w_p (1, 1)
            pl.BlockSpec(memory_space=pltpu.ANY),  # alloc_re_in
            pl.BlockSpec(memory_space=pltpu.ANY),  # alloc_im_in
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, PACK_COLS, B), jnp.float32),
            pltpu.VMEM((2, 2, B), jnp.float32),
            pltpu.VMEM((PX, PY), jnp.float32),
            pltpu.VMEM((PX, PY), jnp.float32),
            pltpu.VMEM((PX, PY), jnp.float32),
            pltpu.VMEM((PX, PY), jnp.float32),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    kernel = _grid_plane_kernel_factory(plan)

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(
                (plan.nalloc_x, plan.nalloc_y), jnp.float32
            ),
            jax.ShapeDtypeStruct(
                (plan.nalloc_x, plan.nalloc_y), jnp.float32
            ),
        ],
        # alloc inputs (positions 9, 10 counting the 6 prefetch args
        # then packed, vis, w_p) alias the two outputs
        input_output_aliases={9: 0, 10: 1},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )

    def grid_plane(
        active_row,
        block_start,
        block_len,
        block_ox,
        block_oy,
        active_count,
        packed,
        vis_split,
        w_p,
    ):
        zeros = jnp.zeros((plan.nalloc_x, plan.nalloc_y), jnp.float32)
        return call(
            active_row,
            block_start,
            block_len,
            block_ox,
            block_oy,
            active_count,
            packed,
            vis_split,
            w_p.reshape(1, 1),
            zeros,
            zeros,
        )

    return grid_plane
