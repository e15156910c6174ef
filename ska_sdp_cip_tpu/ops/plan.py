"""
Gridding plan: host-side geometry and binning for the TPU wgridder.

The reference delegates all of this to the C++ ducc0 wgridder internals
(reference: src/ska_sdp_cip/invert.py:170-183). Here the setup is
explicit and produces a static-shape execution plan the jitted gridding
program consumes:

* uv geometry — padded oversampled grid, ES kernel support/beta from the
  accuracy target (epsilon);
* improved w-stacking — visibilities are flipped to w >= 0 (conjugate
  symmetry of a real dirty image), the n-1 range is centred ("w-shift")
  to halve the plane count, plane spacing ``dw`` is set by the kernel's
  no-alias band;
* scatter domain tiling — visibilities are binned to rectangular uv
  tiles whose patch origins satisfy the TPU's memory tiling: the
  sublane axis uses tile_x = patch_x - roundup(support) cells
  (origins divisible by 8; patch_x defaults to 48, see
  DEFAULT_PATCH_X), the lane axis tile_y = 128 cells (origins
  divisible by 128). Each visibility's W-cell footprint lies inside
  one static (patch_x, 128) patch.
* block-slot layout — visibilities are sorted by (tile, w-plane bin)
  and re-packed so block ``b`` occupies exactly slots
  ``[b*B, (b+1)*B)`` (zero-padded): every DMA offset in the Pallas
  kernel is statically aligned. Per-plane active-block tables give the
  program static bounds with no data-dependent shapes.

Positions are stored as integer footprint cells plus small fractional
offsets so kernel arguments keep full float32 precision on arbitrarily
large grids. This module is numpy-only (with an optional C++ engine,
see ../native.py) and runs once per (dataset shard, imaging config);
everything downstream is jit-compiled.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .kernels import (
    es_beta,
    gauss_legendre_kernel_quadrature,
    kernel_support_for_epsilon,
)

SPEED_OF_LIGHT = 299792458.0

#: Patch shape in grid cells: sublane axis x lane axis. The lane axis
#: stays one register tile (128): patch origins are 128-aligned on it
#: and visibilities whose lane footprint straddles a 128-cell window
#: boundary are DUPLICATED into both windows (the ES kernel zeroes
#: out-of-window cells automatically), so the gridding contraction
#: never pays for a second 128-lane MXU chunk (straddle fraction
#: (support - 1) / 128 ~ 4% extra slots). The SUBLANE height is a
#: tradeoff: the ES factor build and the patch matmul scale with
#: patch_x while only ~support rows per visibility are nonzero, and
#: shorter patches mean more tile columns (more strip sentinels,
#: lower block fill). Measured on the 5.8M-vis bench (one v5e,
#: support 6): 128 -> 54.7, 64 -> 67.9, 48 -> 70.6, 40 -> 70.4,
#: 32 -> 69.9 Mvis/s. CIP_PATCH_X overrides.
DEFAULT_PATCH_X = 48
DEFAULT_PATCH_Y = 128

#: Visibilities per block: the contraction length of the per-block
#: gridding matmul, and the kernel's step granularity. Per-step
#: overhead (decode, DMA management, VPU op issue) dominates small
#: steps, so bigger blocks are faster — measured grid-kernel
#: throughput on one v5e chip at the 5.8M-vis bench workload:
#: 37.9 (B=128) / 45.4 (256) / 49.7 (512) / 52.9 (1024) Mvis/s —
#: while slot fill of the (tile, w-bin)-pure groups drops with B
#: (0.95 / 0.94 / 0.92 / 0.87 there; 128 measured ~0.88 vs ~0.61 at
#: 512 on a 730k-vis workload where groups are 8x smaller). End-to-end
#: at 5.8M vis, B=1024 beats 512 on every stage (invert 47.6 vs 45.2
#: Mvis/s, predict 45.1 vs 39.3, major cycle 0.290 vs 0.316 s): the
#: per-step overhead saved outweighs the fill loss. make_plan picks a
#: block size from the visibility count by default
#: (:func:`auto_block`); CIP_BLOCK overrides.
DEFAULT_BLOCK = 128


def auto_block(num_vis: int) -> int:
    """
    Default visibilities-per-block for a shard of ``num_vis`` samples:
    scale with workload size (group occupancy grows with density, so
    large shards afford long blocks at high fill), clamped to
    [128, 1024]. Override with the ``CIP_BLOCK`` env var (a positive
    multiple of 128).
    """
    import os

    env = os.environ.get("CIP_BLOCK")
    if env:
        block = int(env)
        if block < 128 or block % 128:
            raise ValueError(
                "CIP_BLOCK must be a positive multiple of 128"
            )
        return block
    if num_vis >= 5_000_000:
        return 1024
    if num_vis >= 4_000_000:
        return 512
    if num_vis >= 1_500_000:
        return 256
    return DEFAULT_BLOCK


def auto_bin_group(num_vis: int) -> int:
    """
    Number of adjacent w-data-bins a block may span. Grouping bins
    merges each uv-tile's per-bin slot groups, so blocks quantize
    against bigger groups and the padded-slot count drops — and since
    the kernel's cost is dominated by a per-SLOT-VISIT term (measured
    on chip: ~1.26 ms per million B-slot plane-visits vs only
    ~0.29 us per block-step; see docs/src/performance.rst), the fill
    gain at a fixed block size is what pays. The ES w-factor is
    exactly zero on the (at most ``g - 1``) extra plane visits a
    multi-bin block incurs, so accuracy is unchanged. Measured sweep
    on the 5.8M-vis bench (B=1024 slot-visits): g=1 47.5M, g=2 44.4M,
    g=3 43.7M, g>=4 saturates at 43.7M (tiles rarely span more bins).
    NOTE: do NOT also lengthen the block — g=2 with B=2048 measured
    69.0 Mvis/s vs 70.6 at g=1/B=1024 (the fill loss of longer blocks
    outweighs the step saving). Override with ``CIP_WBIN_GROUP``
    (>= 1).
    """
    import os

    env = os.environ.get("CIP_WBIN_GROUP")
    if env:
        group = int(env)
        if group < 1:
            raise ValueError("CIP_WBIN_GROUP must be >= 1")
        return group
    if num_vis >= 1_500_000:
        return 4
    return 1


def auto_block_and_group(num_vis: int) -> tuple[int, int]:
    """
    (block, bin_group) for a shard of ``num_vis`` samples. The block
    size is NOT scaled with the group — the measured optimum keeps
    auto_block's size and takes the grouping purely as a fill gain
    (see :func:`auto_bin_group`). ``CIP_BLOCK`` pins the block size
    exactly; ``CIP_WBIN_GROUP`` pins the group. Sharded callers must
    derive BOTH from the global per-device count so every shard plans
    the same static program shape.
    """
    return auto_block(num_vis), auto_bin_group(num_vis)

#: Strip-buffer VMEM budget: the kernels keep four (single-plane mode)
#: or eight (plane-pair mode) (patch_x, seg_width) f32 buffers
#: resident, which must fit inside the ~16 MB VMEM next to the
#: input/output rings.
_SEG_BUDGET_BYTES = 10 * 1024 * 1024


def max_seg_width(patch_x: int, num_buffers: int = 4) -> int:
    """
    Maximum strip-buffer width in lanes (owned lanes + patch
    overhang) for the given patch height, floored to a lane tile.
    At the historical 128-row patches this evaluates to the
    measured-safe 4992; shorter patches afford proportionally wider
    strips (fewer lane segments, fewer per-plane kernel calls and
    seam adds on production-size grids). Plane-pair kernels keep
    twice the buffers resident (``num_buffers=8``) and get half the
    width.
    """
    width = _SEG_BUDGET_BYTES // (num_buffers * patch_x * 4)
    return max(128, (width // 128) * 128)


def plane_group_of(wstacking: bool, nplanes: int) -> int:
    """
    Number of adjacent w-planes each kernel call keeps resident (the
    plan's step tables then schedule plane GROUPS): every block visit
    grids onto all G resident planes, dividing the block-step count by
    ~G (per-step scalar overhead is the dominant kernel cost, see
    docs/src/performance.rst) and sharing one ES factor build across
    the group. The ES w-factor is exactly zero on planes outside a
    block's window, so group visits overhanging the window add zeros —
    accuracy is unchanged. The trade: MXU work grows with the window
    overhang (~(W + G - 1) / W plane-visits of dot work per group
    pass) and strip buffers take 4G VMEM slots (narrower lane
    segments). ``CIP_PLANE_GROUP`` overrides (1 disables; the legacy
    ``CIP_PLANE_PAIR``=0/1 maps to 1/2); default auto = 2 whenever
    w-stacking yields multiple planes.
    """
    import os

    env = os.environ.get("CIP_PLANE_GROUP")
    if env is None:
        legacy = os.environ.get("CIP_PLANE_PAIR")
        if legacy is not None:
            if legacy not in ("auto", "0", "1"):
                raise ValueError(
                    "CIP_PLANE_PAIR must be 'auto', '0' or '1'"
                )
            env = {"0": "1", "1": "2", "auto": "auto"}[legacy]
    if env is None:
        env = "auto"
    if not (wstacking and nplanes >= 2):
        return 1
    if env == "auto":
        return 2
    group = int(env)
    if group < 1 or group > 8:
        raise ValueError("CIP_PLANE_GROUP must be in [1, 8]")
    return group

#: Input-DMA pipeline of the strip kernels: per-block data is fetched
#: PREFETCH_DEPTH block-steps ahead into NUM_IN_BUFFERS slots, hiding
#: DMA latency behind several steps of compute (a one-step lookahead
#: left the MXU stalling on ~us DMA latency each ~0.3 us step).
# NOTE: the step tables pack the in-buffer slot in 3 bits
# (build_step_tables aux encoding), so NUM_IN_BUFFERS cannot exceed 8
# without a table format change (a 16-deep experiment faulted the
# kernel).
NUM_IN_BUFFERS = 8
PREFETCH_DEPTH = 6

#: Output ring of the degrid kernels: per-block (2, B) contribution
#: writes are tiny (1 KB) latency-bound DMAs, so the ring must be deep
#: enough that a write issued at block-step k has completed by step
#: k + ring-depth when its slot is reused (a 4-deep ring left the
#: kernel stalling ~1 us per step waiting on write completions).
NUM_OUT_BUFFERS = 16

#: Ring depth for the PACKED (plane-group) degrid kernel: its ring
#: slots are quad-width (4B), and 16 of them pushed the kernel 104 KB
#: over the 16 MB scoped-vmem limit. Packed steps are ~1.7x wider on
#: dense plans, so 12 covers a LONGER wall-time window than the
#: round-4 16-deep ring did. The single-plane kernel keeps 16.
NUM_OUT_BUFFERS_GROUP = 12


def next_even_grid_size(n: int) -> int:
    """Smallest even 7-smooth integer >= n (FFT-friendly sizes)."""
    n = max(int(n), 2)
    while True:
        m = n
        for p in (2, 3, 5, 7):
            while m % p == 0:
                m //= p
        if m == 1 and n % 2 == 0:
            return n
        n += 1


@dataclass
class GridderPlan:
    """Static-shape execution plan for gridding/degridding one shard."""

    # Image / grid geometry
    num_pixels: int
    pixel_size_lm: float
    ngrid: int
    nalloc_x: int
    nalloc_y: int
    support: int
    beta: float
    sigma: float
    du: float

    # W-stacking
    wstacking: bool
    nplanes: int
    dw: float
    w0: float
    n_mid: float

    # Tiling
    patch_x: int
    patch_y: int
    tile_x: int
    tile_y: int
    block: int
    num_blocks: int
    max_active: int

    # Per-visibility arrays in BLOCK-SLOT layout (length
    # num_blocks * block): block b owns slots [b*B, (b+1)*B), padded
    # slots carry order == num_vis_data.
    order: np.ndarray = field(repr=False)
    flip: np.ndarray = field(repr=False)
    x0: np.ndarray = field(repr=False)  # int32 footprint start (alloc)
    y0: np.ndarray = field(repr=False)
    fx: np.ndarray = field(repr=False)  # f32 x - x0
    fy: np.ndarray = field(repr=False)
    ws: np.ndarray = field(repr=False)  # f32 |w| in wavelengths

    # Per-block arrays (block_start[b] == b * block by construction)
    block_start: np.ndarray = field(repr=False)
    block_len: np.ndarray = field(repr=False)
    block_ox: np.ndarray = field(repr=False)
    block_oy: np.ndarray = field(repr=False)

    # Per-plane
    active_table: np.ndarray = field(repr=False)
    plane_w: np.ndarray = field(repr=False)

    # Correction quadrature (host float64, cast on device)
    quad_nodes: np.ndarray = field(repr=False)
    quad_folded: np.ndarray = field(repr=False)

    #: Number of real (row, chan) visibility samples (before padding).
    num_vis_data: int = 0

    # Lane (y) segmentation: the strip kernels keep (patch_x,
    # seg_width) buffers resident, so wide grids are processed in
    # ``num_y_segments`` lane segments of ``seg_lanes`` owned lanes
    # plus a (patch_y - tile_y)-lane overhang, seam-added by the
    # caller. nalloc_y == num_y_segments * seg_lanes + overhang.
    num_y_segments: int = 1
    seg_lanes: int = 0

    # Strip-kernel step program (see pallas_gridder): per (plane,
    # y-segment) — or per (plane GROUP, y-segment) when
    # ``plane_group > 1`` — the interleaved sequence of block steps
    # (value >= 0) and strip sentinels (value == -1 - strip); -2 pads
    # inactive tail steps.
    num_strips: int = 0
    #: Adjacent w-planes resident per kernel call (see
    #: :func:`plane_group_of`): step-table row k covers planes
    #: [k*G, (k+1)*G); group kernels grid all G from one block visit.
    plane_group: int = 1
    step_val: np.ndarray = field(repr=False, default=None)
    #: Kernel-ready derived columns precomputed by the native engine
    #: in the export pass (None under the numpy fallback;
    #: ops/gridder.plan_host_arrays computes them on demand):
    #: packed (8, num_vis) f32, flip_sign (+-1 f32), and the static
    #: w-shift phase factors cos/sin(-2 pi n_mid * ws).
    packed: np.ndarray = field(repr=False, default=None)
    flip_sign: np.ndarray = field(repr=False, default=None)
    phase_cos: np.ndarray = field(repr=False, default=None)
    phase_sin: np.ndarray = field(repr=False, default=None)
    #: Compact-staging column (export_packed=False): source sample
    #: index per slot with the conjugation flip in the sign
    #: (ops/gridder.py:compact_plan_host_arrays).
    order_enc: np.ndarray = field(repr=False, default=None)
    step_aux: np.ndarray = field(repr=False, default=None)
    step_aux2: np.ndarray = field(repr=False, default=None)
    step_count: np.ndarray = field(repr=False, default=None)
    first_block: np.ndarray = field(repr=False, default=None)
    last_blocks: np.ndarray = field(repr=False, default=None)

    @property
    def num_vis(self) -> int:
        """Number of visibility slots (num_blocks * block)."""
        return len(self.order)

    @property
    def seg_width(self) -> int:
        """Strip-buffer width: owned lanes plus the patch overhang."""
        return self.seg_lanes + (self.patch_y - self.tile_y)

    @property
    def num_groups(self) -> int:
        """Plane groups covered by the step tables."""
        return -(-self.nplanes // self.plane_group)

    @property
    def num_step_rows(self) -> int:
        """First-axis extent of the step tables."""
        return self.num_groups

    def static_signature(self) -> tuple:
        """
        The static shape/config tuple that must match across shards for
        one SPMD program to serve all of them (see pad_plans_uniform).
        """
        return (
            self.num_pixels,
            self.ngrid,
            self.nalloc_x,
            self.nalloc_y,
            self.support,
            self.patch_x,
            self.patch_y,
            self.tile_x,
            self.tile_y,
            self.block,
            self.wstacking,
            self.nplanes,
            self.num_blocks,
            self.max_active,
            self.num_vis,
            self.num_strips,
            self.num_y_segments,
            self.seg_lanes,
            self.step_val.shape[-1],
            self.plane_group,
        )

    def constant_signature(self) -> tuple:
        """
        The TRACE-TIME constants a compiled gridder program bakes in
        beyond the shapes of :meth:`static_signature` — fold both
        into any persisted-executable cache key (utils/aot_cache.py).
        """
        return (
            self.du,
            self.n_mid,
            self.beta,
            self.dw,
            self.w0,
            self.pixel_size_lm,
            self.sigma,
        )


def _build_active_table(
    plane_lo: np.ndarray,
    plane_hi: np.ndarray,
    nplanes: int,
    min_active: int,
) -> np.ndarray:
    """
    Vectorized construction of the (nplanes, max_active) table of block
    indices active on each w-plane, padded with -1.
    """
    num_blocks = len(plane_lo)
    if num_blocks == 0:
        return np.full((nplanes, max(min_active, 1)), -1, dtype=np.int32)

    lengths = (plane_hi - plane_lo + 1).astype(np.int64)
    total = int(lengths.sum())
    block_rep = np.repeat(np.arange(num_blocks, dtype=np.int64), lengths)
    offsets = np.arange(total) - np.repeat(
        np.concatenate(([0], np.cumsum(lengths)[:-1])), lengths
    )
    plane_rep = np.repeat(plane_lo, lengths) + offsets

    perm = np.argsort(plane_rep, kind="stable")
    plane_sorted = plane_rep[perm]
    block_sorted = block_rep[perm]

    counts = np.bincount(plane_sorted, minlength=nplanes)
    max_active = max(int(counts.max()), min_active, 1)
    plane_starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    within = np.arange(total) - plane_starts[plane_sorted]

    table = np.full((nplanes, max_active), -1, dtype=np.int32)
    table[plane_sorted, within] = block_sorted
    return table


#: Bit position of ``step_val`` / shift of the prefetch//wait
#: encodings carrying the WIDTH code in packed-mode step tables
#: (build_step_tables(..., block_tile=...)): a width-W step processes
#: blocks (b, .., b + W - 1) — same uv tile, contiguous slot ranges —
#: in one kernel step with one W-wide input DMA, dividing the
#: per-step scalar overhead. Width codes (2 bits): 0 -> 1 block,
#: 1 -> 2 blocks (the round-4 pair), 2 -> 4 blocks (round 5). Caps
#: block ids at 2^20 (a 7 GB-of-slots plan at B=128).
PAIR_FLAG_SHIFT = 20

#: Step widths by width code.
STEP_WIDTHS = (1, 2, 4)


def _pair_entries(
    active: np.ndarray, tile: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """
    Greedy left-to-right packing of an ascending active-block list:
    entries are (start_block, width_code) where a width-W entry
    covers blocks (b, .., b + W - 1) — allowed when they are
    id-consecutive AND on the same uv tile (same patch origin,
    contiguous slots). Widths are tried largest-first (4, 2, 1).
    """
    nb = len(active)
    starts = []
    flags = []
    j = 0

    def run_ok(j, width):
        if j + width - 1 >= nb:
            return False
        base = active[j]
        for k in range(1, width):
            if (
                active[j + k] != base + k
                or tile[active[j + k]] != tile[base]
            ):
                return False
        return True

    while j < nb:
        if run_ok(j, 4):
            starts.append(active[j])
            flags.append(2)
            j += 4
        elif run_ok(j, 2):
            starts.append(active[j])
            flags.append(1)
            j += 2
        else:
            starts.append(active[j])
            flags.append(0)
            j += 1
    return (
        np.asarray(starts, dtype=np.int64),
        np.asarray(flags, dtype=np.int64),
    )


def build_step_tables(
    plane_lo: np.ndarray,
    plane_hi: np.ndarray,
    block_strip: np.ndarray,
    nplanes: int,
    num_strips: int,
    block_segment: np.ndarray | None = None,
    num_segments: int = 1,
    block_tile: np.ndarray | None = None,
) -> dict:
    """
    Per-plane step programs for the strip-resident Pallas kernels: the
    interleaved sequence of block steps and strip sentinels, plus the
    side-channel scalars (DMA prefetch target, buffer parities,
    two-behind block for the degrid out-DMA drain) the kernel reads
    from SMEM. Encoding:

    * ``step_val``: block id (>= 0), sentinel ``-1 - strip``, pad -2.
      Packed mode additionally sets the 2-bit WIDTH code at
      ``PAIR_FLAG_SHIFT`` on steps covering blocks
      (b, .., b + width - 1), width in ``STEP_WIDTHS``.
    * ``step_aux``: ``(pref + 1) << 8 | out_parity << 4 |
      strip_parity << 3 | in_parity`` where ``pref`` is the block
      whose input DMA to start at this step (``PREFETCH_DEPTH`` steps
      ahead), ``in_parity`` the step's slot in the
      ``NUM_IN_BUFFERS``-deep input pipeline, and ``out_parity`` its
      slot in the ``NUM_OUT_BUFFERS``-deep degrid output ring. In
      packed mode ``pref`` is ``(block << 2) | width_code``.
    * ``step_aux2``: the block-step ``NUM_OUT_BUFFERS`` steps behind,
      plus one (0 if none) — the degrid kernel waits that step's
      output DMA before reusing its ring slot. Packed mode:
      ``((block << 2) | width_code) + 1``.
    * ``first_block``: the first ``PREFETCH_DEPTH`` steps' blocks,
      whose DMAs step 0 launches to fill the pipeline (packed mode:
      ``(block << 2) | width_code``).
    * ``last_blocks``: the final ``NUM_OUT_BUFFERS`` block-steps
      encoded as ``block << 4 | out_parity`` (packed mode:
      ``((block << 2) | width_code) << 4 | out_parity``) for the
      degrid output drain.

    ``block_tile`` (the per-block uv-tile identity) enables packed
    mode — used by the plane-group kernels; the single-plane kernels
    read the legacy encoding and must be given tables built without
    it.
    """
    num_blocks = len(plane_lo)
    if block_segment is None:
        block_segment = np.zeros(num_blocks, dtype=np.int64)
    pair_mode = block_tile is not None
    # Packed (group) tables drive the quad-width degrid ring; legacy
    # tables drive the single-plane kernels' 16-deep ring.
    ring = NUM_OUT_BUFFERS_GROUP if pair_mode else NUM_OUT_BUFFERS
    if pair_mode and num_blocks >= (1 << PAIR_FLAG_SHIFT):
        raise ValueError(
            f"pair-mode step tables cap block ids at "
            f"2^{PAIR_FLAG_SHIFT}; got {num_blocks} blocks"
        )

    # Entry lists (block steps after pairing) per (plane, y-segment)
    entries = {}
    max_ne = 0
    for p in range(nplanes):
        on_plane = np.flatnonzero((plane_lo <= p) & (plane_hi >= p))
        segs = block_segment[on_plane]
        for g in range(num_segments):
            active = on_plane[segs == g]
            if pair_mode:
                starts, flags = _pair_entries(active, block_tile)
            else:
                starts = active
                flags = np.zeros(len(active), dtype=np.int64)
            entries[p, g] = (starts, flags)
            max_ne = max(max_ne, len(starts))
    max_steps = max(max_ne + num_strips, 1)

    shape = (nplanes, num_segments, max_steps)
    step_val = np.full(shape, -2, dtype=np.int32)
    step_aux = np.zeros(shape, dtype=np.int32)
    step_aux2 = np.zeros(shape, dtype=np.int32)
    step_count = np.zeros((nplanes, num_segments), dtype=np.int32)
    first_block = np.full(
        (nplanes, num_segments, PREFETCH_DEPTH), -1, dtype=np.int32
    )
    last_blocks = np.full(
        (nplanes, num_segments, ring), -1, dtype=np.int32
    )

    for (p, g), (starts, flags) in entries.items():
        nb = len(starts)
        strips = (
            block_strip[starts] if nb else np.zeros(0, dtype=np.int64)
        )
        if pair_mode:
            vals_enc = (starts | (flags << PAIR_FLAG_SHIFT)).astype(
                np.int32
            )
            # Prefetch / wait / drain encoding:
            # (block << 2) | width_code
            side_enc = ((starts << 2) | flags).astype(np.int32)
        else:
            vals_enc = starts.astype(np.int32)
            side_enc = starts.astype(np.int32)
        # Sentinel for strip s goes after the last block of strip s
        per_strip = np.bincount(strips, minlength=num_strips)
        # Step position of entry j: j + (number of sentinels before
        # it) = j + strips[j]; sentinel s at per-strip cumsum + s + 1.
        pos_blocks = np.arange(nb) + strips
        pos_sent = np.cumsum(per_strip) + np.arange(num_strips)
        vals = np.empty(nb + num_strips, dtype=np.int32)
        vals[pos_blocks] = vals_enc
        vals[pos_sent] = -1 - np.arange(num_strips)
        aux = np.zeros(nb + num_strips, dtype=np.int32)
        # Current strip at each step (for the buffer-parity bit)
        cur_strip = np.zeros(nb + num_strips, dtype=np.int64)
        cur_strip[pos_blocks] = strips
        cur_strip[pos_sent] = np.arange(num_strips)
        aux |= (cur_strip % 2).astype(np.int32) << 3
        in_par = (np.arange(nb) % NUM_IN_BUFFERS).astype(np.int32)
        out_par = (np.arange(nb) % ring).astype(np.int32)
        aux[pos_blocks] |= in_par | (out_par << 4)
        pref = np.zeros(nb + num_strips, dtype=np.int32)
        if nb > PREFETCH_DEPTH:
            pref[pos_blocks[:-PREFETCH_DEPTH]] = (
                side_enc[PREFETCH_DEPTH:] + 1
            )
        aux |= pref << 8
        aux2 = np.zeros(nb + num_strips, dtype=np.int32)
        if nb > ring:
            aux2[pos_blocks[ring:]] = side_enc[:-ring] + 1
        n_steps = nb + num_strips
        step_val[p, g, :n_steps] = vals
        step_aux[p, g, :n_steps] = aux
        step_aux2[p, g, :n_steps] = aux2
        step_count[p, g] = n_steps
        head = side_enc[:PREFETCH_DEPTH]
        first_block[p, g, : len(head)] = head
        # Encoded (enc << 4 | out_parity) for the degrid drain
        tail = side_enc[-ring:]
        tail_k = np.arange(nb)[-ring:]
        for slot, (enc, k) in enumerate(zip(tail, tail_k)):
            last_blocks[p, g, slot] = (int(enc) << 4) | (
                k % ring
            )

    return {
        "step_val": step_val,
        "step_aux": step_aux,
        "step_aux2": step_aux2,
        "step_count": step_count,
        "first_block": first_block,
        "last_blocks": last_blocks,
    }


def plan_shape_maxima(plans: list) -> dict:
    """
    The data-dependent static shapes of a plan list, as the maxima a
    group of shards must be padded to. Multi-host staging allgathers
    these (they are a handful of ints) so every process pads its LOCAL
    shards to the same global program shape without loading remote
    data.
    """
    return {
        "num_blocks": max(p.num_blocks for p in plans),
        "max_active": max(p.max_active for p in plans),
        "nplanes": max(p.nplanes for p in plans),
        "max_steps": max(p.step_val.shape[-1] for p in plans),
    }


def pad_plans_uniform(plans: list, maxima: dict | None = None) -> list:
    """
    Pad a list of per-shard plans to common static shapes (blocks,
    active table, planes, visibility slots) so a single jitted SPMD
    program serves every shard under ``shard_map``. Geometry fields
    (grid size, support, dw, ...) must already agree — they derive from
    the imaging config alone. ``maxima`` overrides the padding targets
    (see :func:`plan_shape_maxima`); it must dominate the local shapes.
    """
    import dataclasses

    if not plans:
        return plans
    geometry = {
        (
            p.ngrid,
            p.nalloc_x,
            p.nalloc_y,
            p.support,
            p.patch_x,
            p.patch_y,
            p.block,
            p.wstacking,
            p.plane_group,
        )
        for p in plans
    }
    if len(geometry) != 1:
        raise ValueError(
            "Shard plans disagree on grid geometry; they must be built "
            "from the same imaging configuration"
        )

    local = plan_shape_maxima(plans)
    if maxima is None:
        maxima = local
    elif any(maxima[key] < local[key] for key in local):
        raise ValueError(
            f"padding targets {maxima} do not dominate local plan "
            f"shapes {local}"
        )
    num_blocks = maxima["num_blocks"]
    max_active = maxima["max_active"]
    nplanes = maxima["nplanes"]
    max_steps = maxima["max_steps"]
    block = plans[0].block
    num_strips = plans[0].num_strips
    num_segments = plans[0].num_y_segments
    num_vis = num_blocks * block

    def _pad1(arr, target, fill):
        if arr is None:  # skipped coordinate export (Pallas mode)
            return None
        if len(arr) == target:
            return arr
        out = np.full(target, fill, dtype=arr.dtype)
        out[: len(arr)] = arr
        return out

    # Sentinel-only step rows for padding planes: they still write the
    # (zero) grid so every plane's output is fully defined. The strip
    # parity bit MUST match the kernel decode (bit 3) — a wrong parity
    # makes a sentinel wait on the other buffer's never-started write
    # DMA and deadlocks the kernel.
    sent_val = (-1 - np.arange(num_strips)).astype(np.int32)
    sent_aux = ((np.arange(num_strips) % 2) << 3).astype(np.int32)

    padded = []
    for p in plans:
        table = np.full((nplanes, max_active), -1, dtype=np.int32)
        table[: p.active_table.shape[0], : p.active_table.shape[1]] = (
            p.active_table
        )
        # Group-mode tables have one row per plane GROUP.
        num_rows = -(-nplanes // p.plane_group)
        shape = (num_rows, num_segments, max_steps)
        step_val = np.full(shape, -2, dtype=np.int32)
        step_aux = np.zeros(shape, dtype=np.int32)
        step_aux2 = np.zeros(shape, dtype=np.int32)
        step_val[:, :, :num_strips] = sent_val
        step_aux[:, :, :num_strips] = sent_aux
        rows, _, cols = p.step_val.shape
        step_val[:rows, :, :cols] = p.step_val
        step_val[:rows, :, cols:] = -2
        step_aux[:rows, :, :cols] = p.step_aux
        step_aux[:rows, :, cols:] = 0
        step_aux2[:rows, :, :cols] = p.step_aux2
        step_count = np.full(
            (num_rows, num_segments), num_strips, dtype=np.int32
        )
        step_count[:rows] = p.step_count
        first_block = np.full(
            (num_rows, num_segments, PREFETCH_DEPTH), -1, np.int32
        )
        first_block[:rows] = p.first_block
        last_blocks = np.full(
            (num_rows, num_segments, p.last_blocks.shape[-1]),
            -1,
            dtype=np.int32,
        )
        last_blocks[:rows] = p.last_blocks
        block_start = (
            np.arange(num_blocks, dtype=np.int64) * block
        ).astype(np.int32)
        # Native-precomputed derived columns: pad with the values the
        # numpy path produces for padding slots (block_ox/oy = 0,
        # x0/y0 = support, fx/fy = 0.5, ws = 0 => phase (1, 0)).
        if p.packed is not None and p.packed.shape[1] < num_vis:
            extra = num_vis - p.packed.shape[1]
            pad_cols = np.zeros(
                (p.packed.shape[0], extra), np.float32
            )
            pad_cols[0] = p.support + 0.5
            pad_cols[1] = p.support + 0.5
            packed = np.concatenate([p.packed, pad_cols], axis=1)
            flip_sign = _pad1(p.flip_sign, num_vis, 1.0)
            phase_cos = _pad1(p.phase_cos, num_vis, 1.0)
            phase_sin = _pad1(p.phase_sin, num_vis, 0.0)
        else:
            packed = p.packed
            flip_sign = p.flip_sign
            phase_cos = p.phase_cos
            phase_sin = p.phase_sin
        padded.append(
            dataclasses.replace(
                p,
                packed=packed,
                flip_sign=flip_sign,
                phase_cos=phase_cos,
                phase_sin=phase_sin,
                step_val=step_val,
                step_aux=step_aux,
                step_aux2=step_aux2,
                step_count=step_count,
                first_block=first_block,
                last_blocks=last_blocks,
                nplanes=nplanes,
                num_blocks=num_blocks,
                max_active=max_active,
                order=_pad1(p.order, num_vis, p.num_vis_data),
                # Positive pad sentinel: pad slots decode to
                # idx == num_vis_data and are masked by the device
                # prologue (ops/gridder.py:build_assemble).
                order_enc=_pad1(p.order_enc, num_vis, p.num_vis_data),
                flip=_pad1(p.flip, num_vis, False),
                x0=_pad1(p.x0, num_vis, p.support),
                y0=_pad1(p.y0, num_vis, p.support),
                fx=_pad1(p.fx, num_vis, 0.5),
                fy=_pad1(p.fy, num_vis, 0.5),
                ws=_pad1(p.ws, num_vis, 0.0),
                block_start=block_start,
                block_len=_pad1(p.block_len, num_blocks, 0),
                block_ox=_pad1(p.block_ox, num_blocks, 0),
                block_oy=_pad1(p.block_oy, num_blocks, 0),
                active_table=table,
                plane_w=(
                    p.w0 + p.dw * np.arange(nplanes, dtype=np.float64)
                ).astype(np.float32),
            )
        )
    signatures = {p.static_signature() for p in padded}
    assert len(signatures) == 1, "padding failed to unify shard plans"
    return padded


#: Measured per-unit costs on one v5e chip feeding the sigma cost
#: model, recalibrated to the round-3 kernels (48-row patches, fused
#: Pallas FFT): gridding ~1.7e-9 s per (visibility x active plane) at
#: W~6-8 (bench: 5.8M vis x 6 planes-per-vis in 0.058 s of gridding);
#: plane FFT ~3.3e-10 s per cell (fused fft2 83 ms at 15360^2). Only
#: their RATIO matters for the choice, so modest hardware drift does
#: not flip it; cross-checked by measurement: the 5.8M-vis bench runs
#: 70.6 Mvis/s at sigma 2.0 vs 65.8 at 1.5 (model picks 2.0), the
#: 258k-vis production config is FFT-dominated (model picks 1.5).
SIGMA_COST_GRID_PER_VIS_PLANE = 1.7e-9
SIGMA_COST_FFT_PER_CELL_PLANE = 3.3e-10

#: Oversampling candidates for sigma="auto": 2.0 (smallest support,
#: best for visibility-dominated work) and 1.5 (44% smaller padded
#: grid area per plane, best for FFT-dominated wide fields). Lower
#: sigma is excluded: float32 noise amplified by the taper-edge
#: division exceeds the epsilon=1e-4 contract below ~1.4 (measured
#: against the DFT oracle; see kernel_support_for_epsilon).
SIGMA_CANDIDATES = (2.0, 1.5)


def w_range(uvw: np.ndarray, channel_frequencies: np.ndarray) -> tuple:
    """
    (min, max) of ``|w|`` in wavelengths over all (row, chan) samples —
    the w extent after the w >= 0 conjugation flip. Used to resolve
    ``sigma="auto"`` without building a plan.
    """
    from .. import native as _native

    uvw = np.asarray(uvw, np.float64)
    freqs = np.asarray(channel_frequencies, np.float64)
    if len(uvw) == 0 or len(freqs) == 0:
        return 0.0, 0.0
    if _native.available():
        return _native.w_minmax(uvw, freqs)
    w = np.abs(np.multiply.outer(uvw[:, 2], freqs / SPEED_OF_LIGHT))
    return float(w.min()), float(w.max())


def nm1_min_of(num_pixels: int, pixel_size_lm: float) -> float:
    """
    Most negative ``n(l,m) - 1`` over the image (at the corner): the
    w-direction "bandwidth" that sets plane spacing and the w-shift.
    """
    half_fov = (num_pixels / 2) * pixel_size_lm
    corner_r2 = min(2.0 * half_fov * half_fov, 0.999)
    return -corner_r2 / (1.0 + np.sqrt(1.0 - corner_r2))


def resolve_sigma(
    num_vis: int,
    num_pixels: int,
    *,
    w_extent: float,
    nm1_min: float,
    epsilon: float = 1e-4,
    do_wstacking: bool = True,
) -> float:
    """
    Pick the oversampling factor minimizing the modeled invert cost
    ``num_vis * W(sigma) * c_grid + nplanes(sigma) * ngrid(sigma)^2 *
    c_fft`` over :data:`SIGMA_CANDIDATES`. ``w_extent`` is
    ``wmax - wmin`` in wavelengths (after the w >= 0 flip).
    """

    def cost(sigma: float) -> float:
        support = kernel_support_for_epsilon(epsilon, sigma)
        ngrid = next_even_grid_size(int(np.ceil(sigma * num_pixels)))
        if do_wstacking and abs(nm1_min) > 0:
            dw = 1.0 / (sigma * abs(nm1_min))
            nplanes = int(np.floor(w_extent / dw)) + support
        else:
            nplanes = 1
        return (
            num_vis * support * SIGMA_COST_GRID_PER_VIS_PLANE
            + nplanes * ngrid * ngrid * SIGMA_COST_FFT_PER_CELL_PLANE
        )

    return min(SIGMA_CANDIDATES, key=cost)


def prewarm_plan_arenas(num_vis: int) -> None:
    """
    Pre-fault the host allocation arenas (python + native) for a
    subsequent :func:`make_plan` of ~``num_vis`` samples, so the
    timed planning path hits warm pages instead of the bench VM's
    collapsed-regime cold faults (utils/hostmem.py). Intended for
    untimed warmup/startup phases (bench.py warmup, CLI start).
    Idempotent in effect: buffers park in the arenas and are reused.
    """
    from .. import native as _native
    from ..utils.hostmem import alloc_populated

    n = int(num_vis)
    if n <= 0:
        return
    ns = int(n * 1.3) + 1024  # slots: straddlers + block padding
    # Native planner scratch (build_slot_plan): per-sample geometry
    # columns, sort key, extended/sorted index arrays.
    _native.arena_prewarm(
        [n, 4 * n, 4 * n, 4 * n, 4 * n, 4 * n, 8 * n]
        + [8 * ns, 8 * ns, 8 * ns]
    )
    # Python-side export buffers: order + order_enc (compact) and the
    # packed/flip/phase columns (classic export).
    held = [alloc_populated(ns, np.int32) for _ in range(2)]
    held += [alloc_populated(4 * ns, np.float32)]  # packed rows
    held += [alloc_populated(ns, np.float32) for _ in range(3)]
    del held  # finalizers park the buffers in the arena


def make_plan(
    uvw: np.ndarray,
    channel_frequencies: np.ndarray,
    num_pixels: int,
    pixel_size_lm: float,
    *,
    epsilon: float = 1e-4,
    do_wstacking: bool = True,
    sigma: float | str = 2.0,
    block: int | None = None,
    bin_group: int | None = None,
    min_blocks: int = 1,
    min_active: int = 1,
    min_planes: int = 1,
    w_range: tuple | None = None,
    export_coords: bool | None = None,
    export_packed: bool = True,
) -> GridderPlan:
    """
    Build a :class:`GridderPlan` for visibilities ``uvw`` (nrow, 3) in
    meters at ``channel_frequencies`` (nchan,) Hz.

    ``w_range=(wmin, wmax)`` overrides the |w| extent (in wavelengths,
    AFTER the w >= 0 conjugation flip) used for the w-plane grid.
    Sharded callers summing plane GRIDS across shards (the
    distributed-FFT invert) MUST pass the global range so every shard
    bins onto the identical plane set — per-shard w origins differ,
    and plane-p grids from different origins must never be added.
    The override must cover this shard's own range.

    ``sigma`` is the uv-grid oversampling factor; ``"auto"`` picks it
    from a grid-vs-gridding cost model (:func:`resolve_sigma`) — FFT-
    dominated wide-field configs get 1.5 (44% smaller padded grid area
    per plane), visibility-dominated ones keep 2.0 (smallest kernel
    support). Sharded callers must resolve a single value up front so
    every shard plans the same grid.

    ``min_blocks`` / ``min_active`` / ``min_planes`` pad the static
    shapes up to common bounds — used by the sharded invert so every
    device runs an identical program over differently-sized shards.

    ``export_coords`` controls whether the per-slot coordinate columns
    (flip, x0, y0, fx, fy, ws) are materialized. Only the XLA fallback
    gridder reads them — the Pallas kernels consume the fused
    ``packed`` columns — and at production scale they cost ~170 MB of
    host stores + page faults per plan. ``None`` resolves from the
    gridder mode (``CIP_GRIDDER``/backend): skipped exactly when the
    Pallas path will run. Callers that build BOTH paths from one plan
    (accuracy cross-checks) must pass ``True``.

    ``export_packed=False`` (compact staging) skips the packed /
    flip_sign / phase columns too and exports ``order_enc`` instead —
    the device prologue (ops/gridder.py:build_assemble) rebuilds
    everything on device. Such a plan can only feed the compact path
    (``compact_plan_host_arrays`` + ``build_assemble``).
    """
    uvw = np.asarray(uvw, dtype=np.float64)
    freqs = np.asarray(channel_frequencies, dtype=np.float64)

    from .. import native as _native

    num_vis = len(uvw) * len(freqs)
    use_native = _native.available() and num_vis > 0
    if export_coords is None:
        from .gridder import resolve_gridder_mode

        export_coords = resolve_gridder_mode(None) == "xla"
    if bin_group is None:
        bin_group = auto_bin_group(num_vis)
    bin_group = max(int(bin_group), 1)
    if block is None:
        block = auto_block(num_vis)

    # Patch height is a perf knob: the ES factor build and the patch
    # matmul cost scale with patch_x, while smaller patches mean more
    # tile columns (more strip sentinels, lower block fill).
    # CIP_PATCH_X overrides for hardware A/B (multiple of 8, > W).
    patch_x = int(
        __import__("os").environ.get("CIP_PATCH_X", DEFAULT_PATCH_X)
    )
    patch_y = DEFAULT_PATCH_Y
    if patch_x % 8 or patch_x < 16:
        raise ValueError("CIP_PATCH_X must be a multiple of 8, >= 16")
    support_bound = kernel_support_for_epsilon(
        epsilon, 2.0 if sigma == "auto" else float(sigma)
    )
    # Keep at least one 8-row tile column under the patch overhang.
    patch_x = max(patch_x, ((support_bound + 8 + 7) // 8) * 8)

    if use_native:
        # Native engine computes per-sample arrays later in one fused
        # multithreaded pass; only the |w| range is needed here.
        wmin, wmax = _native.w_minmax(uvw, freqs)
        u = v = w = flip = None
    else:
        # Flattened per-sample coordinates in wavelengths
        scale = freqs / SPEED_OF_LIGHT
        u = np.multiply.outer(uvw[:, 0], scale).ravel()
        v = np.multiply.outer(uvw[:, 1], scale).ravel()
        w = np.multiply.outer(uvw[:, 2], scale).ravel()

        # Flip to w >= 0 (dirty image is real; V(-u,-v,-w) = conj(V))
        flip = w < 0
        u = np.where(flip, -u, u)
        v = np.where(flip, -v, v)
        w = np.where(flip, -w, w)
        wmin = float(w.min()) if num_vis else 0.0
        wmax = float(w.max()) if num_vis else 0.0

    if w_range is not None:
        gmin, gmax = float(w_range[0]), float(w_range[1])
        if num_vis and (gmin > wmin + 1e-9 or gmax < wmax - 1e-9):
            raise ValueError(
                f"w_range {w_range} does not cover this shard's "
                f"|w| range ({wmin}, {wmax})"
            )
        wmin, wmax = gmin, gmax

    # --- w-plane setup -------------------------------------------------
    nm1_min = nm1_min_of(num_pixels, pixel_size_lm)
    n_mid = nm1_min / 2.0  # centre the nm1 band ("w-shift")

    wstacking = bool(do_wstacking) and abs(nm1_min) > 0

    if sigma == "auto":
        sigma = resolve_sigma(
            num_vis,
            num_pixels,
            w_extent=wmax - wmin,
            nm1_min=nm1_min,
            epsilon=epsilon,
            do_wstacking=wstacking,
        )
    sigma = float(sigma)

    support = kernel_support_for_epsilon(epsilon, sigma)
    beta = es_beta(support, sigma)
    ngrid = next_even_grid_size(int(np.ceil(sigma * num_pixels)))
    du = 1.0 / (ngrid * pixel_size_lm)

    if wstacking:
        # Plane spacing: sampling along w at spacing dw must keep
        # |dw * (nm1 - n_mid)| <= dw * |nm1_min| / 2 inside the
        # kernel's alias-free band 1/(2 sigma).
        dw = 1.0 / (sigma * abs(nm1_min))
        # Floor binning: a visibility in data bin
        # q = floor((w - wmin) / dw) touches exactly the W planes
        # [q, q + W) at w0 + p * dw, w0 = wmin - (W/2 - 1) dw — one
        # fewer plane per visibility than the rounded-bin +-W/2 window.
        num_bins = (
            int(np.floor((wmax - wmin) / dw)) + 1 if num_vis else 1
        )
        nplanes = num_bins + support - 1
        w0_plane = wmin - (support / 2.0 - 1.0) * dw
        bin_origin = wmin
    else:
        dw = 1.0
        num_bins = 1
        nplanes = 1
        w0_plane = 0.0
        bin_origin = 0.0
    nplanes = max(nplanes, min_planes)

    # --- uv tiling -----------------------------------------------------
    # Sublane axis: origins must be 8-aligned; lane axis: 128-aligned
    # (TPU memory tiling constraints on dynamic DMA offsets). The lane
    # axis tiles are the full 128-cell patch windows; lane straddlers
    # are duplicated into both windows (see DEFAULT_PATCH_Y).
    tile_x = ((patch_x - support + 1) // 8) * 8
    tile_y = patch_y
    if tile_x <= 0 or support >= patch_y:
        raise ValueError(
            f"support {support} too large for patch "
            f"({patch_x}, {patch_y})"
        )
    half = support // 2

    # Footprint starts lie in [1 - W/2 + W, ngrid + W/2] in the alloc
    # frame; strips must cover the largest start, and the alloc must
    # also contain the wrap margin [0, ngrid + 2W) read by the fold.
    # The alloc row extent is exactly num_strips * tile_x + carry so
    # the strip kernel's write-once row decomposition tiles it.
    carry = patch_x - tile_x
    nalloc_min = ngrid + 2 * support
    max_start = ngrid + half
    ntx = max_start // tile_x + 1
    num_strips = max(ntx, -(-(nalloc_min - carry) // tile_x))
    nalloc_x = num_strips * tile_x + carry
    # Lane alloc: whole 128-cell windows covering every footprint end
    # (duplicated straddlers land one window above their start).
    nalloc_y = max(max_start + support, nalloc_min)
    nalloc_y = -(-nalloc_y // 128) * 128

    # Lane segmentation: cap the strip-buffer width so the kernels'
    # four (single-plane) or eight (plane-pair) (patch_x, seg_width)
    # f32 buffers stay within ~10 MB of the chip's ~16 MB VMEM. Wide
    # (production) grids run in several segments, seam-added by the
    # gridder.
    group = plane_group_of(wstacking, nplanes)
    overhang = patch_y - tile_y
    seg_cap = max_seg_width(patch_x, 4 * group)
    num_y_segments = max(
        1, -(-(nalloc_y - overhang) // (seg_cap - overhang))
    )
    seg_lanes = (
        -(-(nalloc_y - overhang) // num_y_segments) + 127
    ) // 128 * 128
    nalloc_y = num_y_segments * seg_lanes + overhang
    # Lane-window count for the (x-tile, y-window) key: every window of
    # the final alloc is addressable so duplicated straddlers decode
    # injectively via (tile % nty).
    nty = nalloc_y // tile_y

    if use_native:
        # Fused C++ pass straight to the final block-slot layout:
        # geometry, lane-straddler duplication, radix key sort, block
        # split, and slot scatter all happen inside the native engine
        # (native/cip_native.cpp:cip_slot_plan_build) — none of the
        # O(num_vis) intermediate arrays are materialized in Python.
        slot = _native.build_slot_plan(
            uvw,
            freqs,
            inv_du=1.0 / du,
            ngrid=ngrid,
            support=support,
            tile_x=tile_x,
            tile_y=tile_y,
            ntiles_y=nty,
            wstacking=wstacking,
            w0_plane=bin_origin,
            dw=dw,
            num_bins=num_bins,
            block=block,
            bin_group=bin_group,
            min_blocks=min_blocks,
            pad_order=num_vis,
            # Slot staging applies the w-shift pre-phase only when
            # w-stacking is on; without it the phases must be identity
            # (cos=1, sin=0) or psf()/slot-input inverts pick up a
            # spurious per-slot rotation (round-2 advisor finding).
            phase_factor=(-2.0 * np.pi * n_mid) if wstacking else 0.0,
            export_coords=export_coords,
            export_packed=export_packed,
        )
        num_blocks = slot["num_blocks"]
        num_blocks_padded = len(slot["block_len"])
        slot_order = slot["order"]
        slot_flip = (
            slot["flip"].astype(bool)
            if slot["flip"] is not None
            else None
        )
        slot_x0 = slot["x0"]
        slot_y0 = slot["y0"]
        slot_fx = slot["fx"]
        slot_fy = slot["fy"]
        slot_ws = slot["ws"]
        block_len_padded = slot["block_len"].astype(np.int64)
        block_ox_padded = slot["block_ox"]
        block_oy_padded = slot["block_oy"]
        bin_lo = slot["bin_lo"][:num_blocks].astype(np.int64)
        bin_hi = slot["bin_hi"][:num_blocks].astype(np.int64)
        slot_packed = slot["packed"]
        slot_flip_sign = slot["flip_sign"]
        slot_phase_cos = slot["phase_cos"]
        slot_phase_sin = slot["phase_sin"]
        slot_order_enc = slot["order_enc"]
    else:
        # Footprint start cell: W consecutive cells centred on the
        # coordinate, in the alloc frame (wrapped into [0, ngrid) then
        # offset by W so footprints never go negative):
        # x0 = floor(x) - W/2 + 1
        x = np.mod(u / du + ngrid / 2.0, ngrid) + support
        y = np.mod(v / du + ngrid / 2.0, ngrid) + support
        x0 = np.floor(x).astype(np.int64) - half + 1
        y0 = np.floor(y).astype(np.int64) - half + 1

        if wstacking:
            wbin = np.floor((w - bin_origin) / dw).astype(np.int64)
            wbin = np.clip(wbin, 0, num_bins - 1)
        else:
            wbin = np.zeros(num_vis, dtype=np.int64)

        # Duplicate lane straddlers into the window above, then sort
        # the extended set by (tile, wbin): tile-major so each block
        # has one patch origin; wbin-minor so a block's w extent
        # (hence the set of planes it touches) stays narrow.
        straddle = (y0 % tile_y) > (tile_y - support)
        dup = np.flatnonzero(straddle)
        src_ext = np.concatenate(
            [np.arange(num_vis, dtype=np.int64), dup]
        )
        yt_ext = np.concatenate([y0 // tile_y, y0[dup] // tile_y + 1])
        tile_ext = (x0 // tile_x)[src_ext] * nty + yt_ext
        wbin_ext = wbin[src_ext]
        order_ext = np.lexsort((wbin_ext, tile_ext))
        order = src_ext[order_ext]
        tile_sorted = tile_ext[order_ext]
        wbin_sorted = wbin_ext[order_ext]
        x0_sorted = x0[order].astype(np.int32)
        y0_sorted = y0[order].astype(np.int32)
        fx_sorted = (x - x0)[order].astype(np.float32)
        fy_sorted = (y - y0)[order].astype(np.float32)
        ws_sorted = w[order].astype(np.float32)
        flip_sorted = flip[order]

        # --- block decomposition (in sorted space) ----------------------
        # Blocks are (tile, wbin)-pure: every visibility in a block
        # shares one patch origin AND one w data bin, so the strip
        # kernel grids a block onto exactly its W-plane window. The
        # sorted space includes the duplicated lane straddlers
        # (``order`` maps slots to source samples, with duplicates).
        num_sorted = len(order)
        if num_sorted:
            # Group boundaries at (tile, wbin // bin_group) changes:
            # a block may span bin_group adjacent w-bins (its exact
            # [bin_lo, bin_hi] window is still read off the bin-sorted
            # first/last slots below) — see auto_bin_group.
            boundaries = (
                np.flatnonzero(
                    (np.diff(tile_sorted) != 0)
                    | (np.diff(wbin_sorted // bin_group) != 0)
                )
                + 1
            )
            group_starts = np.concatenate(([0], boundaries))
            group_ends = np.concatenate((boundaries, [num_sorted]))
            num_per_group = -(-(group_ends - group_starts) // block)
            sorted_start = np.concatenate(
                [
                    np.arange(gstart, gend, block)
                    for gstart, gend in zip(group_starts, group_ends)
                ]
            ).astype(np.int64)
            group_end_rep = np.repeat(group_ends, num_per_group)
            block_len = (
                np.minimum(sorted_start + block, group_end_rep)
                - sorted_start
            )
        else:
            sorted_start = np.zeros(0, dtype=np.int64)
            block_len = np.zeros(0, dtype=np.int64)

        num_blocks = len(sorted_start)
        block_tile = (
            tile_sorted[sorted_start]
            if num_blocks
            else np.zeros(0, np.int64)
        )
        block_ox = ((block_tile // nty) * tile_x).astype(np.int32)
        block_oy = ((block_tile % nty) * tile_y).astype(np.int32)
        if num_blocks:
            bin_lo = wbin_sorted[sorted_start]  # ascending in a tile
            bin_hi = wbin_sorted[sorted_start + block_len - 1]
        else:
            bin_lo = np.zeros(0, dtype=np.int64)
            bin_hi = np.zeros(0, dtype=np.int64)

        # --- block-slot re-packing --------------------------------------
        # Slot layout: block b owns [b*B, (b+1)*B); every DMA offset is
        # b*B, statically aligned. slot_src maps slots to sorted
        # indices (sentinel num_sorted for padding).
        num_blocks_padded = max(num_blocks, min_blocks, 1)
        num_slots = num_blocks_padded * block
        slot_idx = np.arange(num_slots)
        slot_block = slot_idx // block
        slot_lane = slot_idx % block
        block_len_padded = np.zeros(num_blocks_padded, dtype=np.int64)
        block_len_padded[:num_blocks] = block_len
        sorted_start_padded = np.zeros(num_blocks_padded, dtype=np.int64)
        sorted_start_padded[:num_blocks] = sorted_start
        slot_valid = slot_lane < block_len_padded[slot_block]
        slot_src = np.where(
            slot_valid,
            sorted_start_padded[slot_block] + slot_lane,
            num_sorted,
        )

        def _slotted(sorted_values, pad_value, dtype):
            padded = np.append(
                np.asarray(sorted_values, dtype=dtype),
                np.asarray(pad_value, dtype=dtype)[None],
            )
            return padded[slot_src]

        slot_order = _slotted(order, num_vis, np.int64).astype(np.int32)
        slot_flip = _slotted(flip_sorted, False, bool)
        slot_x0 = _slotted(x0_sorted, support, np.int32)
        slot_y0 = _slotted(y0_sorted, support, np.int32)
        slot_fx = _slotted(fx_sorted, 0.5, np.float32)
        slot_fy = _slotted(fy_sorted, 0.5, np.float32)
        slot_ws = _slotted(ws_sorted, 0.0, np.float32)

        def _pad_blocks(arr, dtype):
            out = np.zeros(num_blocks_padded, dtype=dtype)
            out[: len(arr)] = arr
            return out

        block_ox_padded = _pad_blocks(block_ox, np.int32)
        block_oy_padded = _pad_blocks(block_oy, np.int32)
        block_len_padded = _pad_blocks(block_len, np.int32)
        slot_packed = None
        slot_flip_sign = None
        slot_phase_cos = None
        slot_phase_sin = None
        slot_order_enc = None

    # --- shared tail: plane windows, step programs, assembly ------------
    # Data bin q -> active plane window [q, q + W) (floor binning)
    if num_blocks:
        plane_lo = np.maximum(bin_lo, 0)
        plane_hi = np.minimum(bin_hi + support - 1, nplanes - 1)
    else:
        plane_lo = np.zeros(0, dtype=np.int64)
        plane_hi = np.zeros(0, dtype=np.int64)

    active_table = _build_active_table(
        plane_lo, plane_hi, nplanes, min_active
    )
    max_active = active_table.shape[1]

    block_strip = (
        (block_ox_padded[:num_blocks] // tile_x).astype(np.int64)
        if num_blocks
        else np.zeros(0, dtype=np.int64)
    )
    block_segment = (
        (block_oy_padded[:num_blocks] // seg_lanes).astype(np.int64)
        if num_blocks
        else np.zeros(0, dtype=np.int64)
    )
    # Group mode: table row k schedules planes [k*G, (k+1)*G) — a
    # block is active on row k when its plane window intersects them.
    # Group tables are PAIR-mode (build_step_tables): id-consecutive
    # same-tile blocks share one double-width step, halving per-step
    # scalar overhead on dense workloads. The single-plane kernels
    # read the legacy encoding, so non-group tables stay unpaired.
    if group > 1:
        row_lo, row_hi = plane_lo // group, plane_hi // group
        num_rows = -(-nplanes // group)
        block_tile = (
            block_ox_padded[:num_blocks].astype(np.int64)
            * (1 << 32)
            + block_oy_padded[:num_blocks].astype(np.int64)
        )
    else:
        row_lo, row_hi, num_rows = plane_lo, plane_hi, nplanes
        block_tile = None
    step_tables = build_step_tables(
        row_lo,
        row_hi,
        block_strip,
        num_rows,
        num_strips,
        block_segment,
        num_y_segments,
        block_tile=block_tile,
    )

    plane_w = w0_plane + dw * np.arange(nplanes, dtype=np.float64)
    quad_nodes, quad_folded = gauss_legendre_kernel_quadrature(
        support, beta
    )

    return GridderPlan(
        num_pixels=num_pixels,
        pixel_size_lm=float(pixel_size_lm),
        ngrid=ngrid,
        nalloc_x=nalloc_x,
        nalloc_y=nalloc_y,
        support=support,
        beta=float(beta),
        sigma=float(sigma),
        du=float(du),
        wstacking=wstacking,
        nplanes=nplanes,
        dw=float(dw),
        w0=float(w0_plane),
        n_mid=float(n_mid),
        patch_x=patch_x,
        patch_y=patch_y,
        tile_x=tile_x,
        tile_y=tile_y,
        block=block,
        num_blocks=num_blocks_padded,
        max_active=max_active,
        num_vis_data=num_vis,
        order=slot_order,
        flip=slot_flip,
        x0=slot_x0,
        y0=slot_y0,
        fx=slot_fx,
        fy=slot_fy,
        ws=slot_ws,
        block_start=(
            np.arange(num_blocks_padded, dtype=np.int64) * block
        ).astype(np.int32),
        block_len=block_len_padded.astype(np.int32),
        block_ox=block_ox_padded,
        block_oy=block_oy_padded,
        active_table=active_table,
        plane_w=plane_w.astype(np.float32),
        quad_nodes=quad_nodes,
        quad_folded=quad_folded,
        num_strips=num_strips,
        plane_group=group,
        num_y_segments=num_y_segments,
        seg_lanes=seg_lanes,
        packed=slot_packed,
        flip_sign=slot_flip_sign,
        phase_cos=slot_phase_cos,
        phase_sin=slot_phase_sin,
        order_enc=slot_order_enc,
        **step_tables,
    )
