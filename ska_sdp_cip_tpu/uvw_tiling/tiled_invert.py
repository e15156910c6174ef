"""
Invert directly from the UVW tile store.

The reference's tiling stage exists "to feed a future tiled gridder"
(SURVEY.md section 0; reference: src/ska_sdp_cip/uvw_tiling/) — this is
that gridder's front end: tile chunk files (which carry Stokes-I
visibilities, weights and uvw; see tile.py) are loaded and gridded
without ever touching the original dataset. Because tiles are already
spatially sorted, plan construction degenerates to concatenation plus
per-tile block bookkeeping.
"""

from __future__ import annotations

from pathlib import Path
from typing import Iterable, Sequence

import numpy as np

from ..ops.gridder import (
    build_invert,
    plan_device_arrays,
    stage_slot_vis,
)
from ..ops.plan import make_plan
from .tile import Tile


def load_tile_samples(
    paths: Iterable[Path],
    channel_frequencies: np.ndarray,
) -> tuple:
    """
    Flatten tile chunk files into per-sample arrays
    ``(uvw_m, freq_per_sample, vis, weights)``: one entry per stored
    visibility, with uvw in meters and the per-sample channel frequency
    resolved from the stored channel indices.
    """
    freqs = np.asarray(channel_frequencies, dtype=np.float64)
    uvw_list, freq_list, vis_list, wgt_list = [], [], [], []
    for path in paths:
        tile = Tile.load_npz(path)
        lengths = (
            tile.channel_stop_indices - tile.channel_start_indices
        ).astype(np.int64)
        total = int(lengths.sum())
        if total == 0:
            continue
        slice_idx = np.repeat(np.arange(tile.num_rows), lengths)
        offsets = np.concatenate(([0], np.cumsum(lengths)[:-1]))
        within = np.arange(total) - offsets[slice_idx]
        chan_idx = tile.channel_start_indices[slice_idx] + within

        uvw_list.append(tile.uvw[slice_idx])
        freq_list.append(freqs[chan_idx])
        vis_list.append(tile.visibilities)
        wgt_list.append(tile.weights)

    if not uvw_list:
        raise ValueError("No visibilities found in tile chunks")
    return (
        np.concatenate(uvw_list),
        np.concatenate(freq_list),
        np.concatenate(vis_list),
        np.concatenate(wgt_list),
    )


def invert_tile_chunks(
    paths: Sequence[Path],
    channel_frequencies: np.ndarray,
    num_pixels: int,
    pixel_size_lm: float,
    *,
    epsilon: float = 1e-4,
    do_wstacking: bool = True,
) -> np.ndarray:
    """
    Normalized Stokes-I dirty image from tile chunk files. Numerically
    equivalent (to gridder accuracy) to inverting the original dataset,
    since tiles carry exact uvw, visibilities, and weights.
    """
    import jax.numpy as jnp

    uvw, freq_per_sample, vis, weights = load_tile_samples(
        paths, channel_frequencies
    )

    # Per-sample frequencies: feed the planner one sample per "row"
    # with a single pseudo-channel by pre-scaling uvw to a common
    # reference frequency.
    ref_freq = float(np.max(freq_per_sample))
    uvw_scaled = uvw * (freq_per_sample / ref_freq)[:, None]

    plan = make_plan(
        uvw_scaled,
        np.array([ref_freq]),
        num_pixels,
        pixel_size_lm,
        epsilon=epsilon,
        do_wstacking=do_wstacking,
    )
    arrays = plan_device_arrays(plan)
    invert = build_invert(plan, slot_input=True)

    weighted = vis.astype(np.complex64) * weights.astype(np.float32)
    slot_re, slot_im = stage_slot_vis(
        plan, weighted.real.ravel(), weighted.imag.ravel()
    )
    image = np.asarray(
        invert(arrays, jnp.asarray(slot_re), jnp.asarray(slot_im))
    )
    return image / float(weights.sum())


def _tile_chunk_num_vis(path: Path) -> int:
    """
    Exact stored-visibility count of a tile chunk file, read from the
    npy header of the ``visibilities`` zip member alone — no array data
    is decompressed or loaded. Used to pick the shared block size
    (previously approximated as ``file_bytes // 16``, which drifts with
    compression and the uvw/weights share per sample).
    """
    import zipfile

    with zipfile.ZipFile(path) as archive:
        with archive.open("visibilities.npy") as member:
            version = np.lib.format.read_magic(member)
            if version >= (2, 0):
                header = np.lib.format.read_array_header_2_0
            else:
                header = np.lib.format.read_array_header_1_0
            shape, _, _ = header(member)
    return int(np.prod(shape))


def _scaled_tile_samples(
    paths: Sequence[Path], channel_frequencies, ref_freq: float
) -> tuple:
    """(uvw scaled to ref_freq, vis, weights) for a group of chunks."""
    if not paths:
        return (
            np.zeros((0, 3)),
            np.zeros(0, np.complex64),
            np.zeros(0, np.float32),
        )
    uvw, freq_per_sample, vis, weights = load_tile_samples(
        paths, channel_frequencies
    )
    return uvw * (freq_per_sample / ref_freq)[:, None], vis, weights


def sharded_invert_tile_chunks(
    paths: Sequence[Path],
    channel_frequencies: np.ndarray,
    num_pixels: int,
    pixel_size_lm: float,
    *,
    mesh=None,
    epsilon: float = 1e-4,
    do_wstacking: bool = True,
    fft_mode: str = "replicated",
    timings: dict | None = None,
    repeats: int = 1,
) -> np.ndarray:
    """
    Distributed invert straight from the tile store: chunk files are
    balanced over the mesh devices by on-disk size (deterministic on
    every process), each process loads and plans only the groups its
    own devices hold, and the partial images are psum-reduced — the
    reorder stage's output feeds the production gridder without
    re-binning through the original dataset (SURVEY.md section 7.3-4).
    Numerically equivalent to the dataset invert at gridder accuracy.
    ``fft_mode="distributed"`` reduces grids and shards the plane
    FFTs over the mesh (see parallel.sharded_invert).

    ``timings`` (a dict) is filled with per-stage wall seconds
    (load, plan, stage, compile+first execute, best repeat execute);
    ``repeats > 1`` re-executes the compiled program to measure
    sustained throughput (scripts/production_scale_bench.py).
    """
    import time as _time

    import jax
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import make_device_mesh
    from ..parallel.sharded_invert import (
        _is_replicated,
        addressable_shard_indices,
        stage_planned_shards,
    )

    if mesh is None:
        mesh = make_device_mesh()
    (axis_name,) = mesh.axis_names
    num_devices = mesh.devices.size

    paths = sorted(Path(p) for p in paths)
    if not paths:
        raise ValueError("No tile chunk files given")
    # Greedy size-balanced grouping, largest first
    groups = [[] for _ in range(num_devices)]
    loads = [0] * num_devices
    order = sorted(paths, key=lambda p: p.stat().st_size, reverse=True)
    for path in order:
        device = loads.index(min(loads))
        groups[device].append(path)
        loads[device] += path.stat().st_size

    ref_freq = float(np.max(np.asarray(channel_frequencies)))
    # Shard plans must agree on the block size and w-bin grouping
    # (they are padded into one SPMD program); derive them from the
    # average per-device load.
    from ..ops.plan import auto_block_and_group

    total_vis = sum(_tile_chunk_num_vis(path) for path in paths)
    block, bin_group = auto_block_and_group(
        total_vis // max(num_devices, 1)
    )
    distributed = fft_mode == "distributed"
    local_ids = addressable_shard_indices(mesh)
    if timings is None:
        timings = {}
    t0 = _time.time()
    scaled = {
        index: _scaled_tile_samples(
            groups[index], channel_frequencies, ref_freq
        )
        for index in local_ids
    }
    global_w = None
    if distributed:
        # Distributed FFT sums plane GRIDS across shards: all shards
        # must bin onto the global w-plane grid (tiles have disjoint
        # |w| ranges, so per-shard origins would differ badly here).
        from ..ops.plan import w_range
        from ..parallel.sharded_invert import _allgather_max

        ref = np.array([ref_freq])
        his = [
            w_range(s[0], ref)[1] for s in scaled.values()
        ] or [0.0]
        los = [w_range(s[0], ref)[0] for s in scaled.values()] or [0.0]
        ghi = float(_allgather_max(np.asarray([max(his)]))[0])
        glo = -float(_allgather_max(np.asarray([-min(los)]))[0])
        global_w = (glo, ghi)
    timings["load_s"] = round(_time.time() - t0, 2)
    # Pre-fault the planner's host allocation arenas for the largest
    # local shard (no-op when already warm; see utils/hostmem.py).
    t0 = _time.time()
    from ..ops.plan import prewarm_plan_arenas

    if local_ids:
        prewarm_plan_arenas(
            max(len(scaled[i][0]) for i in local_ids)
        )
    timings["prewarm_s"] = round(_time.time() - t0, 2)
    t0 = _time.time()
    plans = {}
    samples = {}
    for index in local_ids:
        uvw_scaled, vis, weights = scaled[index]
        plans[index] = make_plan(
            uvw_scaled,
            np.array([ref_freq]),
            num_pixels,
            pixel_size_lm,
            epsilon=epsilon,
            do_wstacking=do_wstacking,
            block=block,
            bin_group=bin_group,
            w_range=global_w,
        )
        samples[index] = (vis, weights)

    timings["plan_s"] = round(_time.time() - t0, 2)
    t0 = _time.time()
    staging = stage_planned_shards(
        mesh, plans, samples, slot_mode=True
    )
    timings["stage_s"] = round(_time.time() - t0, 2)
    invert = build_invert(
        staging.plans[0],
        slot_input=True,
        mesh_axis=axis_name if distributed else None,
        num_shards=mesh.devices.size if distributed else 1,
    )

    def shard_fn(arrays, vre, vim, wgt):
        arrays = {
            key: value if _is_replicated(key) else value[0]
            for key, value in arrays.items()
        }
        image = invert(arrays, vre[0] * wgt[0], vim[0] * wgt[0])
        if distributed:
            return image
        return jax.lax.psum(image, axis_name)

    spmd = jax.jit(
        jax.shard_map(
            shard_fn,
            mesh=staging.mesh,
            in_specs=(
                staging.in_specs(),
                P(axis_name),
                P(axis_name),
                P(axis_name),
            ),
            out_specs=P(),
            check_vma=False,
        )
    )
    t0 = _time.time()
    image = np.asarray(
        jax.block_until_ready(
            spmd(
                staging.stacked,
                staging.vis_re,
                staging.vis_im,
                staging.weights,
            )
        )
    )
    timings["compile_first_s"] = round(_time.time() - t0, 2)
    best = None
    for _rep in range(max(repeats - 1, 0)):
        t0 = _time.time()
        jax.block_until_ready(
            spmd(
                staging.stacked,
                staging.vis_re,
                staging.vis_im,
                staging.weights,
            )
        )
        dt = _time.time() - t0
        best = dt if best is None else min(best, dt)
    if best is not None:
        timings["execute_s"] = round(best, 3)
    return image / staging.total_weight
