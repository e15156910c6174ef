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
    split_complex,
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
    invert = build_invert(plan)

    weighted = vis.astype(np.complex64) * weights.astype(np.float32)
    re, im = split_complex(weighted)
    re_pad = np.zeros(plan.num_vis, np.float32)
    im_pad = np.zeros(plan.num_vis, np.float32)
    re_pad[: len(re)], im_pad[: len(im)] = re, im

    image = np.asarray(
        invert(arrays, jnp.asarray(re_pad), jnp.asarray(im_pad))
    )
    return image / float(weights.sum())
