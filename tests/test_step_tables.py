"""
Invariants of the strip-kernel step programs
(ska_sdp_cip_tpu/ops/plan.py:build_step_tables): the Pallas kernels
execute these tables blindly, so every scheduling property they rely
on is pinned here.
"""

import numpy as np

from ska_sdp_cip_tpu.ops.plan import (
    NUM_IN_BUFFERS,
    NUM_OUT_BUFFERS,
    PREFETCH_DEPTH,
    build_step_tables,
)


def _random_case(rng, num_blocks, nplanes, num_strips, num_segments):
    lo = rng.integers(0, nplanes, size=num_blocks)
    hi = np.minimum(lo + rng.integers(0, 4, size=num_blocks), nplanes - 1)
    # Blocks are ordered strip-major (the plan sorts by tile id)
    strips = np.sort(rng.integers(0, num_strips, size=num_blocks))
    segs = rng.integers(0, num_segments, size=num_blocks)
    return lo, hi, strips, segs


def test_step_tables_cover_every_visit_once():
    rng = np.random.default_rng(5)
    nplanes, num_strips, num_segments = 7, 5, 2
    lo, hi, strips, segs = _random_case(rng, 40, nplanes, num_strips, 2)
    tables = build_step_tables(
        lo, hi, strips, nplanes, num_strips, segs, num_segments
    )
    visits = set()
    for p in range(nplanes):
        for g in range(num_segments):
            row = tables["step_val"][p, g]
            count = tables["step_count"][p, g]
            assert (row[count:] == -2).all()
            steps = row[:count]
            sentinels = steps[steps < 0]
            # Exactly one sentinel per strip, ascending
            assert list(-1 - sentinels) == list(range(num_strips))
            blocks = steps[steps >= 0]
            for b in blocks:
                assert lo[b] <= p <= hi[b]
                assert segs[b] == g
                visits.add((int(b), p))
            # Blocks precede their strip's sentinel
            cur = 0
            for v in steps:
                if v < 0:
                    assert -1 - v == cur
                    cur += 1
                else:
                    assert strips[v] == cur
    # Every (block, plane-in-window) pair visited exactly once
    expected = {
        (b, p)
        for b in range(len(lo))
        for p in range(lo[b], hi[b] + 1)
    }
    assert visits == expected


def test_step_tables_pipeline_encoding():
    rng = np.random.default_rng(9)
    nplanes, num_strips = 3, 4
    lo, hi, strips, segs = _random_case(rng, 25, nplanes, num_strips, 1)
    tables = build_step_tables(lo, hi, strips, nplanes, num_strips)
    for p in range(nplanes):
        row = tables["step_val"][p, 0]
        aux = tables["step_aux"][p, 0]
        count = tables["step_count"][p, 0]
        steps = row[:count]
        blocks = steps[steps >= 0]
        # parities cycle through the input/output rings in block order
        k = 0
        for j in range(count):
            if steps[j] < 0:
                continue
            assert aux[j] & 7 == k % NUM_IN_BUFFERS
            assert (aux[j] >> 4) & 15 == k % NUM_OUT_BUFFERS
            pref = (aux[j] >> 8) - 1
            if k + PREFETCH_DEPTH < len(blocks):
                assert pref == blocks[k + PREFETCH_DEPTH]
            else:
                assert pref == -1
            prev = tables["step_aux2"][p, 0][j] - 1
            if k >= NUM_OUT_BUFFERS:
                assert prev == blocks[k - NUM_OUT_BUFFERS]
            else:
                assert prev == -1
            k += 1
        # Head blocks fill the pipeline at step 0
        head = tables["first_block"][p, 0]
        expect = list(blocks[:PREFETCH_DEPTH])
        assert list(head[: len(expect)]) == expect
        assert (head[len(expect):] == -1).all()
        # Drain encodings carry (block << 4 | out parity)
        last = tables["last_blocks"][p, 0]
        tail = blocks[-NUM_OUT_BUFFERS:]
        tail_k = np.arange(len(blocks))[-NUM_OUT_BUFFERS:]
        for slot, (b, kk) in enumerate(zip(tail, tail_k)):
            assert last[slot] == (b << 4 | (kk % NUM_OUT_BUFFERS))


def test_padded_plane_rows_match_kernel_parity_decode():
    """
    pad_plans_uniform fills padding planes with sentinel-only step
    rows; their strip-parity bit must sit where the kernel decode
    reads it (bit 3) or a sentinel waits on the other strip buffer's
    never-started write DMA and the kernel deadlocks on hardware.
    """
    from ska_sdp_cip_tpu.io.synth import synthetic_uvw
    from ska_sdp_cip_tpu.ops.plan import make_plan, pad_plans_uniform

    uvw, _ = synthetic_uvw(2, 8, max_baseline_m=2500.0, seed=4)
    freqs = np.linspace(1.3e9, 1.35e9, 2)
    plan = make_plan(
        uvw,
        freqs,
        64,
        float(np.sin(np.radians(40.0 / 3600.0))),
        epsilon=1e-3,
    )
    (padded,) = pad_plans_uniform([plan], {
        "num_blocks": plan.num_blocks,
        "max_active": plan.max_active,
        "nplanes": plan.nplanes + 3,
        "max_steps": plan.step_val.shape[-1],
    })
    # Step-table rows are plane GROUPS when plane_group > 1; padding
    # rows start after the original plan's rows either way.
    for p in range(plan.num_step_rows, padded.num_step_rows):
        for g in range(padded.num_y_segments):
            row = padded.step_val[p, g]
            aux = padded.step_aux[p, g]
            count = padded.step_count[p, g]
            assert count == plan.num_strips
            sentinels = row[:count]
            assert list(-1 - sentinels) == list(range(plan.num_strips))
            # strip parity bit (bit 3) alternates with the strip index
            for s in range(plan.num_strips):
                assert (aux[s] >> 3) & 1 == s % 2
