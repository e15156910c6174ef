"""
Invariants of the strip-kernel step programs
(ska_sdp_cip_tpu/ops/plan.py:build_step_tables): the Pallas kernels
execute these tables blindly, so every scheduling property they rely
on is pinned here.
"""

import numpy as np

from ska_sdp_cip_tpu.ops.plan import (
    NUM_IN_BUFFERS,
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
        # parity cycles through the input-buffer ring in block order
        k = 0
        for j in range(count):
            if steps[j] < 0:
                continue
            assert aux[j] & 3 == k % NUM_IN_BUFFERS
            pref = (aux[j] >> 4) - 1
            if k + PREFETCH_DEPTH < len(blocks):
                assert pref == blocks[k + PREFETCH_DEPTH]
            else:
                assert pref == -1
            prev = tables["step_aux2"][p, 0][j] - 1
            if k >= NUM_IN_BUFFERS:
                assert prev == blocks[k - NUM_IN_BUFFERS]
            else:
                assert prev == -1
            k += 1
        # Head blocks fill the pipeline at step 0
        head = tables["first_block"][p, 0]
        expect = list(blocks[:PREFETCH_DEPTH])
        assert list(head[: len(expect)]) == expect
        assert (head[len(expect):] == -1).all()
        # Drain encodings carry (block << 2 | parity)
        last = tables["last_blocks"][p, 0]
        tail = blocks[-NUM_IN_BUFFERS:]
        tail_k = np.arange(len(blocks))[-NUM_IN_BUFFERS:]
        for slot, (b, kk) in enumerate(zip(tail, tail_k)):
            assert last[slot] == (b << 2 | (kk % NUM_IN_BUFFERS))
