"""
Minimal casacore table-format writers (AipsIO frames, StandardStMan
buckets, IncrementalStMan change-point buckets) mirroring the layout
``ska_sdp_cip_tpu/io/casacore_tables.py`` documents.

Used by the reader plumbing tests and by
``scripts/make_offline_fixture.py`` (which freezes writer output into
``tests/data/`` so the reader is also pinned against FIXED bytes).
These are writer-reconstructed bytes — byte-level agreement with real
casacore output is asserted by the ingest-casacore CI job, whose
artifacts supersede these fixtures when checked in.
"""

import struct
from pathlib import Path

import numpy as np

from ska_sdp_cip_tpu.io.casacore_tables import TP_BOOL


class _Writer:
    def __init__(self):
        self.buf = bytearray()

    def uint(self, v):
        self.buf += struct.pack(">I", v)

    def int_(self, v):
        self.buf += struct.pack(">i", v)

    def string(self, s):
        raw = s.encode()
        self.uint(len(raw))
        self.buf += raw

    def frame(self, typ, version, payload: bytes):
        body = bytearray()
        w = _Writer()
        w.string(typ)
        w.uint(version)
        body += w.buf + payload
        self.uint(len(body))
        self.buf += body


def _column_desc_frame(
    name, value_type, is_array, shape, dm_type, options, ndim=None
) -> bytes:
    """``ndim`` overrides the written dimensionality for
    variable-shape array columns (shape empty, ndim known — the
    TiledShapeStMan binding); the shape IPosition is then written
    with rank 0."""
    w = _Writer()
    w.string("ArrayColumnDesc" if is_array else "ScalarColumnDesc")
    w.uint(1)  # payload version
    w.string(name)
    w.string("")  # comment
    w.string(dm_type)
    w.string("")  # group
    w.int_(value_type)
    w.int_(options)
    w.int_(len(shape) if ndim is None else ndim)
    if is_array and (shape or ndim):
        ip = _Writer()
        ip.uint(len(shape))
        for d in shape:
            ip.buf += struct.pack(">q", d)
        inner = _Writer()
        inner.frame("IPosition", 2, bytes(ip.buf))
        w.buf += inner.buf
    out = _Writer()
    out.frame("ColumnDesc", 1, bytes(w.buf))
    return bytes(out.buf)


def _write_fake_table(path: Path, columns, num_rows, bucket_size=2048):
    """columns: list of (name, vt, is_array, shape, options, data)."""
    path.mkdir(parents=True, exist_ok=True)

    cols_payload = bytearray()
    for name, vt, is_array, shape, options, _data in columns:
        cols_payload += _column_desc_frame(
            name, vt, is_array, shape, "StandardStMan", options
        )
    desc = _Writer()
    desc.frame("TableDesc", 1, bytes(cols_payload))

    tab_payload = _Writer()
    tab_payload.uint(num_rows)
    tab_payload.uint(0)  # format
    tab_payload.string("fake")
    tab_payload.buf += desc.buf

    top = _Writer()
    top.frame("Table", 2, bytes(tab_payload.buf))
    (path / "table.dat").write_bytes(bytes(top.buf))

    # SSM data file: 512-byte header area + one bucket.
    header = _Writer()
    hp = _Writer()
    hp.int_(bucket_size)
    hp.int_(1)  # nr buckets
    hp.int_(1)  # pers cache
    hp.int_(0)  # free buckets
    hp.int_(-1)  # first free
    hp.int_(0)  # nr idx buckets
    hp.int_(-1)  # first idx bucket
    header.frame("StandardStMan", 2, bytes(hp.buf))
    blob = bytearray(header.buf)
    blob += b"\x00" * (512 - len(blob))

    # Pack slabs at capacity rows-per-bucket, matching the reader's
    # packing rule.
    from ska_sdp_cip_tpu.io.casacore_tables import SSMFile, _slab_spec
    from ska_sdp_cip_tpu.io.casacore_tables import ColumnDesc as CD

    descs = [
        CD(n, vt, ia, len(sh), tuple(sh), "StandardStMan", "", opt)
        for n, vt, ia, sh, opt, _ in columns
    ]
    slabs = [_slab_spec(d) for d in descs]
    lo, hi = 1, bucket_size * 8
    while lo < hi:
        mid = (lo + hi + 1) // 2
        if SSMFile._bucket_bytes(slabs, mid) <= bucket_size:
            lo = mid
        else:
            hi = mid - 1
    rpb = lo
    assert rpb >= num_rows, "fixture must fit one bucket"

    bucket = bytearray(bucket_size)
    aux = bytearray(b"\x00" * 16)  # nonzero offsets only
    off = 0
    for (name, vt, is_array, shape, options, data), (
        is_bool,
        per_row,
    ) in zip(columns, slabs):
        arr = np.asarray(data)
        if not (options & 1) and is_array:  # indirect
            offsets = []
            for r in range(num_rows):
                offsets.append(len(aux))
                cell = np.ascontiguousarray(arr[r])
                dims = tuple(reversed(cell.shape))
                aux += struct.pack(">I", len(dims))
                for d in dims:
                    aux += struct.pack(">I", d)
                if vt == TP_BOOL:
                    aux += np.packbits(
                        cell.reshape(-1).astype(np.uint8),
                        bitorder="little",
                    ).tobytes()
                else:
                    aux += (
                        cell.reshape(-1)
                        .astype(arr.dtype.newbyteorder(">"))
                        .tobytes()
                    )
            raw = np.asarray(offsets, ">i8").tobytes()
        elif is_bool:
            flat = arr.reshape(-1).astype(np.uint8)
            raw = np.packbits(flat, bitorder="little").tobytes()
        else:
            flat = np.ascontiguousarray(arr).reshape(-1)
            raw = flat.astype(flat.dtype.newbyteorder(">")).tobytes()
        bucket[off : off + len(raw)] = raw
        if is_bool:
            off += (rpb * per_row + 7) // 8
        else:
            off += per_row * rpb
    blob += bucket
    (path / "table.f0").write_bytes(bytes(blob))
    (path / "table.f0x").write_bytes(bytes(aux))


def _write_fake_ism_table(path: Path, num_rows, bucket_rows, columns):
    """
    columns: list of (name, vt, is_array, shape, per_row_values) where
    per_row_values has one entry per row (the writer stores only the
    change points, as ISM does). Splits rows into buckets of
    ``bucket_rows`` and appends the ISMIndex frame after the buckets.
    """
    path.mkdir(parents=True, exist_ok=True)
    cols_payload = bytearray()
    for name, vt, is_array, shape, _vals in columns:
        cols_payload += _column_desc_frame(
            name, vt, is_array, shape, "IncrementalStMan", 1
        )
    desc = _Writer()
    desc.frame("TableDesc", 1, bytes(cols_payload))
    tab = _Writer()
    tab.uint(num_rows)
    tab.uint(0)
    tab.string("fake")
    tab.buf += desc.buf
    top = _Writer()
    top.frame("Table", 2, bytes(tab.buf))
    (path / "table.dat").write_bytes(bytes(top.buf))

    bucket_size = 2048
    starts = list(range(0, num_rows, bucket_rows))
    nbuckets = len(starts)

    hdr = _Writer()
    hp = _Writer()
    hp.uint(bucket_size)
    hp.uint(nbuckets)
    hdr.frame("IncrementalStMan", 3, bytes(hp.buf))
    blob = bytearray(hdr.buf)
    blob += b"\x00" * (512 - len(blob))

    for b, row0 in enumerate(starts):
        row1 = min(row0 + bucket_rows, num_rows)
        bucket = bytearray(bucket_size)
        data_off = 4
        per_col_index = []
        for name, vt, is_array, shape, vals in columns:
            rows, offs = [], []
            prev = None
            for r in range(row0, row1):
                cell = np.asarray(vals[r])
                if prev is not None and np.array_equal(cell, prev):
                    continue
                prev = cell
                rows.append(r - row0)
                offs.append(data_off)
                if vt == TP_BOOL:
                    raw = np.packbits(
                        cell.reshape(-1).astype(np.uint8),
                        bitorder="little",
                    ).tobytes()
                else:
                    flat = np.ascontiguousarray(cell).reshape(-1)
                    # Disk cells are Fortran order; 1-D cells and
                    # scalars are order-agnostic (test uses those).
                    raw = flat.astype(
                        flat.dtype.newbyteorder(">")
                    ).tobytes()
                bucket[data_off : data_off + len(raw)] = raw
                data_off += len(raw)
            per_col_index.append((rows, offs))
        idx_off = data_off
        struct.pack_into(">I", bucket, 0, idx_off)
        pos = idx_off
        for rows, offs in per_col_index:
            struct.pack_into(">I", bucket, pos, len(rows))
            pos += 4
            for v in rows:
                struct.pack_into(">I", bucket, pos, v)
                pos += 4
            for v in offs:
                struct.pack_into(">I", bucket, pos, v)
                pos += 4
        assert pos <= bucket_size
        blob += bucket

    # ISMIndex frame (version 1: uInt row boundaries), putBlock
    # framing [uInt n][values].
    ip = _Writer()
    ip.uint(nbuckets)
    ip.uint(nbuckets + 1)
    for row0 in starts:
        ip.uint(row0)
    ip.uint(num_rows)
    ip.uint(nbuckets)
    for b in range(nbuckets):
        ip.uint(b)
    idx = _Writer()
    idx.frame("ISMIndex", 1, bytes(ip.buf))
    blob += idx.buf
    (path / "table.f0").write_bytes(bytes(blob))
