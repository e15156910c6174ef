"""
Native casacore-table reader: plumbing tests + golden fixture gate.

The plumbing tests write format bytes with a minimal AipsIO/SSM
writer that mirrors the layout io/casacore_tables.py documents, then
read them back — this pins the reader's internal consistency (frame
handling, slab packing, Bool bit-packing, indirect cells, crop/order
conventions). BYTE-level agreement with real casacore-written files
is asserted by the ``ingest-casacore`` CI job against
``scripts/make_ms_fixture.py`` output; the golden test below runs
automatically once that fixture is checked into ``tests/data/``.
"""

import json
import struct
import tarfile
from pathlib import Path

import numpy as np
import pytest

from ska_sdp_cip_tpu.io.casacore_tables import (
    TP_BOOL,
    TP_COMPLEX,
    TP_DOUBLE,
    TP_FLOAT,
    CasacoreFormatError,
    read_table,
)

FIXTURE = Path(__file__).parent / "data" / "mini.ms.tar.gz"
GOLDEN = Path(__file__).parent / "data" / "mini.ms.golden.json"


# ----------------------------------------------------------------------
# Minimal AipsIO / table writer matching the documented layout
# ----------------------------------------------------------------------


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
    name, value_type, is_array, shape, dm_type, options
) -> bytes:
    w = _Writer()
    w.string("ArrayColumnDesc" if is_array else "ScalarColumnDesc")
    w.uint(1)  # payload version
    w.string(name)
    w.string("")  # comment
    w.string(dm_type)
    w.string("")  # group
    w.int_(value_type)
    w.int_(options)
    w.int_(len(shape))
    if is_array and shape:
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


# ----------------------------------------------------------------------
# Plumbing tests (self-consistent format)
# ----------------------------------------------------------------------


def test_read_direct_columns(tmp_path):
    rng = np.random.default_rng(3)
    nrow = 10
    uvw = rng.normal(size=(nrow, 3))
    time = rng.normal(size=nrow)
    flag = rng.random((nrow, 4, 2)) < 0.5
    columns = [
        ("UVW", TP_DOUBLE, True, (3,), 5, uvw),
        ("TIME", TP_DOUBLE, False, (), 0, time),
        ("FLAG", TP_BOOL, True, (2, 4), 5, flag),
    ]
    _write_fake_table(tmp_path / "t.tbl", columns, nrow)
    tbl = read_table(tmp_path / "t.tbl")
    assert tbl.num_rows == nrow
    assert set(tbl.columns) == {"UVW", "TIME", "FLAG"}
    np.testing.assert_array_equal(tbl.getcol("UVW"), uvw)
    np.testing.assert_array_equal(tbl.getcol("TIME"), time)
    np.testing.assert_array_equal(tbl.getcol("FLAG"), flag)


def test_read_indirect_complex_column(tmp_path):
    rng = np.random.default_rng(4)
    nrow, nchan = 6, 3
    data = (
        rng.normal(size=(nrow, nchan, 4))
        + 1j * rng.normal(size=(nrow, nchan, 4))
    ).astype(np.complex64)
    wgt = rng.uniform(0.5, 2.0, (nrow, 4)).astype(np.float32)
    columns = [
        ("DATA", TP_COMPLEX, True, (4, nchan), 0, data),
        ("WEIGHT", TP_FLOAT, True, (4,), 0, wgt),
    ]
    _write_fake_table(tmp_path / "t.tbl", columns, nrow)
    tbl = read_table(tmp_path / "t.tbl")
    np.testing.assert_array_equal(tbl.getcol("DATA"), data)
    np.testing.assert_array_equal(tbl.getcol("WEIGHT"), wgt)


def test_garbage_fails_loudly(tmp_path):
    ms = tmp_path / "bad.ms"
    ms.mkdir()
    (ms / "table.dat").write_bytes(b"\x00" * 64)
    with pytest.raises(CasacoreFormatError):
        read_table(ms)


# ----------------------------------------------------------------------
# Golden fixture (auto-enabled once CI artifacts are checked in)
# ----------------------------------------------------------------------


@pytest.mark.skipif(
    not (FIXTURE.exists() and GOLDEN.exists()),
    reason="casacore-written fixture not checked in yet "
    "(produced by the ingest-casacore CI job)",
)
def test_golden_fixture_columns(tmp_path):
    import base64
    import io as iolib

    with tarfile.open(FIXTURE) as tar:
        tar.extractall(tmp_path)
    tbl = read_table(tmp_path / "mini.ms")
    golden = json.loads(GOLDEN.read_text())
    assert tbl.num_rows == golden["num_rows"]
    for name, b64 in golden["columns"].items():
        want = np.load(iolib.BytesIO(base64.b64decode(b64)))
        got = tbl.getcol(name)
        np.testing.assert_array_equal(got, want, err_msg=name)


def _write_fake_ms(ms_path: Path) -> dict:
    """A miniature MSv2-shaped table tree in the documented format."""
    rng = np.random.default_rng(21)
    nrow, nchan = 12, 3
    uvw = rng.normal(size=(nrow, 3))
    time = 5e9 + np.arange(nrow, dtype=float)
    data = (
        rng.normal(size=(nrow, nchan, 4))
        + 1j * rng.normal(size=(nrow, nchan, 4))
    ).astype(np.complex64)
    flag = rng.random((nrow, nchan, 4)) < 0.2
    wspec = rng.uniform(0.5, 2.0, (nrow, nchan, 4)).astype(np.float32)
    chan_freq = np.linspace(1.0e9, 1.1e9, nchan)
    corr = np.array([9, 10, 11, 12], np.int32)

    _write_fake_table(
        ms_path,
        [
            ("UVW", TP_DOUBLE, True, (3,), 5, uvw),
            ("TIME", TP_DOUBLE, False, (), 0, time),
            ("DATA", TP_COMPLEX, True, (4, nchan), 0, data),
            ("FLAG", TP_BOOL, True, (4, nchan), 0, flag),
            ("WEIGHT_SPECTRUM", TP_FLOAT, True, (4, nchan), 0, wspec),
        ],
        nrow,
    )
    from ska_sdp_cip_tpu.io.casacore_tables import TP_INT

    _write_fake_table(
        ms_path / "SPECTRAL_WINDOW",
        [
            ("CHAN_FREQ", TP_DOUBLE, True, (nchan,), 0, chan_freq[None]),
            ("NUM_CHAN", TP_INT, False, (), 0, np.array([nchan])),
        ],
        1,
    )
    _write_fake_table(
        ms_path / "POLARIZATION",
        [
            ("CORR_TYPE", TP_INT, True, (4,), 0, corr[None]),
            ("NUM_CORR", TP_INT, False, (), 0, np.array([4])),
        ],
        1,
    )
    _write_fake_table(
        ms_path / "FIELD",
        [("SOURCE_ID", TP_INT, False, (), 0, np.zeros(1, np.int32))],
        1,
    )
    return {
        "uvw": uvw,
        "time": time,
        "data": data,
        "flag": flag,
        "weight_spectrum": wspec,
        "chan_freq": chan_freq,
    }


def test_ms_to_vz_without_casacore(tmp_path, monkeypatch):
    """
    The full MSv2 -> VZ ingest runs with python-casacore ABSENT,
    through the native reader (SURVEY 2b row 2's acceptance:
    'ms_to_vz works with python-casacore absent').
    """
    import sys

    monkeypatch.setitem(sys.modules, "casacore", None)
    monkeypatch.setitem(sys.modules, "casacore.tables", None)

    ms_path = tmp_path / "native.ms"
    truth = _write_fake_ms(ms_path)

    from ska_sdp_cip_tpu.io.ms_ingest import ms_to_vz
    from ska_sdp_cip_tpu.io.visibility_dataset import VisibilityReader

    vz = ms_to_vz(ms_path, tmp_path / "native.vz")
    reader = VisibilityReader(vz)
    np.testing.assert_array_equal(reader.uvw(), truth["uvw"])
    np.testing.assert_array_equal(
        reader.visibilities(), truth["data"]
    )
    np.testing.assert_array_equal(reader.flags(), truth["flag"])
    np.testing.assert_array_equal(
        reader.weights(), truth["weight_spectrum"]
    )
    np.testing.assert_array_equal(
        reader.channel_frequencies(), truth["chan_freq"]
    )


def test_read_tiled_column(tmp_path):
    """TiledColumnStMan cube decode (self-consistent fixture)."""
    rng = np.random.default_rng(6)
    nrow, nchan = 10, 5
    data = (
        rng.normal(size=(nrow, nchan, 4))
        + 1j * rng.normal(size=(nrow, nchan, 4))
    ).astype(np.complex64)
    # Main table frame binds DATA to a TiledColumnStMan instance.
    path = tmp_path / "tsm.tbl"
    _write_fake_table(path, [], nrow)  # writes table.dat scaffold

    # Overwrite table.dat with a DATA column bound to TSM.
    cols = _column_desc_frame(
        "DATA", TP_COMPLEX, True, (4, nchan), "TiledColumnStMan", 5
    )
    desc = _Writer()
    desc.frame("TableDesc", 1, bytes(cols))
    tab = _Writer()
    tab.uint(nrow)
    tab.uint(0)
    tab.string("fake")
    tab.buf += desc.buf
    top = _Writer()
    top.frame("Table", 2, bytes(tab.buf))
    (path / "table.dat").write_bytes(bytes(top.buf))

    # TSM header: manager frame + tile-shape IPosition (casacore
    # order, cell + row axis), tile (4, nchan, 4 rows).
    tile = (4, nchan, 4)
    hdr = _Writer()
    hp = _Writer()
    ip = _Writer()
    ip.uint(len(tile))
    for d in tile:
        ip.buf += struct.pack(">q", d)
    ipf = _Writer()
    ipf.frame("IPosition", 2, bytes(ip.buf))
    hp.buf += ipf.buf
    hdr.frame("TiledColumnStMan", 1, bytes(hp.buf))
    (path / "table.f0").write_bytes(bytes(hdr.buf))

    # Cube: Fortran grid of Fortran tiles over (4, nchan, nrow).
    cube = np.zeros((4, nchan, nrow), np.complex64)
    cube[...] = np.transpose(data, (2, 1, 0))
    ntiles = [1, 1, -(-nrow // tile[2])]
    blob = bytearray()
    padded = np.zeros(
        (4, nchan, ntiles[2] * tile[2]), np.complex64
    )
    padded[:, :, :nrow] = cube
    for tz in range(ntiles[2]):
        block = padded[:, :, tz * tile[2] : (tz + 1) * tile[2]]
        blob += (
            block.ravel(order="F").astype(">c8").tobytes()
        )
    (path / "table.f0_TSM0").write_bytes(bytes(blob))

    tbl = read_table(path)
    got = tbl.getcol("DATA")
    np.testing.assert_array_equal(got, data)


# ----------------------------------------------------------------------
# IncrementalStMan plumbing (self-consistent format)
# ----------------------------------------------------------------------


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


def test_read_ism_columns(tmp_path):
    """Scalar double/int/bool + fixed-shape array columns bound to
    IncrementalStMan, change-point storage over several buckets."""
    rng = np.random.default_rng(11)
    nrow = 23
    # Slowly-varying values with runs (the layout ISM exists for)
    time_vals = np.repeat(
        5e9 + np.arange(6) * 30.0, 4
    )[:nrow]
    field = np.repeat([0, 1, 0], 8)[:nrow].astype(np.int32)
    flag_row = (np.arange(nrow) % 7 == 3)
    uvw = np.repeat(
        rng.normal(size=(5, 3)), 5, axis=0
    )[:nrow]

    path = tmp_path / "fake_ism.tbl"
    _write_fake_ism_table(
        path,
        nrow,
        bucket_rows=8,
        columns=[
            ("TIME", TP_DOUBLE, False, (), time_vals),
            ("FIELD_ID", 5, False, (), field),  # TP_INT
            ("FLAG_ROW", TP_BOOL, False, (), flag_row),
            ("UVW", TP_DOUBLE, True, (3,), uvw),
        ],
    )
    tbl = read_table(path)
    np.testing.assert_array_equal(tbl.getcol("TIME"), time_vals)
    np.testing.assert_array_equal(tbl.getcol("FIELD_ID"), field)
    np.testing.assert_array_equal(tbl.getcol("FLAG_ROW"), flag_row)
    np.testing.assert_allclose(tbl.getcol("UVW"), uvw)


def test_ism_rejects_variable_shape(tmp_path):
    path = tmp_path / "fake_ism_var.tbl"
    _write_fake_ism_table(
        path,
        4,
        bucket_rows=4,
        columns=[("TIME", TP_DOUBLE, False, (), np.arange(4.0))],
    )
    # Rewrite table.dat with a variable-shape array column bound to ISM
    cols_payload = bytearray(
        _column_desc_frame(
            "BLOB", TP_DOUBLE, True, (), "IncrementalStMan", 0
        )
    )
    desc = _Writer()
    desc.frame("TableDesc", 1, bytes(cols_payload))
    tab = _Writer()
    tab.uint(4)
    tab.uint(0)
    tab.string("fake")
    tab.buf += desc.buf
    top = _Writer()
    top.frame("Table", 2, bytes(tab.buf))
    (path / "table.dat").write_bytes(bytes(top.buf))
    tbl = read_table(path)
    with pytest.raises(CasacoreFormatError, match="variable-shape"):
        tbl.getcol("BLOB")
