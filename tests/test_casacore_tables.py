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


from helpers.casacore_writer import (  # noqa: E402
    _column_desc_frame,
    _Writer,
    _write_fake_ism_table,
    _write_fake_table,
)


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


def test_read_tiled_shape(tmp_path):
    """TiledShapeStMan single-hypercube decode: variable-shape DATA
    column (ndim known, no fixed shape), cube + tile shapes recovered
    from the manager header, same Fortran tile-grid layout as TCSM."""
    rng = np.random.default_rng(9)
    nrow, nchan = 11, 5
    data = (
        rng.normal(size=(nrow, nchan, 4))
        + 1j * rng.normal(size=(nrow, nchan, 4))
    ).astype(np.complex64)
    path = tmp_path / "tssm.tbl"
    _write_fake_table(path, [], nrow)

    # DATA bound to TiledShapeStMan, declared variable-shape (ndim=2).
    cols = _column_desc_frame(
        "DATA", TP_COMPLEX, True, (), "TiledShapeStMan", 0, ndim=2
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

    # TSSM header: manager frame holding the hypercube shape
    # (cell + row axis) and the tile shape.
    cube = (4, nchan, nrow)
    tile = (4, nchan, 4)
    hp = _Writer()
    for shape in (cube, tile):
        ip = _Writer()
        ip.uint(len(shape))
        for d in shape:
            ip.buf += struct.pack(">q", d)
        ipf = _Writer()
        ipf.frame("IPosition", 2, bytes(ip.buf))
        hp.buf += ipf.buf
    hdr = _Writer()
    hdr.frame("TiledShapeStMan", 1, bytes(hp.buf))
    (path / "table.f0").write_bytes(bytes(hdr.buf))

    # Cube blob: Fortran grid of Fortran tiles over (4, nchan, nrow).
    cube_arr = np.transpose(data, (2, 1, 0))
    ntiles_row = -(-nrow // tile[2])
    padded = np.zeros(
        (4, nchan, ntiles_row * tile[2]), np.complex64
    )
    padded[:, :, :nrow] = cube_arr
    blob = bytearray()
    for tz in range(ntiles_row):
        block = padded[:, :, tz * tile[2] : (tz + 1) * tile[2]]
        blob += block.ravel(order="F").astype(">c8").tobytes()
    (path / "table.f0_TSM0").write_bytes(bytes(blob))

    tbl = read_table(path)
    got = tbl.getcol("DATA")
    np.testing.assert_array_equal(got, data)


def test_tiled_shape_multi_cube_rejected(tmp_path):
    """Two distinct rank-3 cube candidates (neither matching the row
    count) must raise, not silently decode the wrong hypercube."""
    nrow = 7
    path = tmp_path / "tssm_bad.tbl"
    _write_fake_table(path, [], nrow)
    cols = _column_desc_frame(
        "DATA", TP_COMPLEX, True, (), "TiledShapeStMan", 0, ndim=2
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
    # Header with two cubes of rank 3 whose row axes sum to nrow —
    # a genuine multi-shape TSSM (4 and 3 rows of different nchan).
    hp = _Writer()
    for shape in ((4, 5, 4), (4, 8, 3), (4, 5, 2)):
        ip = _Writer()
        ip.uint(len(shape))
        for d in shape:
            ip.buf += struct.pack(">q", d)
        ipf = _Writer()
        ipf.frame("IPosition", 2, bytes(ip.buf))
        hp.buf += ipf.buf
    hdr = _Writer()
    hdr.frame("TiledShapeStMan", 1, bytes(hp.buf))
    (path / "table.f0").write_bytes(bytes(hdr.buf))
    (path / "table.f0_TSM0").write_bytes(b"\0" * 1024)
    tbl = read_table(path)
    with pytest.raises(CasacoreFormatError, match="hypercube"):
        tbl.getcol("DATA")


# ----------------------------------------------------------------------
# IncrementalStMan plumbing (self-consistent format)
# ----------------------------------------------------------------------


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


# ----------------------------------------------------------------------
# Frozen-bytes golden fixture (always on)
# ----------------------------------------------------------------------

SYNTH_FIXTURE = Path(__file__).parent / "data" / "synthetic_ms.tar.gz"
SYNTH_GOLDEN = (
    Path(__file__).parent / "data" / "synthetic_ms.golden.json"
)


def _b64_to_npy(b64: str) -> np.ndarray:
    import base64
    import io as iolib

    return np.load(iolib.BytesIO(base64.b64decode(b64)))


def test_frozen_fixture_columns(tmp_path):
    """
    The reader against FIXED bytes checked into tests/data/
    (scripts/make_offline_fixture.py): a reader regression fails even
    if the in-repo writer would have drifted with it. These are
    writer-reconstructed bytes; the ingest-casacore CI job remains the
    authority on real casacore output.
    """
    with tarfile.open(SYNTH_FIXTURE) as tar:
        tar.extractall(tmp_path, filter="data")
    golden = json.loads(SYNTH_GOLDEN.read_text())

    ssm = read_table(tmp_path / "ssm.ms")
    assert ssm.num_rows == golden["num_rows"]
    for name, b64 in golden["ssm"].items():
        np.testing.assert_array_equal(
            ssm.getcol(name), _b64_to_npy(b64), err_msg=f"ssm {name}"
        )
    np.testing.assert_array_equal(
        ssm.subtable("SPECTRAL_WINDOW")
        .getcol("CHAN_FREQ")
        .reshape(-1),
        _b64_to_npy(
            golden["ssm_subtables"]["SPECTRAL_WINDOW/CHAN_FREQ"]
        ).reshape(-1),
    )
    np.testing.assert_array_equal(
        ssm.subtable("POLARIZATION").getcol("CORR_TYPE").reshape(-1),
        _b64_to_npy(
            golden["ssm_subtables"]["POLARIZATION/CORR_TYPE"]
        ).reshape(-1),
    )

    ism = read_table(tmp_path / "ism.ms")
    for name, b64 in golden["ism"].items():
        np.testing.assert_array_equal(
            ism.getcol(name), _b64_to_npy(b64), err_msg=f"ism {name}"
        )

    tsm = read_table(tmp_path / "tsm.ms")
    np.testing.assert_array_equal(
        tsm.getcol("DATA"), _b64_to_npy(golden["tsm"]["DATA"])
    )

    tssm = read_table(tmp_path / "tssm.ms")
    np.testing.assert_array_equal(
        tssm.getcol("DATA"), _b64_to_npy(golden["tssm"]["DATA"])
    )
