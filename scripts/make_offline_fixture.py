"""
Freeze a synthetic casacore-format MS fixture into ``tests/data/``.

The build environment has neither python-casacore nor network access,
so REAL casacore-written bytes cannot be produced here — those come
from the ``ingest-casacore`` CI job (scripts/make_ms_fixture.py) and
supersede this fixture when checked in as ``tests/data/mini.ms.tar.gz``.
Until then, this script freezes the minimal-writer output
(tests/helpers/casacore_writer.py — same documented layout the reader
implements, INCLUDING multi-bucket SSM/ISM and TSM cube variants) so
the always-on golden test pins the reader against FIXED bytes: a
reader regression fails even if the writer would have drifted with it.

Usage: python scripts/make_offline_fixture.py
Writes tests/data/synthetic_ms.tar.gz + synthetic_ms.golden.json.
"""

import base64
import io
import json
import struct
import sys
import tarfile
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

from ska_sdp_cip_tpu.io.casacore_tables import (  # noqa: E402
    TP_BOOL,
    TP_COMPLEX,
    TP_DOUBLE,
    TP_FLOAT,
    TP_INT,
)

from helpers.casacore_writer import (  # noqa: E402
    _write_fake_ism_table,
    _write_fake_table,
    _Writer,
)


def _b64_npy(array: np.ndarray) -> str:
    buf = io.BytesIO()
    np.save(buf, np.ascontiguousarray(array))
    return base64.b64encode(buf.getvalue()).decode()


def _write_tsm_table(path: Path, data: np.ndarray, nchan: int) -> None:
    """DATA bound to TiledColumnStMan (cube layout)."""
    from helpers.casacore_writer import _column_desc_frame

    nrow = len(data)
    path.mkdir(parents=True, exist_ok=True)
    cols_payload = bytearray(
        _column_desc_frame(
            "DATA", TP_COMPLEX, True, (4, nchan), "TiledColumnStMan", 1
        )
    )
    desc = _Writer()
    desc.frame("TableDesc", 1, bytes(cols_payload))
    tab = _Writer()
    tab.uint(nrow)
    tab.uint(0)
    tab.string("fake")
    tab.buf += desc.buf
    top = _Writer()
    top.frame("Table", 2, bytes(tab.buf))
    (path / "table.dat").write_bytes(bytes(top.buf))

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

    cube = np.transpose(data, (2, 1, 0))  # (4, nchan, nrow) Fortran
    ntz = -(-nrow // tile[2])
    padded = np.zeros((4, nchan, ntz * tile[2]), np.complex64)
    padded[:, :, :nrow] = cube
    blob = bytearray()
    for tz in range(ntz):
        block = padded[:, :, tz * tile[2] : (tz + 1) * tile[2]]
        blob += block.ravel(order="F").astype(">c8").tobytes()
    (path / "table.f0_TSM0").write_bytes(bytes(blob))


def _write_tssm_table(path: Path, data: np.ndarray, nchan: int) -> None:
    """DATA bound to TiledShapeStMan: variable-shape column desc
    (ndim=2, no fixed shape), cube + tile shapes in the manager
    header, single hypercube (one cell shape for all rows)."""
    from helpers.casacore_writer import _column_desc_frame

    nrow = len(data)
    path.mkdir(parents=True, exist_ok=True)
    cols_payload = bytearray(
        _column_desc_frame(
            "DATA", TP_COMPLEX, True, (), "TiledShapeStMan", 0, ndim=2
        )
    )
    desc = _Writer()
    desc.frame("TableDesc", 1, bytes(cols_payload))
    tab = _Writer()
    tab.uint(nrow)
    tab.uint(0)
    tab.string("fake")
    tab.buf += desc.buf
    top = _Writer()
    top.frame("Table", 2, bytes(tab.buf))
    (path / "table.dat").write_bytes(bytes(top.buf))

    cube_shape = (4, nchan, nrow)
    tile = (4, nchan, 4)
    hp = _Writer()
    for shape in (cube_shape, tile):
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

    cube = np.transpose(data, (2, 1, 0))  # (4, nchan, nrow) Fortran
    ntz = -(-nrow // tile[2])
    padded = np.zeros((4, nchan, ntz * tile[2]), np.complex64)
    padded[:, :, :nrow] = cube
    blob = bytearray()
    for tz in range(ntz):
        block = padded[:, :, tz * tile[2] : (tz + 1) * tile[2]]
        blob += block.ravel(order="F").astype(">c8").tobytes()
    (path / "table.f0_TSM0").write_bytes(bytes(blob))


def main() -> None:
    outdir = REPO / "tests" / "data"
    outdir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(2026)
    nrow, nchan = 20, 3

    uvw = rng.normal(scale=400.0, size=(nrow, 3))
    time = 5.1e9 + np.repeat(np.arange(5) * 10.0, 4)[:nrow]
    data = (
        rng.normal(size=(nrow, nchan, 4))
        + 1j * rng.normal(size=(nrow, nchan, 4))
    ).astype(np.complex64)
    flag = rng.random((nrow, nchan, 4)) < 0.15
    wspec = rng.uniform(0.5, 2.0, (nrow, nchan, 4)).astype(np.float32)
    field = np.repeat([0, 1], 10)[:nrow].astype(np.int32)
    flag_row = (np.arange(nrow) % 6 == 2)
    chan_freq = np.linspace(1.3e9, 1.4e9, nchan)
    corr = np.array([9, 10, 11, 12], np.int32)

    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        root = Path(tmp)
        # SSM-bound main table (direct + indirect columns)
        _write_fake_table(
            root / "ssm.ms",
            [
                ("UVW", TP_DOUBLE, True, (3,), 5, uvw),
                ("TIME", TP_DOUBLE, False, (), 0, time),
                ("DATA", TP_COMPLEX, True, (4, nchan), 0, data),
                ("FLAG", TP_BOOL, True, (4, nchan), 0, flag),
                (
                    "WEIGHT_SPECTRUM",
                    TP_FLOAT,
                    True,
                    (4, nchan),
                    0,
                    wspec,
                ),
            ],
            nrow,
        )
        _write_fake_table(
            root / "ssm.ms" / "SPECTRAL_WINDOW",
            [
                (
                    "CHAN_FREQ",
                    TP_DOUBLE,
                    True,
                    (nchan,),
                    0,
                    chan_freq[None],
                ),
                ("NUM_CHAN", TP_INT, False, (), 0, np.array([nchan])),
            ],
            1,
        )
        _write_fake_table(
            root / "ssm.ms" / "POLARIZATION",
            [
                ("CORR_TYPE", TP_INT, True, (4,), 0, corr[None]),
                ("NUM_CORR", TP_INT, False, (), 0, np.array([4])),
            ],
            1,
        )
        # ISM-bound change-point table (multi-bucket)
        _write_fake_ism_table(
            root / "ism.ms",
            nrow,
            bucket_rows=7,
            columns=[
                ("TIME", TP_DOUBLE, False, (), time),
                ("FIELD_ID", TP_INT, False, (), field),
                ("FLAG_ROW", TP_BOOL, False, (), flag_row),
                ("UVW", TP_DOUBLE, True, (3,), uvw),
            ],
        )
        # TSM-bound cube table
        _write_tsm_table(root / "tsm.ms", data, nchan)
        # TSSM-bound cube table (variable-shape desc, single cube)
        _write_tssm_table(root / "tssm.ms", data, nchan)

        with tarfile.open(outdir / "synthetic_ms.tar.gz", "w:gz") as tar:
            for name in ("ssm.ms", "ism.ms", "tsm.ms", "tssm.ms"):
                tar.add(root / name, arcname=name)

    golden = {
        "num_rows": nrow,
        "ssm": {
            "UVW": _b64_npy(uvw),
            "TIME": _b64_npy(time),
            "DATA": _b64_npy(data),
            "FLAG": _b64_npy(flag),
            "WEIGHT_SPECTRUM": _b64_npy(wspec),
        },
        "ssm_subtables": {
            "SPECTRAL_WINDOW/CHAN_FREQ": _b64_npy(chan_freq),
            "POLARIZATION/CORR_TYPE": _b64_npy(corr),
        },
        "ism": {
            "TIME": _b64_npy(time),
            "FIELD_ID": _b64_npy(field),
            "FLAG_ROW": _b64_npy(flag_row),
            "UVW": _b64_npy(uvw),
        },
        "tsm": {"DATA": _b64_npy(data)},
        "tssm": {"DATA": _b64_npy(data)},
    }
    (outdir / "synthetic_ms.golden.json").write_text(
        json.dumps(golden)
    )
    print(f"fixture frozen into {outdir}")


if __name__ == "__main__":
    main()
