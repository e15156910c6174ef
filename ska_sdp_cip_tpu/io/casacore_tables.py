"""
Casacore-free reader for the casacore Table Data System (MSv2 subset).

The reference delegates every MeasurementSet read to python-casacore
(reference: src/ska_sdp_cip/measurement_set.py:8,19-31) — a C++ stack
that is not installable on typical TPU hosts. This module reads the
on-disk casacore table format directly, covering the subset an MSv2
ingest needs (SURVEY 2b row 2):

* ``table.dat``     — AipsIO-serialized table header: row count,
                      TableDesc (column names/types/shapes), data
                      manager registrations and column bindings.
* ``table.f<seq>``  — StandardStMan (SSM) bucket files holding
                      direct scalar/array column data (Bool
                      bit-packed) plus per-row offsets for indirect
                      cells in the aux array file.
* subtable directories (SPECTRAL_WINDOW, POLARIZATION, FIELD, ...).

TiledColumnStMan hypercubes decode through :class:`TSMFile`;
TiledShapeStMan (the manager the CASA filler commonly binds for
DATA/FLAG on real observatory MSs) decodes through :class:`TSSMFile`
for the single-hypercube case (one cell shape for every row — what
the MS layout validation implies); IncrementalStMan change-point
columns (TIME, FIELD_ID, UVW, ... in CASA-written MSs) decode
through :class:`ISMFile`. Multi-shape TSSM and string/variable-shape
ISM columns are detected and rejected with a clear error (MSs
binding those must be ingested where python-casacore is available,
for now).

Format ground truth
-------------------

This environment has neither python-casacore nor network access, so
no real casacore-written bytes exist here to validate against. The
layout implemented below is reconstructed from the casacore sources
(casa/IO/AipsIO.cc, tables/Tables/{Table,PlainTable,TableDesc,
ColumnSet}.cc, tables/DataMan/{SSMBase,SSMIndex,ISMBase}.cc) and is
validated BYTE-EXACTLY in the ``ingest-casacore`` CI job
(.github/workflows/ci.yml): the job writes a miniature MS with
python-casacore (scripts/make_ms_fixture.py), reads every column with
BOTH readers, and asserts equality. Every structural assumption below
raises :class:`CasacoreFormatError` with file offset context on
mismatch, so a format drift fails loudly rather than returning
garbage. Until the CI fixture is checked into ``tests/data/``, local
tests exercise the parser plumbing only.

The hot data path (bucket decode) is vectorized numpy over mmapped
buckets; ingest is one-shot (MSv2 -> VZ) so this is not a steady-state
cost (the VZ columnar store is the hot-path format).
"""

from __future__ import annotations


import struct
from dataclasses import dataclass, field
from pathlib import Path

import numpy as np

__all__ = [
    "CasacoreFormatError",
    "CasacoreTable",
    "read_table",
]


class CasacoreFormatError(RuntimeError):
    """A structural assumption about the casacore format failed."""


# casa/Utilities/DataType.h enum order.
TP_BOOL = 0
TP_CHAR = 1
TP_UCHAR = 2
TP_SHORT = 3
TP_USHORT = 4
TP_INT = 5
TP_UINT = 6
TP_FLOAT = 7
TP_DOUBLE = 8
TP_COMPLEX = 9
TP_DCOMPLEX = 10
TP_STRING = 11
TP_TABLE = 12
_TP_ARRAY_OFFSET = 13  # TpArrayBool == TpBool + 13
TP_RECORD = 25
TP_OTHER = 26
TP_INT64 = 28

#: Canonical (big-endian) element dtypes by scalar type code.
_DTYPES = {
    TP_BOOL: np.dtype("u1"),
    TP_UCHAR: np.dtype("u1"),
    TP_SHORT: np.dtype(">i2"),
    TP_USHORT: np.dtype(">u2"),
    TP_INT: np.dtype(">i4"),
    TP_UINT: np.dtype(">u4"),
    TP_FLOAT: np.dtype(">f4"),
    TP_DOUBLE: np.dtype(">f8"),
    TP_COMPLEX: np.dtype(">c8"),
    TP_DCOMPLEX: np.dtype(">c16"),
    TP_INT64: np.dtype(">i8"),
}


class AipsIOReader:
    """
    Sequential reader of a canonical (big-endian) AipsIO stream.

    Framing (casa/IO/AipsIO.cc): every object is
    ``[uInt length][String type][uInt version] ... payload ...`` where
    ``length`` counts the bytes following the length field through the
    matching putend, and the top-level object is preceded by a magic
    uInt. The magic value is not asserted (it is recorded) because
    only the relative framing matters for decoding; the CI equality
    job is the authority on real files.
    """

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    # -- primitives ---------------------------------------------------
    def _take(self, n: int) -> bytes:
        if self.pos + n > len(self.data):
            raise CasacoreFormatError(
                f"unexpected EOF at offset {self.pos} (+{n})"
            )
        out = self.data[self.pos : self.pos + n]
        self.pos += n
        return out

    def get_uint(self) -> int:
        return struct.unpack(">I", self._take(4))[0]

    def get_int(self) -> int:
        return struct.unpack(">i", self._take(4))[0]

    def get_short(self) -> int:
        return struct.unpack(">h", self._take(2))[0]

    def get_int64(self) -> int:
        return struct.unpack(">q", self._take(8))[0]

    def get_bool(self) -> bool:
        return self._take(1) != b"\x00"

    def get_float(self) -> float:
        return struct.unpack(">f", self._take(4))[0]

    def get_double(self) -> float:
        return struct.unpack(">d", self._take(8))[0]

    def get_string(self, max_len: int = 1 << 20) -> str:
        n = self.get_uint()
        if n > max_len:
            raise CasacoreFormatError(
                f"implausible string length {n} at offset {self.pos - 4}"
            )
        return self._take(n).decode("latin-1")

    # -- object framing -----------------------------------------------
    def getstart(self, expected: str | None = None) -> tuple[str, int, int]:
        """
        Read an object header; returns (type, version, end_offset).
        ``end_offset`` is the absolute offset just past the object
        (derived from the patched length field).
        """
        length_at = self.pos
        length = self.get_uint()
        typ = self.get_string(max_len=4096)
        version = self.get_uint()
        if expected is not None and typ != expected:
            raise CasacoreFormatError(
                f"expected object {expected!r}, found {typ!r} at "
                f"offset {length_at}"
            )
        return typ, version, length_at + 4 + length

    def skip_to(self, offset: int) -> None:
        if offset < self.pos or offset > len(self.data):
            raise CasacoreFormatError(
                f"bad skip target {offset} (pos {self.pos})"
            )
        self.pos = offset

    # -- composite values ---------------------------------------------
    def get_iposition(self) -> tuple[int, ...]:
        # IPosition::putFile — framed object with uInt size + elements.
        _, version, end = self.getstart("IPosition")
        n = self.get_uint()
        if n > 16:
            raise CasacoreFormatError(f"implausible IPosition rank {n}")
        if version >= 2:
            dims = tuple(self.get_int64() for _ in range(n))
        else:
            dims = tuple(self.get_int() for _ in range(n))
        self.skip_to(end)
        return dims

    def get_scalar(self, tp: int):
        if tp == TP_BOOL:
            return self.get_bool()
        if tp in (TP_CHAR, TP_UCHAR):
            return self._take(1)[0]
        if tp == TP_SHORT:
            return self.get_short()
        if tp == TP_USHORT:
            return struct.unpack(">H", self._take(2))[0]
        if tp == TP_INT:
            return self.get_int()
        if tp == TP_UINT:
            return self.get_uint()
        if tp == TP_INT64:
            return self.get_int64()
        if tp == TP_FLOAT:
            return self.get_float()
        if tp == TP_DOUBLE:
            return self.get_double()
        if tp == TP_COMPLEX:
            return complex(self.get_float(), self.get_float())
        if tp == TP_DCOMPLEX:
            return complex(self.get_double(), self.get_double())
        if tp == TP_STRING:
            return self.get_string()
        raise CasacoreFormatError(f"unsupported scalar type {tp}")


#: ColumnDesc::Option flags (tables/Tables/ColumnDesc.h).
OPT_DIRECT = 1
OPT_UNDEFINED = 2
OPT_FIXEDSHAPE = 4


@dataclass
class ColumnDesc:
    """One column of a TableDesc (the subset ingest cares about)."""

    name: str
    value_type: int
    is_array: bool
    ndim: int
    shape: tuple[int, ...]
    data_manager_type: str
    data_manager_group: str
    options: int

    @property
    def is_direct(self) -> bool:
        """Direct arrays inline their cells in the manager's buckets;
        anything else stores a per-row offset into the aux array file
        (StIndArray / StManArrayFile)."""
        return (not self.is_array) or bool(self.options & OPT_DIRECT)


@dataclass
class DataManagerBinding:
    """One registered data manager instance and its bound columns."""

    kind: str  # e.g. "StandardStMan", "IncrementalStMan"
    seqnr: int
    group: str = ""
    #: Bound columns IN BINDING ORDER (= TableDesc order, which is
    #: the order casacore adds unbound columns to the instance).
    column_descs: list["ColumnDesc"] = field(default_factory=list)

    @property
    def columns(self) -> list[str]:
        return [c.name for c in self.column_descs]


@dataclass
class CasacoreTable:
    """
    Read-only view of one casacore table directory. Column data is
    decoded on demand by :meth:`getcol`.
    """

    path: Path
    num_rows: int
    columns: dict[str, ColumnDesc]
    managers: list[DataManagerBinding]
    subtables: dict[str, Path]

    def getcol(self, name: str) -> np.ndarray:
        """Full column as numpy (row-major, native byte order)."""
        desc = self.columns.get(name)
        if desc is None:
            raise KeyError(f"no column {name!r} in {self.path}")
        binding = self._binding_for(name)
        if binding.kind == "StandardStMan":
            reader = SSMFile(
                self.path / f"table.f{binding.seqnr}",
                self.num_rows,
                binding,
            )
            return reader.read_column(desc)
        if binding.kind == "TiledColumnStMan":
            reader = TSMFile(
                self.path / f"table.f{binding.seqnr}",
                self.num_rows,
                binding,
            )
            return reader.read_column(desc)
        if binding.kind == "TiledShapeStMan":
            reader = TSSMFile(
                self.path / f"table.f{binding.seqnr}",
                self.num_rows,
                binding,
            )
            return reader.read_column(desc)
        if binding.kind == "IncrementalStMan":
            reader = ISMFile(
                self.path / f"table.f{binding.seqnr}",
                self.num_rows,
                binding,
            )
            return reader.read_column(desc)
        raise CasacoreFormatError(
            f"column {name!r} uses unsupported data manager "
            f"{binding.kind!r}"
        )

    def subtable(self, name: str) -> "CasacoreTable":
        sub = self.subtables.get(name, self.path / name)
        return read_table(sub)

    def _binding_for(self, name: str) -> DataManagerBinding:
        for binding in self.managers:
            if name in binding.columns:
                return binding
        raise CasacoreFormatError(
            f"column {name!r} has no data manager binding "
            f"(managers: {[m.kind for m in self.managers]})"
        )


def read_table(path) -> CasacoreTable:
    """Parse ``<path>/table.dat`` into a :class:`CasacoreTable`."""
    path = Path(path)
    dat = path / "table.dat"
    if not dat.exists():
        raise FileNotFoundError(dat)
    data = dat.read_bytes()
    return _TableDatParser(data, path).parse()


class _TableDatParser:
    """
    table.dat = [magic uInt] + AipsIO "Table" object containing the
    row count, the TableDesc, and the ColumnSet (data manager
    registrations + per-column bindings). The exact nesting is
    version-dependent; this parser reads the fields it understands in
    order and uses the framed object lengths to skip the rest
    (keyword sets, per-column keyword records, DM private state).
    """

    def __init__(self, data: bytes, path: Path):
        self.path = path
        self.io = AipsIOReader(data)

    def parse(self) -> CasacoreTable:
        io = self.io
        # Top level: optional magic uInt before the "Table" frame.
        # Sniff: a frame starts [len][strlen=5]"Table"; check both
        # offset 0 and offset 4.
        if not self._frame_at(0, b"Table"):
            if self._frame_at(4, b"Table"):
                io.pos = 4
            else:
                raise CasacoreFormatError(
                    "no AipsIO 'Table' frame at offset 0 or 4 of "
                    f"{self.path}/table.dat"
                )
        _, tab_version, _tab_end = io.getstart("Table")
        num_rows = io.get_uint()
        _format = io.get_uint()
        _name = io.get_string()

        columns = self._parse_tabledesc()
        managers = self._parse_columnset(columns)

        subtables = {
            p.name: p
            for p in self.path.iterdir()
            if p.is_dir() and (p / "table.dat").exists()
        }
        return CasacoreTable(
            path=self.path,
            num_rows=num_rows,
            columns=columns,
            managers=managers,
            subtables=subtables,
        )

    # ------------------------------------------------------------------
    def _frame_at(self, off: int, typ: bytes) -> bool:
        d = self.io.data
        want = struct.pack(">I", len(typ)) + typ
        return d[off + 4 : off + 8 + len(typ)] == want

    def _find_frame(self, typ: bytes, start: int) -> int:
        """Scan for the next framed object of the given type."""
        marker = struct.pack(">I", len(typ)) + typ
        idx = self.io.data.find(marker, start)
        if idx < 4:
            raise CasacoreFormatError(
                f"no {typ.decode()!r} frame found after offset {start}"
            )
        return idx - 4

    def _parse_tabledesc(self) -> dict[str, ColumnDesc]:
        """
        TableDesc frame: name, version string, comment, keyword sets,
        then uInt ncolumn and per-column framed ColumnDesc objects.
        The keyword sets are skipped via their frame lengths; the
        parser re-anchors on the framed column descriptions, whose
        concrete types are registered names like
        'ScalarColumnDesc<Int>' / 'ArrayColumnDesc<Complex>'.
        """
        io = self.io
        start = self._find_frame(b"TableDesc", io.pos)
        io.skip_to(start)
        _, _version, desc_end = io.getstart("TableDesc")

        columns: dict[str, ColumnDesc] = {}
        # Column descriptions are framed as "ColumnDesc" objects;
        # scan for each within the TableDesc frame.
        pos = io.pos
        while True:
            try:
                frame = self._find_frame(b"ColumnDesc", pos)
            except CasacoreFormatError:
                break
            if frame >= desc_end:
                break
            io.skip_to(frame)
            col = self._parse_columndesc()
            if col is not None:
                columns[col.name] = col
            pos = max(io.pos, frame + 8)
        if not columns:
            raise CasacoreFormatError(
                "TableDesc contained no parseable ColumnDesc frames"
            )
        io.skip_to(desc_end)
        return columns

    def _parse_columndesc(self) -> ColumnDesc | None:
        """
        ColumnDesc frame wraps the concrete description:
        [String concrete-type] then the BaseColumnDesc payload:
        name, comment, dataManagerType, dataManagerGroup, valueType
        (Int), options (Int), ndim (Int), shape (IPosition, arrays
        only), maxLength, keyword TableRecord, [default value].
        Unknown trailing payload is skipped via the frame length.
        """
        io = self.io
        _, _version, end = io.getstart("ColumnDesc")
        concrete = io.get_string(max_len=256)
        if not (
            concrete.startswith("ScalarColumnDesc")
            or concrete.startswith("ArrayColumnDesc")
        ):
            # e.g. SubTable / virtual column descriptions: skip.
            io.skip_to(end)
            return None
        is_array = concrete.startswith("ArrayColumnDesc")
        _payload_version = io.get_uint()
        name = io.get_string(max_len=4096)
        _comment = io.get_string()
        dm_type = io.get_string(max_len=256)
        dm_group = io.get_string(max_len=256)
        value_type = io.get_int()
        options = io.get_int()
        ndim = io.get_int()
        shape: tuple[int, ...] = ()
        if is_array and ndim > 0:
            shape = io.get_iposition()
        io.skip_to(end)
        return ColumnDesc(
            name=name,
            value_type=value_type,
            is_array=is_array,
            ndim=ndim,
            shape=shape,
            data_manager_type=dm_type,
            data_manager_group=dm_group,
            options=options,
        )

    def _parse_columnset(
        self, columns: dict[str, ColumnDesc]
    ) -> list[DataManagerBinding]:
        """
        Data manager instances and their column bindings. casacore
        binds each unbound column to one instance per distinct
        (dataManagerType, dataManagerGroup) pair, in TableDesc order,
        and assigns sequence numbers (-> table.f<seqnr> files) in
        instance-creation order. The registration records in
        table.dat confirm which sequence numbers exist; the grouping
        itself is reproduced from the TableDesc column metadata.
        """
        groups: dict[tuple[str, str], list[ColumnDesc]] = {}
        for col in columns.values():
            key = (col.data_manager_type, col.data_manager_group)
            groups.setdefault(key, []).append(col)
        managers = [
            DataManagerBinding(
                kind=kind, seqnr=seq, group=group, column_descs=cols
            )
            for seq, ((kind, group), cols) in enumerate(groups.items())
        ]
        if not managers:
            raise CasacoreFormatError(
                "TableDesc yielded no data manager bindings"
            )
        return managers


#: SSM reserves a fixed region at the file start for its AipsIO
#: header; data bucket b then lives at HEADER_AREA + b * bucketSize.
_SSM_HEADER_AREA = 512


class SSMFile:
    """
    StandardStMan bucket file (``table.f<seq>``).

    Layout (tables/DataMan/SSMBase.cc, SSMIndex.cc):

    * a header region at offset 0 holding an AipsIO 'StandardStMan'
      frame with (bucketSize, nrBuckets, persistent cache size, free
      list, index bucket chain head);
    * fixed-size data buckets; all columns of the instance share each
      bucket, column c occupying a contiguous slab of
      ``rowsPerBucket * itemBytes(c)`` at a fixed in-bucket offset
      (binding order), Bool packed as bits;
    * SSMIndex frames mapping row intervals to bucket numbers (one
      contiguous interval per bucket in the append-only case).

    The slab offsets and rowsPerBucket are recomputed at open time by
    casacore (not stored); this reader mirrors that computation and
    cross-checks it against the SSMIndex row counts. Bit-exactness is
    asserted by the ingest-casacore CI equality job; every structural
    mismatch raises with offsets (never silent garbage).
    """

    def __init__(
        self, path: Path, num_rows: int, binding: DataManagerBinding
    ):
        self.path = path
        self.num_rows = num_rows
        self.binding = binding
        self.data = path.read_bytes()
        self._parse_header()
        self._parse_index()

    def _parse_header(self) -> None:
        io = AipsIOReader(self.data)
        # Optional magic uInt before the frame (as in table.dat).
        probe = _TableDatParser(self.data, self.path)
        if probe._frame_at(0, b"StandardStMan"):
            io.pos = 0
        elif probe._frame_at(4, b"StandardStMan"):
            io.pos = 4
        else:
            raise CasacoreFormatError(
                f"no 'StandardStMan' header frame in {self.path}"
            )
        _, self.version, _end = io.getstart("StandardStMan")
        self.bucket_size = io.get_int()
        self.nr_buckets = io.get_int()
        self.pers_cache_size = io.get_int()
        self.free_buckets = io.get_int()
        self.first_free_bucket = io.get_int()
        self.nr_idx_buckets = io.get_int()
        self.first_idx_bucket = io.get_int()
        if not (512 <= self.bucket_size <= (1 << 24)):
            raise CasacoreFormatError(
                f"implausible SSM bucket size {self.bucket_size} in "
                f"{self.path} (header field order mismatch?)"
            )

    def _bucket(self, b: int) -> bytes:
        off = _SSM_HEADER_AREA + b * self.bucket_size
        if off + self.bucket_size > len(self.data):
            raise CasacoreFormatError(
                f"bucket {b} beyond EOF in {self.path}"
            )
        return self.data[off : off + self.bucket_size]

    def _parse_index(self) -> None:
        """
        Row-interval -> bucket mapping. Robust strategy: scan the
        whole file for framed 'SSMIndex' objects (they live in the
        index-bucket chain) and read (nused, lastRow[], bucketNr[]).
        Falls back to the append-only identity mapping when no index
        frame parses (rows packed in bucket order).
        """
        marker = struct.pack(">I", 8) + b"SSMIndex"
        self.intervals: list[tuple[int, int]] = []  # (last_row, bucket)
        pos = self.data.find(marker)
        while pos >= 4:
            try:
                io = AipsIOReader(self.data, pos - 4)
                _, _v, _end = io.getstart("SSMIndex")
                nused = io.get_uint()
                if nused > 1_000_000:
                    raise CasacoreFormatError("implausible SSMIndex")
                last_rows = [io.get_uint() for _ in range(nused)]
                buckets = [io.get_uint() for _ in range(nused)]
                if last_rows and last_rows[-1] + 1 >= self.num_rows:
                    self.intervals = list(zip(last_rows, buckets))
                    break
            except CasacoreFormatError:
                pass
            pos = self.data.find(marker, pos + 1)
        if not self.intervals:
            # Append-only layout: bucket k holds the k-th row chunk.
            self.intervals = []

    def _rows_per_bucket(self, slabs: list[tuple[bool, int]]) -> int:
        """
        casacore packs an integral number of rows per bucket
        (SSMBase::init): the largest nrows with
        ``sum_c slab_bytes(c, nrows) <= bucketSize``, where a Bool
        column's slab is ``ceil(nrows * nitems / 8)`` bytes (bit-
        packed) and any other column's is ``nrows * row_bytes``. The
        capacity is a property of the bucket, independent of how many
        rows are actually stored, so slab offsets always use it.
        """
        lo, hi = 1, self.bucket_size * 8
        while lo < hi:
            mid = (lo + hi + 1) // 2
            if self._bucket_bytes(slabs, mid) <= self.bucket_size:
                lo = mid
            else:
                hi = mid - 1
        return lo

    @staticmethod
    def _bucket_bytes(slabs: list[tuple[bool, int]], nrows: int) -> int:
        total = 0
        for is_bool, per_row in slabs:
            if is_bool:  # per_row = bits per row
                total += (nrows * per_row + 7) // 8
            else:  # per_row = bytes per row
                total += per_row * nrows
        return total

    def read_column(self, desc: ColumnDesc) -> np.ndarray:
        # Slab layout for every bound column, binding order.
        cols = self.binding.column_descs
        slabs = [_slab_spec(c) for c in cols]
        try:
            col_pos = [c.name for c in cols].index(desc.name)
        except ValueError:
            raise CasacoreFormatError(
                f"{desc.name} not bound to SSM file {self.path}"
            )
        rpb = self._rows_per_bucket(slabs)
        offsets = []
        off = 0
        for is_bool, per_row in slabs:
            offsets.append(off)
            if is_bool:
                off += (rpb * per_row + 7) // 8
            else:
                off += per_row * rpb

        if not desc.is_direct:
            return self._read_indirect(desc, col_pos, offsets, rpb)

        nitems = int(np.prod(desc.shape)) if desc.is_array else 1
        if desc.value_type == TP_BOOL:
            out = np.empty(self.num_rows * nitems, bool)
        else:
            dtype = _DTYPES.get(desc.value_type)
            if dtype is None:
                raise CasacoreFormatError(
                    f"unsupported SSM value type {desc.value_type} "
                    f"for column {desc.name}"
                )
            out = np.empty(self.num_rows * nitems, dtype)

        intervals = self.intervals or [
            (
                min((k + 1) * rpb, self.num_rows) - 1,
                k,
            )
            for k in range(-(-self.num_rows // rpb))
        ]
        row0 = 0
        for last_row, bucket in intervals:
            nrows = last_row + 1 - row0
            if nrows <= 0 or last_row >= self.num_rows:
                raise CasacoreFormatError(
                    f"bad SSM interval ({row0}..{last_row}) in "
                    f"{self.path}"
                )
            raw = self._bucket(bucket)
            slab_off = offsets[col_pos]
            if desc.value_type == TP_BOOL:
                nbytes = (nrows * nitems + 7) // 8
                bits = np.unpackbits(
                    np.frombuffer(
                        raw, np.uint8, count=nbytes, offset=slab_off
                    ),
                    bitorder="little",
                )
                vals = bits[: nrows * nitems].astype(bool)
            else:
                vals = np.frombuffer(
                    raw,
                    out.dtype,
                    count=nrows * nitems,
                    offset=slab_off,
                )
            out[row0 * nitems : (last_row + 1) * nitems] = vals
            row0 = last_row + 1
        if row0 != self.num_rows:
            raise CasacoreFormatError(
                f"SSM intervals cover {row0} rows, table has "
                f"{self.num_rows} ({self.path})"
            )
        shape = (self.num_rows,) + tuple(reversed(desc.shape))
        out = out.reshape(shape)
        if out.dtype.byteorder == ">":
            out = out.astype(out.dtype.newbyteorder("="))
        return out

    # -- indirect arrays (StIndArray / StManArrayFile) -----------------
    def _aux_data(self) -> bytes:
        """
        The aux array file holding indirect cells. casacore names it
        after the manager's file; both historical suffixes are
        probed (validated in the ingest-casacore CI job).
        """
        for suffix in ("x", "i"):
            cand = self.path.with_name(self.path.name + suffix)
            if cand.exists():
                return cand.read_bytes()
        raise CasacoreFormatError(
            f"no indirect-array aux file next to {self.path}"
        )

    def _read_indirect(
        self,
        desc: ColumnDesc,
        col_pos: int,
        offsets: list[int],
        rpb: int,
    ) -> np.ndarray:
        """
        Indirect cells: the bucket slab stores one Int64 offset per
        row; each offset points at a shape record
        ``[uInt ndim][uInt dim...]`` followed by the cell elements in
        Fortran order (StIndArray::getShape + data).
        """
        aux = self._aux_data()
        dtype = _DTYPES.get(desc.value_type)
        if dtype is None:
            raise CasacoreFormatError(
                f"unsupported indirect value type {desc.value_type} "
                f"for column {desc.name}"
            )
        intervals = self.intervals or [
            (min((k + 1) * rpb, self.num_rows) - 1, k)
            for k in range(-(-self.num_rows // rpb))
        ]
        row_offsets = np.empty(self.num_rows, ">i8")
        row0 = 0
        for last_row, bucket in intervals:
            nrows = last_row + 1 - row0
            raw = self._bucket(bucket)
            row_offsets[row0 : last_row + 1] = np.frombuffer(
                raw, ">i8", count=nrows, offset=offsets[col_pos]
            )
            row0 = last_row + 1

        cells = []
        cell_shape: tuple[int, ...] | None = None
        for r, off in enumerate(row_offsets):
            off = int(off)
            if off <= 0 or off + 4 > len(aux):
                raise CasacoreFormatError(
                    f"row {r}: bad indirect offset {off} in aux file "
                    f"of {self.path}"
                )
            io = AipsIOReader(aux, off)
            ndim = io.get_uint()
            if not 1 <= ndim <= 8:
                raise CasacoreFormatError(
                    f"row {r}: implausible indirect rank {ndim} at "
                    f"aux offset {off}"
                )
            dims = tuple(io.get_uint() for _ in range(ndim))
            n = int(np.prod(dims))
            if n > 100_000_000:
                raise CasacoreFormatError(
                    f"row {r}: implausible indirect cell {dims}"
                )
            if desc.value_type == TP_BOOL:
                nbytes = (n + 7) // 8
                bits = np.unpackbits(
                    np.frombuffer(
                        aux, np.uint8, count=nbytes, offset=io.pos
                    ),
                    bitorder="little",
                )
                vals = bits[:n].astype(bool)
            else:
                vals = np.frombuffer(aux, dtype, count=n, offset=io.pos)
            # Fortran cell order -> numpy row-major reversed dims.
            cells.append(vals.reshape(tuple(reversed(dims))))
            if cell_shape is None:
                cell_shape = cells[-1].shape
            elif cells[-1].shape != cell_shape:
                raise CasacoreFormatError(
                    f"ragged indirect column {desc.name} "
                    "(unsupported by the ingest subset)"
                )
        out = np.stack(cells, axis=0)
        if out.dtype.byteorder == ">":
            out = out.astype(out.dtype.newbyteorder("="))
        return out


def _slab_spec(desc: ColumnDesc) -> tuple[bool, int]:
    """
    (is_bool, per_row) slab spec of one bound column inside a data
    bucket: per_row is BITS per row for direct Bool columns (bit-
    packed slabs) and BYTES per row otherwise. INDIRECT array
    columns store one Int64 file offset per row (StIndArray), so
    their slab is 8 bytes/row regardless of cell shape.
    """
    if not desc.is_direct:
        return False, 8
    if desc.is_array and not desc.shape:
        raise CasacoreFormatError(
            f"column {desc.name}: direct array without a fixed shape"
        )
    nitems = int(np.prod(desc.shape)) if desc.is_array else 1
    if desc.value_type == TP_BOOL:
        return True, nitems
    dtype = _DTYPES.get(desc.value_type)
    if dtype is None:
        raise CasacoreFormatError(
            f"unsupported value type {desc.value_type} for "
            f"column {desc.name}"
        )
    return False, dtype.itemsize * nitems


class TSMFile:
    """
    TiledColumnStMan cube file pair: ``table.f<seq>`` holds the
    AipsIO header (tile shape, endianness) and ``table.f<seq>_TSM0``
    the raw hypercube of one fixed-shape column, stored as a
    Fortran-ordered grid of Fortran-ordered tiles over
    ``cellShape + (nrows,)`` (tables/DataMan/TSMCube.cc). Bools are
    bit-packed per tile. Real observatory MSs bind this manager for
    DATA/FLAG; byte-level agreement is asserted by the
    ingest-casacore CI job on a TSM-bound fixture variant.
    """

    def __init__(
        self, path: Path, num_rows: int, binding: DataManagerBinding
    ):
        self.path = path
        self.num_rows = num_rows
        self.binding = binding
        if len(binding.column_descs) != 1:
            raise CasacoreFormatError(
                "TiledColumnStMan instance with "
                f"{len(binding.column_descs)} columns (expected one "
                f"per instance): {binding.columns}"
            )
        self._parse_header()

    def _parse_header(self) -> None:
        data = self.path.read_bytes()
        probe = _TableDatParser(data, self.path)
        # The header frames the concrete manager type; the tile shape
        # is the first IPosition whose rank is one more than the cell
        # rank (cellShape + row axis).
        if not (
            probe._frame_at(0, b"TiledColumnStMan")
            or probe._frame_at(4, b"TiledColumnStMan")
            or data.find(b"TiledColumnStMan") >= 0
        ):
            raise CasacoreFormatError(
                f"no 'TiledColumnStMan' header frame in {self.path}"
            )
        desc = self.binding.column_descs[0]
        want_rank = len(desc.shape) + 1
        marker = struct.pack(">I", 9) + b"IPosition"
        pos = data.find(marker)
        tile_shape: tuple[int, ...] | None = None
        while pos >= 4:
            try:
                io = AipsIOReader(data, pos - 4)
                shape = io.get_iposition()
                if len(shape) == want_rank and all(
                    1 <= d <= 1_000_000 for d in shape
                ):
                    tile_shape = shape
                    break
            except CasacoreFormatError:
                pass
            pos = data.find(marker, pos + 1)
        if tile_shape is None:
            raise CasacoreFormatError(
                f"no rank-{want_rank} tile-shape IPosition in "
                f"{self.path} header"
            )
        self.tile_shape = tile_shape  # casacore order (fastest first)

    def read_column(self, desc: ColumnDesc) -> np.ndarray:
        cube_path = self.path.with_name(self.path.name + "_TSM0")
        if not cube_path.exists():
            raise CasacoreFormatError(
                f"missing TSM cube file {cube_path}"
            )
        raw = cube_path.read_bytes()
        cell = tuple(desc.shape)  # casacore order (fastest first)
        return _decode_tsm_cube(
            raw,
            cell,
            self.tile_shape,
            self.num_rows,
            desc,
            cube_path,
        )


def _decode_tsm_cube(
    raw: bytes,
    cell: tuple,
    tile: tuple,
    num_rows: int,
    desc: ColumnDesc,
    cube_path: Path,
    offset: int = 0,
) -> np.ndarray:
    """
    Decode one TSM hypercube (Fortran-ordered grid of Fortran-ordered
    tiles over ``cell + (num_rows,)``; bools bit-packed per tile,
    tables/DataMan/TSMCube.cc) starting at ``offset`` of ``raw``.
    Shared by TiledColumnStMan and TiledShapeStMan.
    """
    cube_shape = cell + (num_rows,)
    ntiles = [-(-cube_shape[a] // tile[a]) for a in range(len(tile))]
    is_bool = desc.value_type == TP_BOOL
    if is_bool:
        tile_items = int(np.prod(tile))
        tile_bytes = (tile_items + 7) // 8
    else:
        dtype = _DTYPES.get(desc.value_type)
        if dtype is None:
            raise CasacoreFormatError(
                f"unsupported TSM value type {desc.value_type} "
                f"for column {desc.name}"
            )
        tile_items = int(np.prod(tile))
        tile_bytes = tile_items * dtype.itemsize
    total_tiles = int(np.prod(ntiles))
    if len(raw) - offset < total_tiles * tile_bytes:
        raise CasacoreFormatError(
            f"TSM cube {cube_path} holds {len(raw) - offset} bytes "
            f"at offset {offset}; {total_tiles} tiles of "
            f"{tile_bytes} expected"
        )
    # Padded cube shape in numpy (row-major) axis order: reversed
    # casacore order, tile grid Fortran-ordered over the cube.
    out_padded = np.empty(
        tuple(n * t for n, t in zip(ntiles, tile))[::-1],
        bool if is_bool else dtype,
    )
    rev_tile = tile[::-1]
    for flat in range(total_tiles):
        # Fortran order: first axis fastest.
        rem, coords = flat, []
        for n in ntiles:
            coords.append(rem % n)
            rem //= n
        off = offset + flat * tile_bytes
        if is_bool:
            bits = np.unpackbits(
                np.frombuffer(
                    raw, np.uint8, count=tile_bytes, offset=off
                ),
                bitorder="little",
            )
            vals = bits[:tile_items].astype(bool)
        else:
            vals = np.frombuffer(
                raw, dtype, count=tile_items, offset=off
            )
        block = vals.reshape(rev_tile)  # Fortran cell -> reversed C
        idx = tuple(
            slice(c * t, (c + 1) * t)
            for c, t in zip(coords[::-1], rev_tile)
        )
        out_padded[idx] = block
    # Trim padding; numpy axes are (row, cell...) after reversal.
    trim = tuple(slice(0, s) for s in cube_shape[::-1])
    out = out_padded[trim]
    if not is_bool and out.dtype.byteorder == ">":
        out = out.astype(out.dtype.newbyteorder("="))
    return np.ascontiguousarray(out)


class TSSMFile:
    """
    TiledShapeStMan decode — the manager the CASA filler commonly
    binds for DATA/FLAG on real observatory MSs when cell shapes are
    declared variable (tables/DataMan/TiledShapeStMan.cc). TSSM
    organizes rows into one hypercube PER DISTINCT CELL SHAPE, each
    extending along its last axis as rows arrive.

    Supported subset: exactly ONE hypercube — i.e. every row shares
    one cell shape, which is what
    :class:`~ska_sdp_cip_tpu.io.visibility_dataset.VisibilityDataset`'s
    layout validation (single SPECTRAL_WINDOW / single POLARIZATION,
    reference: measurement_set.py:77-105) implies for the main-table
    DATA/FLAG columns. Multi-shape MSs raise
    :class:`CasacoreFormatError` and must be ingested where
    python-casacore is available.

    Header recovery is tolerant-scan based, like :class:`TSMFile`:
    the ``table.f<seq>`` header must contain a 'TiledShapeStMan'
    frame; the cube shape is recovered as the rank-(cell_rank+1)
    IPosition whose last axis equals the table's row count, and the
    tile shape as a distinct rank-matched IPosition that divides into
    the cube's extents. Byte-level agreement with real casacore
    output is asserted by the ingest-casacore CI job on a TSSM-bound
    fixture variant (scripts/make_ms_fixture.py).
    """

    def __init__(
        self, path: Path, num_rows: int, binding: DataManagerBinding
    ):
        self.path = path
        self.num_rows = num_rows
        self.binding = binding
        if len(binding.column_descs) != 1:
            raise CasacoreFormatError(
                "TiledShapeStMan instance with "
                f"{len(binding.column_descs)} columns (expected one "
                f"per instance): {binding.columns}"
            )
        self._parse_header()

    def _iter_ipositions(self, data: bytes):
        marker = struct.pack(">I", 9) + b"IPosition"
        pos = data.find(marker)
        while pos >= 4:
            try:
                io = AipsIOReader(data, pos - 4)
                yield io.get_iposition()
            except CasacoreFormatError:
                pass
            pos = data.find(marker, pos + 1)

    def _parse_header(self) -> None:
        data = self.path.read_bytes()
        if data.find(b"TiledShapeStMan") < 0:
            raise CasacoreFormatError(
                f"no 'TiledShapeStMan' header frame in {self.path}"
            )
        desc = self.binding.column_descs[0]
        # Every plausible rank-matched IPosition in the header is a
        # candidate for BOTH roles (a tile's row-axis extent can
        # legitimately equal the row count, and headers carry extra
        # IPositions such as the DEFAULTTILESHAPE spec); the blob-size
        # cross-check in read_column disambiguates.
        want_rank = (len(desc.shape) or desc.ndim) + 1
        if want_rank < 2:
            raise CasacoreFormatError(
                f"column {desc.name!r}: TSSM needs array cells "
                f"(ndim {desc.ndim})"
            )
        # Keep EVERY plausible candidate for both roles here; the
        # cube role is pinned by desc.shape (when fixed) and the
        # blob-size cross-check in read_column. Pre-filtering tiles
        # whose row extent happens to equal num_rows would drop
        # legitimate tile shapes.
        self.candidates = []
        for shape in self._iter_ipositions(data):
            if len(shape) != want_rank or not all(
                1 <= d <= 100_000_000 for d in shape
            ):
                continue
            if shape not in self.candidates:
                self.candidates.append(shape)
        if not self.candidates:
            raise CasacoreFormatError(
                f"no rank-{want_rank} IPositions in {self.path} "
                f"header for column {desc.name!r}"
            )

    def _tile_bytes(self, tile, value_type) -> int:
        items = int(np.prod(tile))
        if value_type == TP_BOOL:
            return (items + 7) // 8
        dtype = _DTYPES.get(value_type)
        if dtype is None:
            raise CasacoreFormatError(
                f"unsupported TSM value type {value_type}"
            )
        return items * dtype.itemsize

    def read_column(self, desc: ColumnDesc) -> np.ndarray:
        cube_path = self.path.with_name(self.path.name + "_TSM0")
        if not cube_path.exists():
            raise CasacoreFormatError(
                f"missing TSM cube file {cube_path}"
            )
        raw = cube_path.read_bytes()
        # Disambiguate (cube, tile) among header candidates by the
        # data file's size: the blob is a whole number of tiles
        # covering cell + (num_rows,), possibly followed by writer
        # slack smaller than one tile. A tile shape mistaken for a
        # cube (or vice versa) fails this check instead of silently
        # scrambling the decode. Among size-consistent pairs, the
        # CLOSEST fit (largest expected byte count) wins.
        scored = []
        for cube in self.candidates:
            if cube[-1] != self.num_rows:
                continue
            if desc.shape and cube[:-1] != tuple(desc.shape):
                continue  # fixed-shape desc pins the cube's cell
            cell = cube[:-1]
            for tile in self.candidates:
                if any(
                    t > c for t, c in zip(tile[:-1], cell)
                ):
                    continue
                ntiles = [
                    -(-cube[a] // tile[a]) for a in range(len(tile))
                ]
                tb = self._tile_bytes(tile, desc.value_type)
                expected = int(np.prod(ntiles)) * tb
                slack = len(raw) - expected
                # The degenerate whole-cube pairing (tile == cube)
                # has tb == expected, which would make any slack
                # window vacuous; it must match EXACTLY. Proper
                # tiles tolerate sub-tile writer slack.
                limit = 1 if tile == cube else max(tb, 4096)
                if 0 <= slack < limit:
                    if (expected, cube, tile) not in scored:
                        scored.append((expected, cube, tile))
        best = max((s[0] for s in scored), default=None)
        consistent = [
            (cube, tile)
            for expected, cube, tile in scored
            if expected == best
        ]
        # Distinct (cube, tile) pairs can describe the same byte
        # layout only if they decode identically-shaped tile grids;
        # require a unique CELL shape, the thing that matters.
        cells = {cube[:-1] for cube, _ in consistent}
        if len(cells) != 1:
            raise CasacoreFormatError(
                f"{cube_path}: {len(consistent)} (hypercube, tile) "
                f"candidate pairs consistent with the {len(raw)}-byte "
                f"data file (cells {sorted(cells)}); only "
                "single-hypercube TiledShapeStMan with an "
                "unambiguous layout is supported"
            )
        # The cube-shape IPosition itself always pairs as a
        # degenerate whole-cube tile (same byte count); when a proper
        # (smaller) tile also matches, the degenerate pairing is that
        # same header entry double-counted — drop it.
        proper = [
            (cube, tile)
            for cube, tile in consistent
            if tile != cube
        ]
        if proper:
            consistent = proper
        tiles = {tile for _, tile in consistent}
        if len(tiles) > 1:
            raise CasacoreFormatError(
                f"{cube_path}: ambiguous tile shapes "
                f"{sorted(tiles)} all match the data file size; "
                "refusing to guess"
            )
        cube, tile = consistent[0]
        return _decode_tsm_cube(
            raw,
            cube[:-1],
            tile,
            self.num_rows,
            desc,
            cube_path,
        )


class ISMFile:
    """
    IncrementalStMan bucket file (``table.f<seq>``) — the manager
    CASA-written observatory MSs bind for slowly-varying scalars
    (TIME, EXPOSURE, FIELD_ID, FLAG_ROW, ...) and small fixed-shape
    arrays (UVW, WEIGHT). ISM stores a value only where it CHANGES:
    each bucket covers a row interval and holds, per bound column, a
    list of (start row, value) pairs; a row's value is the latest pair
    at or before it.

    Layout (tables/DataMan/ISMBase.cc, ISMBucket.cc, ISMIndex.cc):

    * header region at offset 0: AipsIO 'IncrementalStMan' frame with
      (bucketSize, nrBuckets, persistent cache size, free-bucket
      count/head, ...);
    * fixed-size data buckets from offset 512, each laid out as
      ``[uInt index_offset][data values ...][index]`` where the index
      holds, per bound column in binding order,
      ``[uInt nused][nused x uInt relative start rows]
      [nused x uInt value offsets within the bucket]``. Every bucket
      restates each column's current value at its first row (interval
      starts at relative row 0), so buckets decode independently;
    * an 'ISMIndex' AipsIO frame mapping row intervals to bucket
      numbers (located by frame scan, placement-independent).

    Values are canonical big-endian; Bool cells are bit-packed
    (``ceil(nitems / 8)`` bytes, LSB first). Variable-shape (indirect)
    arrays and strings are rejected loudly. As with the SSM/TSM
    decoders, byte-exactness against real casacore output is asserted
    by the ingest-casacore CI equality job (this environment cannot
    produce real bytes); every structural assumption below raises
    :class:`CasacoreFormatError` with context rather than returning
    garbage.
    """

    def __init__(
        self, path: Path, num_rows: int, binding: DataManagerBinding
    ):
        self.path = path
        self.num_rows = num_rows
        self.binding = binding
        self.data = path.read_bytes()
        self._parse_header()
        self._parse_index()

    def _parse_header(self) -> None:
        io = AipsIOReader(self.data)
        probe = _TableDatParser(self.data, self.path)
        if probe._frame_at(0, b"IncrementalStMan"):
            io.pos = 0
        elif probe._frame_at(4, b"IncrementalStMan"):
            io.pos = 4
        else:
            raise CasacoreFormatError(
                f"no 'IncrementalStMan' header frame in {self.path}"
            )
        _, self.version, _end = io.getstart("IncrementalStMan")
        # Version >= 5 prefixes a Bool endianness flag (casacore
        # ISMBase::readHeader); earlier versions start at bucketSize.
        mark = io.pos
        if self.version >= 5:
            io.pos += 1
        self.bucket_size = io.get_uint()
        self.nr_buckets = io.get_uint()
        if not (512 <= self.bucket_size <= (1 << 24)):
            # Field-order fallback: no endian flag after all.
            io.pos = mark
            self.bucket_size = io.get_uint()
            self.nr_buckets = io.get_uint()
        if not (512 <= self.bucket_size <= (1 << 24)):
            raise CasacoreFormatError(
                f"implausible ISM bucket size {self.bucket_size} in "
                f"{self.path} (header field order mismatch?)"
            )

    def _bucket(self, b: int) -> bytes:
        off = _SSM_HEADER_AREA + b * self.bucket_size
        if off + self.bucket_size > len(self.data):
            raise CasacoreFormatError(
                f"ISM bucket {b} beyond EOF in {self.path}"
            )
        return self.data[off : off + self.bucket_size]

    def _parse_index(self) -> None:
        """
        Row-interval -> bucket mapping from the framed 'ISMIndex'
        object: (nused, row boundaries[nused+1], bucketNr[nused]).
        Row boundaries are uInt (v1) or Int64 (v>=2, 64-bit row
        numbers); both are probed. Single-bucket fallback when no
        index frame parses and exactly one bucket exists.
        """
        marker = struct.pack(">I", 8) + b"ISMIndex"
        self.intervals: list[tuple[int, int, int]] = []
        pos = self.data.find(marker)
        while pos >= 4:
            try:
                io = AipsIOReader(self.data, pos - 4)
                _, version, _end = io.getstart("ISMIndex")
                nused = io.get_uint()
                if not (1 <= nused <= 1_000_000):
                    raise CasacoreFormatError("implausible ISMIndex")
                # putBlock framing: [uInt n][n values]
                def _block(reader, wide):
                    n = reader.get_uint()
                    if n > 2_000_000:
                        raise CasacoreFormatError(
                            "implausible ISMIndex block"
                        )
                    get = (
                        reader.get_int64 if wide else reader.get_uint
                    )
                    return [get() for _ in range(n)]

                wide = version >= 2
                mark = io.pos
                try:
                    rows = _block(io, wide)
                    buckets = _block(io, False)
                except CasacoreFormatError:
                    io.pos = mark
                    rows = _block(io, not wide)
                    buckets = _block(io, False)
                if (
                    len(rows) >= nused + 1
                    and len(buckets) >= nused
                    and rows[0] == 0
                    and rows[nused] >= self.num_rows
                    and all(
                        rows[i] < rows[i + 1] for i in range(nused)
                    )
                ):
                    self.intervals = [
                        (rows[i], rows[i + 1], buckets[i])
                        for i in range(nused)
                    ]
                    break
            except (CasacoreFormatError, struct.error):
                pass
            pos = self.data.find(marker, pos + 1)
        if not self.intervals:
            if self.nr_buckets <= 1:
                self.intervals = [(0, self.num_rows, 0)]
            else:
                raise CasacoreFormatError(
                    f"no parseable ISMIndex frame in {self.path} "
                    f"({self.nr_buckets} buckets)"
                )

    def _bucket_index(
        self, raw: bytes, ncols: int, bucket_rows: int
    ) -> list[tuple[np.ndarray, np.ndarray]]:
        """Per-column (relative start rows, value offsets) lists."""
        (idx_off,) = struct.unpack_from(">I", raw, 0)
        if not (4 <= idx_off < self.bucket_size):
            raise CasacoreFormatError(
                f"ISM bucket index offset {idx_off} out of range in "
                f"{self.path}"
            )
        pos = idx_off
        out = []
        for c in range(ncols):
            (nused,) = struct.unpack_from(">I", raw, pos)
            pos += 4
            if not (1 <= nused <= self.bucket_size // 8):
                raise CasacoreFormatError(
                    f"implausible ISM bucket column {c} entry count "
                    f"{nused} in {self.path}"
                )
            rows = np.frombuffer(
                raw, ">u4", count=nused, offset=pos
            ).astype(np.int64)
            pos += 4 * nused
            offs = np.frombuffer(
                raw, ">u4", count=nused, offset=pos
            ).astype(np.int64)
            pos += 4 * nused
            if rows[0] != 0 or np.any(np.diff(rows) <= 0):
                raise CasacoreFormatError(
                    f"ISM bucket column {c} start rows not ascending "
                    f"from 0 in {self.path}"
                )
            if rows[-1] >= max(bucket_rows, 1):
                raise CasacoreFormatError(
                    f"ISM bucket column {c} start row {rows[-1]} "
                    f">= interval rows {bucket_rows} in {self.path}"
                )
            if np.any(offs < 4) or np.any(offs >= idx_off):
                raise CasacoreFormatError(
                    f"ISM bucket column {c} value offsets escape the "
                    f"data area in {self.path}"
                )
            out.append((rows, offs))
        return out

    def read_column(self, desc: ColumnDesc) -> np.ndarray:
        cols = self.binding.column_descs
        try:
            col_pos = [c.name for c in cols].index(desc.name)
        except ValueError:
            raise CasacoreFormatError(
                f"{desc.name} not bound to ISM file {self.path}"
            )
        if desc.value_type == TP_STRING:
            raise CasacoreFormatError(
                f"ISM string column {desc.name} is not supported by "
                "the native reader"
            )
        if desc.is_array and not desc.shape:
            raise CasacoreFormatError(
                f"ISM variable-shape array column {desc.name} is not "
                "supported by the native reader"
            )
        nitems = int(np.prod(desc.shape)) if desc.is_array else 1
        is_bool = desc.value_type == TP_BOOL
        if is_bool:
            out = np.empty((self.num_rows, nitems), bool)
            val_bytes = (nitems + 7) // 8
        else:
            dtype = _DTYPES.get(desc.value_type)
            if dtype is None:
                raise CasacoreFormatError(
                    f"unsupported ISM value type {desc.value_type} "
                    f"for column {desc.name}"
                )
            out = np.empty((self.num_rows, nitems), dtype)
            val_bytes = nitems * dtype.itemsize

        for row0, row1, bucket in self.intervals:
            row1 = min(row1, self.num_rows)
            if row1 <= row0:
                continue
            raw = self._bucket(bucket)
            rows, offs = self._bucket_index(
                raw, len(cols), row1 - row0
            )[col_pos]
            # Interval i covers relative rows [rows[i], next_start).
            bounds = np.append(rows, row1 - row0)
            for i in range(len(rows)):
                off = int(offs[i])
                if off + val_bytes > len(raw):
                    raise CasacoreFormatError(
                        f"ISM value at {off} beyond bucket end in "
                        f"{self.path}"
                    )
                if is_bool:
                    bits = np.unpackbits(
                        np.frombuffer(
                            raw, np.uint8, count=val_bytes, offset=off
                        ),
                        bitorder="little",
                    )
                    value = bits[:nitems].astype(bool)
                else:
                    value = np.frombuffer(
                        raw, dtype, count=nitems, offset=off
                    )
                out[row0 + bounds[i] : row0 + bounds[i + 1]] = value

        if not is_bool and out.dtype.byteorder == ">":
            out = out.astype(out.dtype.newbyteorder("="))
        if desc.is_array:
            # Fortran cell order on disk -> C order per row.
            cell = tuple(int(s) for s in desc.shape)[::-1]
            return np.ascontiguousarray(
                out.reshape((self.num_rows,) + cell)
            )
        return np.ascontiguousarray(out.reshape(self.num_rows))
