"""
Byte-level validation of the casacore-free native MSv2 reader against
python-casacore on the same MeasurementSet. Runs in the
``ingest-casacore`` CI job (this build environment has no casacore);
exits nonzero on the first mismatch with a column-by-column report.

Usage: python scripts/validate_native_reader.py <path-to.ms>
"""

import sys

import numpy as np

MAIN_COLUMNS = ("UVW", "TIME", "DATA", "FLAG", "WEIGHT", "WEIGHT_SPECTRUM")


def main() -> int:
    ms_path = sys.argv[1]
    from casacore.tables import table

    from ska_sdp_cip_tpu.io.casacore_tables import read_table

    failures = []
    native = read_table(ms_path)
    with table(ms_path, readonly=True, ack=False) as ms:
        if native.num_rows != ms.nrows():
            failures.append(
                f"num_rows: native {native.num_rows} != {ms.nrows()}"
            )
        for name in MAIN_COLUMNS:
            if name not in ms.colnames():
                continue
            want = ms.getcol(name)
            try:
                got = native.getcol(name)
            except Exception as err:  # noqa: BLE001 — report & continue
                failures.append(f"{name}: native read failed: {err}")
                continue
            if got.shape != want.shape:
                failures.append(
                    f"{name}: shape {got.shape} != {want.shape}"
                )
            elif not np.array_equal(got, want):
                bad = np.flatnonzero(
                    np.asarray(got != want).reshape(-1)
                )[:5]
                failures.append(
                    f"{name}: {len(bad)}+ mismatched elements "
                    f"(first flat indices {bad.tolist()})"
                )
            else:
                print(f"OK {name} {want.shape} {want.dtype}")

    with table(f"{ms_path}::SPECTRAL_WINDOW", readonly=True, ack=False) as t:
        want = t.getcol("CHAN_FREQ")
    got = native.subtable("SPECTRAL_WINDOW").getcol("CHAN_FREQ")
    if not np.array_equal(np.asarray(got), want):
        failures.append("SPECTRAL_WINDOW/CHAN_FREQ mismatch")
    else:
        print("OK SPECTRAL_WINDOW/CHAN_FREQ")

    with table(f"{ms_path}::POLARIZATION", readonly=True, ack=False) as t:
        want = t.getcol("CORR_TYPE")
    got = native.subtable("POLARIZATION").getcol("CORR_TYPE")
    if not np.array_equal(np.asarray(got), want):
        failures.append("POLARIZATION/CORR_TYPE mismatch")
    else:
        print("OK POLARIZATION/CORR_TYPE")

    if failures:
        print("NATIVE READER VALIDATION FAILED:")
        for f in failures:
            print("  -", f)
        return 1
    print("native reader == casacore on all columns")
    return 0


if __name__ == "__main__":
    sys.exit(main())
