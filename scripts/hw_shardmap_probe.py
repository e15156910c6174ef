"""
On-hardware proof that the COMPILED Pallas kernels run inside
shard_map: the production composition (sharded_invert_dataset ->
shard_map -> pallas_call -> psum) is otherwise only exercised in
interpret mode on the CPU mesh (tests/test_sharded_invert.py), and
the multichip dryrun forces the XLA gridder. This probe runs on
whatever accelerator jax exposes (the bench chip: a 1-device mesh —
the shard_map/Pallas composition itself is what compiled-mode never
covered) and compares against the plain single-device invert.

Tolerance: 5e-5. The reference's distributed-vs-local tolerance is
1e-5 (tests/test_dask_invert_measurement_set.py:31-34) for f64 ducc0
against itself; here BOTH paths are bf16x3 engines whose individual
self-noise against the f32 XLA oracle is ~1e-5 (the bench's built-in
gate), and the sharded path sums in a different order — measured
2.0e-5 between them on chip (2026-08-21), well inside the gridding
epsilon=1e-4 accuracy contract.

Prints one JSON line; exits nonzero on mismatch.
"""

import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

NPIX = 512
PIXEL_ASEC = 8.0


def main() -> int:
    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir", str(REPO / ".jax_cache")
        )
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 1.0
        )
    except Exception:
        pass

    import tempfile

    from ska_sdp_cip_tpu.invert import invert_dataset
    from ska_sdp_cip_tpu.io.synth import make_synthetic_dataset
    from ska_sdp_cip_tpu.io.visibility_dataset import VisibilityReader
    from ska_sdp_cip_tpu.parallel.sharded_invert import (
        make_device_mesh,
        sharded_invert_dataset,
    )

    device = jax.devices()[0]
    if device.platform == "cpu":
        print(
            json.dumps({"ok": False, "error": "no accelerator"}),
        )
        return 1

    with tempfile.TemporaryDirectory() as tmp:
        path = make_synthetic_dataset(
            f"{tmp}/probe.vz", num_times=6, num_antennas=24, seed=33
        )
        reader = VisibilityReader(path)
        # Force the Pallas gridder for the single-device oracle too
        # (invert_dataset resolves the mode from the env/backend);
        # restore the prior value so nothing run after main() in this
        # process inherits the forced mode.
        os = __import__("os")
        prev = os.environ.get("CIP_GRIDDER")
        os.environ["CIP_GRIDDER"] = "pallas"
        try:
            single = np.asarray(
                invert_dataset(reader, NPIX, PIXEL_ASEC)
            )
            mesh = make_device_mesh()
            sharded = np.asarray(
                sharded_invert_dataset(
                    reader,
                    NPIX,
                    PIXEL_ASEC,
                    mesh=mesh,
                    gridder="pallas",
                )
            )
        finally:
            if prev is None:
                os.environ.pop("CIP_GRIDDER", None)
            else:
                os.environ["CIP_GRIDDER"] = prev

    scale = float(np.abs(single).max())
    max_rel = float(np.abs(sharded - single).max() / scale)
    ok = bool(np.isfinite(sharded).all()) and max_rel < 5e-5
    print(
        json.dumps(
            {
                "ok": ok,
                "device": str(device),
                "mesh_devices": int(mesh.devices.size),
                "max_rel": max_rel,
            }
        )
    )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
