"""
One process of a REAL multi-process distributed major-cycle CLEAN.

The shipped top-level program (``sharded_major_cycle_clean`` — PSF
build, per-cycle predict/invert, minor-cycle reductions, optional
checkpointing) previously crossed a real process boundary only in the
invert tests; this worker runs the FULL major cycle across N
processes joined via ``jax.distributed`` (local coordinator, gloo CPU
collectives, one device each), mirroring the reference's 2-worker
LocalCluster oracle (reference: tests/fixtures/dask_cluster.py:9-32).

Usage (spawned by tests/test_distributed_multiprocess.py):
    python distributed_clean_worker.py <pid> <nproc> <port> \
        <dataset> <out.npz> <npix> <pixel_asec> [checkpoint_dir]
"""

import os
import sys
from pathlib import Path

# Spawned as a bare script: the repo root is not on sys.path unless the
# package is pip-installed, so bootstrap it from this file's location.
sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

#: Shallow, unambiguous cycles (argmax tie cascades make deep CLEANs
#: diverge between numerically-different runs; see test_sharded_clean).
CLEAN_KWARGS = dict(num_major=2, gain=0.3, minor_iter=6)


def main() -> None:
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    dataset = sys.argv[4]
    out_path = sys.argv[5]
    npix = int(sys.argv[6])
    pixel_asec = float(sys.argv[7])
    checkpoint_dir = sys.argv[8] if len(sys.argv) > 8 else None

    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from ska_sdp_cip_tpu.parallel.mesh import initialize_distributed

    initialize_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert jax.process_count() == nproc, jax.process_count()

    import numpy as np

    from ska_sdp_cip_tpu.io.visibility_dataset import VisibilityReader
    from ska_sdp_cip_tpu.parallel.sharded_clean import (
        sharded_major_cycle_clean,
    )

    model, residual, psf = sharded_major_cycle_clean(
        VisibilityReader(dataset),
        npix,
        pixel_asec,
        checkpoint_dir=checkpoint_dir,
        **CLEAN_KWARGS,
    )
    if pid == 0:
        np.savez(out_path, model=model, residual=residual, psf=psf)


if __name__ == "__main__":
    main()
