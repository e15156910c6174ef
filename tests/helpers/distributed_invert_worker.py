"""
One process of a REAL multi-process distributed invert.

The reference's whole distributed test strategy hinges on 2 actual
worker processes (reference: tests/fixtures/dask_cluster.py:9-32)
exercising pickling and transfers for real. This worker is the
jax-native analog: N processes join one SPMD world over a local
coordinator (gloo CPU collectives), each holding ONE CPU device, and
run ``sharded_invert_dataset`` — executing the cross-process paths a
single-process 8-device mesh never touches: ``initialize_distributed``,
``_allgather_max``/``_allgather_sum`` (real
``multihost_utils.process_allgather``), per-process shard loading in
``stage_planned_shards``, and a psum that crosses process boundaries.

Usage (spawned by tests/test_distributed_multiprocess.py):
    python distributed_invert_worker.py <pid> <nproc> <port> \
        <dataset> <out.npy> <npix> <pixel_asec> [fft_mode]
"""

import os
import sys
from pathlib import Path

# Spawned as a bare script: the repo root is not on sys.path unless the
# package is pip-installed, so bootstrap it from this file's location.
sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def main() -> None:
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    dataset = sys.argv[4]
    out_path = sys.argv[5]
    npix = int(sys.argv[6])
    pixel_asec = float(sys.argv[7])
    fft_mode = sys.argv[8] if len(sys.argv) > 8 else "replicated"

    # One CPU device per process; must be set before jax initializes.
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
    assert jax.device_count() == nproc

    import numpy as np

    from ska_sdp_cip_tpu.io.visibility_dataset import VisibilityReader
    from ska_sdp_cip_tpu.parallel.sharded_invert import (
        sharded_invert_dataset,
    )

    image = sharded_invert_dataset(
        VisibilityReader(dataset), npix, pixel_asec, fft_mode=fft_mode
    )
    if pid == 0:
        np.save(out_path, image)


if __name__ == "__main__":
    main()
