#!/bin/bash
# Multi-host TPU pod slice launch for the imaging pipeline — the
# TPU-native equivalent of the reference's SLURM + ssh dask cluster
# bring-up (reference: slurm/csd3_icelake.sh:1-96). There is no
# scheduler process: every host runs the same SPMD program and joins
# via jax.distributed (coordinator = worker 0).
#
# Usage (from a machine with gcloud access to the TPU pod):
#   ./tpu_pod_launch.sh <tpu-name> <zone> <dataset.vz> <out.npy>
#
# Production config mirrors the reference's CSD3 run
# (slurm/csd3_icelake.sh:19-26): 10240 px, 1.1 asec pixels.

set -euo pipefail

TPU_NAME="${1:?tpu name}"
ZONE="${2:?zone}"
DATASET="${3:?dataset path (shared filesystem or GCS fuse)}"
OUTPUT="${4:?output image path}"

NUM_PIXELS="${NUM_PIXELS:-10240}"
PIXEL_SIZE="${PIXEL_SIZE:-1.1}"

# Every worker runs the same command; jax.distributed auto-detects
# coordinator/process ids from the TPU metadata. --devices all maps
# shards over the full global mesh.
gcloud compute tpus tpu-vm ssh "${TPU_NAME}" --zone "${ZONE}" \
  --worker=all --command "
    cd ~/ska-sdp-cip-tpu &&
    python -m ska_sdp_cip_tpu.apps.pipeline_app \
      '${DATASET}' '${OUTPUT}' \
      -n ${NUM_PIXELS} -p ${PIXEL_SIZE} -d all \
      --profile-dir profiles/
  "
