#!/bin/bash
# Multi-host TPU pod slice launch for the imaging pipeline — the
# TPU-native equivalent of the reference's SLURM + ssh dask cluster
# bring-up (reference: slurm/csd3_icelake.sh:1-96). There is no
# scheduler process: every host runs the same SPMD program and joins
# via jax.distributed (coordinator = worker 0).
#
# Covers what the reference script covers, plus what it does not:
#  * env setup on every worker (venv + editable install + native build),
#  * optional UVW reorder stage before imaging (-t du dv dw),
#  * preemption handling: imaging runs with --checkpoint-dir and the
#    launcher RETRIES after preemption/transient failures, resuming
#    CLEAN from the last completed major cycle (the reference's SLURM
#    job sends SIGTERM@120 and loses all work, csd3_icelake.sh:13),
#  * a launch-scoped run id shared by every host (reorder barrier).
#
# Usage (from a machine with gcloud access to the TPU pod):
#   ./tpu_pod_launch.sh <tpu-name> <zone> <dataset.vz> <out.npy>
#
# Environment knobs:
#   NUM_PIXELS (10240)  PIXEL_SIZE (1.1 asec)  CLEAN_CYCLES (0)
#   TILE_SIZE ("" = skip reorder; e.g. "30000 30000 60000")
#   WORKDIR (~/ska-sdp-cip-tpu)  SHARED_DIR (dataset's directory)
#   MAX_RETRIES (3)
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
CLEAN_CYCLES="${CLEAN_CYCLES:-0}"
TILE_SIZE="${TILE_SIZE:-}"
WORKDIR="${WORKDIR:-\$HOME/ska-sdp-cip-tpu}"
SHARED_DIR="${SHARED_DIR:-$(dirname "${DATASET}")}"
MAX_RETRIES="${MAX_RETRIES:-3}"
RUN_ID="cip-$(date +%Y%m%d-%H%M%S)-$$"

run_all() {
  gcloud compute tpus tpu-vm ssh "${TPU_NAME}" --zone "${ZONE}" \
    --worker=all --command "$1"
}

# --- one-time environment setup on every worker ----------------------
run_all "
  set -e
  cd ${WORKDIR}
  if [ ! -d .venv ]; then
    python3 -m venv .venv
    .venv/bin/pip install -e .[test] 'jax[tpu]'
  fi
  make -C native
"

# --- optional reorder stage ------------------------------------------
# CIP_RUN_ID scopes the multi-host pass-1 barrier markers to THIS
# launch (apps/uvw_reorder_app.py resolve_run_id).
if [ -n "${TILE_SIZE}" ]; then
  run_all "
    set -e
    cd ${WORKDIR}
    CIP_RUN_ID='${RUN_ID}' .venv/bin/tpu-cip-reorder-uvw \
      '${DATASET}' -t ${TILE_SIZE} -o '${SHARED_DIR}/tiles' \
      --num-hosts \$(curl -s -H 'Metadata-Flavor: Google' \
        'http://metadata.google.internal/computeMetadata/v1/instance/attributes/worker-network-endpoints' \
        | tr ',' '\n' | wc -l) \
      --host-index \$(curl -s -H 'Metadata-Flavor: Google' \
        'http://metadata.google.internal/computeMetadata/v1/instance/attributes/agent-worker-number')
  "
fi

# --- imaging with preemption retries ---------------------------------
# Checkpoints land next to the output on the shared filesystem; a
# relaunch after preemption resumes CLEAN from the last completed
# major cycle instead of starting over.
CLEAN_ARGS=""
if [ "${CLEAN_CYCLES}" -gt 0 ]; then
  CLEAN_ARGS="--clean ${CLEAN_CYCLES} --checkpoint-dir '${SHARED_DIR}/ckpt-${RUN_ID}'"
fi

attempt=0
until run_all "
  set -e
  cd ${WORKDIR}
  .venv/bin/tpu-cip '${DATASET}' '${OUTPUT}' \
    -n ${NUM_PIXELS} -p ${PIXEL_SIZE} -d all ${CLEAN_ARGS} \
    --profile-dir '${SHARED_DIR}/profiles-${RUN_ID}/'
"; do
  attempt=$((attempt + 1))
  if [ "${attempt}" -ge "${MAX_RETRIES}" ]; then
    echo "imaging failed after ${MAX_RETRIES} attempts" >&2
    exit 1
  fi
  echo "attempt ${attempt} failed (preemption?); retrying in 30 s" >&2
  sleep 30
done

echo "done: ${OUTPUT} (run ${RUN_ID})"
