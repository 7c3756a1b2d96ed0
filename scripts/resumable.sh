#!/bin/bash
# Auto-resume wrapper for training/voting runs on the remote-TPU platform.
#
# The tunnel can drop an in-flight RPC and wedge the process; the stall
# watchdog (weasal_tpu/utils/watchdog.py) turns that into exit code 86.
# This wrapper reruns the command with --resume <latest Log_*> until it
# exits with any other code. Training state lives in per-epoch
# checkpoints, so each retry costs at most one epoch.
#
# Usage: scripts/resumable.sh <results-stage-dir> <command...>
#   e.g. scripts/resumable.sh results/PseudoLabel \
#          /opt/venv/bin/python train_Vaihingen3D_PseudoLabel.py --fused ...
set -u
STAGE_DIR=$1; shift
MAX_RETRIES=${MAX_RETRIES:-12}

try=0
RESUME_ARGS=()
while :; do
    "$@" ${RESUME_ARGS[@]+"${RESUME_ARGS[@]}"}
    rc=$?
    if [ $rc -ne 86 ]; then
        exit $rc
    fi
    try=$((try + 1))
    if [ $try -gt "$MAX_RETRIES" ]; then
        echo "resumable.sh: giving up after $MAX_RETRIES stalls" >&2
        exit 86
    fi
    LATEST=$(ls -d "$STAGE_DIR"/Log_* 2>/dev/null | sort | tail -1)
    if [ -z "$LATEST" ]; then
        echo "resumable.sh: stall before any Log_* existed; rerunning" >&2
        continue
    fi
    echo "resumable.sh: stalled (attempt $try); resuming from $LATEST" >&2
    RESUME_ARGS=(--resume "$LATEST")   # replace, don't accumulate
done
