#!/bin/bash
# Round-5 continuation of the DALES-structure chain (VERDICT r4 #2).
#
# Round 4 finished stage 1 (WL train, results/WeakLabel/Log_2026-08-20_
# 09-40-27) and died mid-stage-2 (2-vote dump, vote checkpoint at
# test_epoch 2, last_min 0.5). This machine kept the artifacts, so:
# resume stage 2 from its vote checkpoint, then hand off to
# run_dales_chain.sh for stages 3-5 (refine -> PL train -> PL eval).
set -eu -o pipefail
PY=${PY:-/opt/venv/bin/python}
WD=${1:-full_run/dales}
ROOT="$WD/root/DALES"
WL_LOG_DIR=${WL_LOG_DIR:-results/WeakLabel/Log_2026-08-20_09-40-27}
export CRASH_RETRIES=${CRASH_RETRIES:-2}

if [ ! -f "$WL_LOG_DIR/vote_chkp_train.pkl" ]; then
    echo "no vote checkpoint under $WL_LOG_DIR; run the full chain" >&2
    exit 1
fi

echo "=== stage 2 (resume): 2-vote dump over training tiles ==="
RESUME_LOG="$WL_LOG_DIR" scripts/resumable.sh results/WeakLabel \
    $PY test_models.py --resume "$WL_LOG_DIR" --on train \
    --num_votes "${WL_VOTES:-2}" --data_root "$ROOT" --fused \
    2>&1 | tee -a "$WD/vote.log"

START_STAGE=3 scripts/run_dales_chain.sh "$WD"
