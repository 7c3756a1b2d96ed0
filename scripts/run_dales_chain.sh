#!/bin/bash
# DALES-structure two-stage chain on a synthetic MULTI-TILE root (VERDICT
# r3 #2): WL train -> 2-vote probability dump over the training tiles ->
# pseudo-label refinement (threshold 10%) -> PL train -> PL voting eval on
# the validation tile, at a mid budget.
#
# This is the multi-cloud path the Vaihingen chains never exercise at
# product scale: per-cloud anchor ledgers, cross-cloud potential argmin,
# multi-file calibration, and vote reprojection across files (reference
# protocol: train_DALES_WeakLabel.py:139-176, datasets/DALES_WeakLabel.py:
# 64-130 — 29 training tiles + 1 validation + 11 test; here 9+1+3 via
# _DALESBase root discovery, structure-preserving at synthetic scale).
#
# Usage: scripts/run_dales_chain.sh [workdir]   (default full_run/dales)
set -eu -o pipefail
PY=${PY:-/opt/venv/bin/python}
WD=${1:-full_run/dales}
ROOT="$WD/root/DALES"
TRAIN_TILES=${TRAIN_TILES:-10}   # 9 train + 1 validation (last by name)
TEST_TILES=${TEST_TILES:-3}
EXTENT=${EXTENT:-100.0}
DENSITY=${DENSITY:-8.0}
WL_EPOCHS=${WL_EPOCHS:-30}
WL_STEPS=${WL_STEPS:-300}
PL_EPOCHS=${PL_EPOCHS:-50}
PL_STEPS=${PL_STEPS:-100}
INIT_LABELS=${INIT_LABELS:-120}  # ref 7000/file on 12M-pt tiles, scaled
REFINE_THD=${REFINE_THD:-10}     # reference DALES refinement threshold
WL_VOTES=${WL_VOTES:-2}          # reference DALES protocol: 2 votes
EVAL_VOTES=${EVAL_VOTES:-2}
START_STAGE=${START_STAGE:-1}
export CRASH_RETRIES=${CRASH_RETRIES:-2}
mkdir -p "$WD"

if [ ! -f "$ROOT/tile_00.ply" ]; then
    $PY - <<EOF
from weasal_tpu.data.synthetic import make_dales_like_root
make_dales_like_root("$ROOT", extent=$EXTENT, density=$DENSITY, seed=77,
                     train_tiles=$TRAIN_TILES, test_tiles=$TEST_TILES)
print("root ready")
EOF
fi

run() {
    echo "=== $* ==="
    if ! "$@"; then
        echo "chain: stage failed: $*" >&2
        exit 1
    fi
}

if [ "$START_STAGE" -le 1 ]; then
run scripts/resumable.sh results/WeakLabel \
    $PY train_DALES_WeakLabel.py --fused \
    --data_root "$ROOT" --max_epoch "$WL_EPOCHS" --epoch_steps "$WL_STEPS" \
    --validation_size 50 --al_iterations 0 --initial_labels "$INIT_LABELS" \
    2>&1 | tee "$WD/wl.log"
fi

WL_LOG_DIR=$(ls -d results/WeakLabel/Log_* 2>/dev/null | sort | tail -1)
WL_LOG=$(basename "$WL_LOG_DIR")

if [ "$START_STAGE" -le 2 ]; then
run env RESUME_LOG="$WL_LOG_DIR" scripts/resumable.sh results/WeakLabel \
    $PY test_models.py --log "$WL_LOG_DIR" --on train \
    --num_votes "$WL_VOTES" --data_root "$ROOT" --fused \
    2>&1 | tee "$WD/vote.log"
fi

if [ "$START_STAGE" -le 3 ]; then
run scripts/resumable.sh --no-resume-arg results/WeakLabel \
    $PY pseudoLabel_refinement.py --weak_label_log "$WL_LOG" \
    --threshold "$REFINE_THD" --data_root "$ROOT" \
    2>&1 | tee "$WD/refine.log"
fi

if [ "$START_STAGE" -le 4 ]; then
run scripts/resumable.sh results/PseudoLabel \
    $PY train_DALES_PseudoLabel.py --fused \
    --data_root "$ROOT" --weak_label_log "$WL_LOG" --al_iterations 0 \
    --max_epoch "$PL_EPOCHS" --epoch_steps "$PL_STEPS" \
    --validation_size 50 2>&1 | tee "$WD/pl.log"
fi

PL_LOG_DIR=$(ls -d results/PseudoLabel/Log_* 2>/dev/null | sort | tail -1)
run env RESUME_LOG="$PL_LOG_DIR" scripts/resumable.sh results/PseudoLabel \
    $PY test_models.py --log "$PL_LOG_DIR" --on validation \
    --num_votes "$EVAL_VOTES" --data_root "$ROOT" --fused \
    2>&1 | tee "$WD/eval.log"

echo "chain complete: logs under $WD"
