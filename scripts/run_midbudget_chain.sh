#!/bin/bash
# Mid-budget two-stage chain on MULTI-DISTRICT synthetic data (VERDICT r2
# #2): WL train -> probability vote dump -> pseudo-label refinement -> PL
# train -> PL eval, at ~1/3 of the reference budgets. Round 2's full-budget
# run on a single-style tile overfit (val mIoU peak 50.0% at epoch 7 ->
# 29.6% at epoch 80); this rerun uses a structurally diverse 8-district
# training tile so the val trajectory measures training health, not
# memorization.
#
# Usage: scripts/run_midbudget_chain.sh [workdir]   (default full_run/mid)
# -e + pipefail: `run ... | tee` puts run() in a pipeline subshell, so its
# internal exit only kills the subshell — the -e on the pipeline's status
# is what actually stops the chain.
set -eu -o pipefail
PY=${PY:-/opt/venv/bin/python}
WD=${1:-full_run/mid}
ROOT="$WD/root/Vaihingen3D"
WL_EPOCHS=${WL_EPOCHS:-30}
WL_STEPS=${WL_STEPS:-600}
PL_EPOCHS=${PL_EPOCHS:-50}
PL_STEPS=${PL_STEPS:-200}
EVAL_VOTES=${EVAL_VOTES:-20}
# Re-entry point after a mid-chain failure: START_STAGE=3 skips the
# completed WL training and vote dump (their artifacts must exist).
START_STAGE=${START_STAGE:-1}
# The tunnel can refuse new clients for ~2-4 min after a previous TPU
# process's teardown (transient FAILED_PRECONDITION on the first device
# fetch) — every stage that touches the TPU runs with crash retries on by
# default (ADVICE r3 #2).
export CRASH_RETRIES=${CRASH_RETRIES:-2}
mkdir -p "$WD"

if [ ! -f "$ROOT/Vaihingen3D_Training.ply" ]; then
    $PY - <<EOF
from weasal_tpu.data.synthetic import make_vaihingen_like_root
make_vaihingen_like_root("$ROOT", extent=160.0, density=8.0, seed=42,
                         districts=8)
print("root ready")
EOF
fi

# NOTE: each stage runs inside a pipeline (tee); pipefail is what stops
# the chain when a stage fails (under `set -e` a failing "$@" exits the
# pipeline subshell directly, so post-hoc rc checks there are dead code).
run() {
    echo "=== $* ==="
    if ! "$@"; then
        echo "chain: stage failed: $*" >&2
        exit 1
    fi
}

if [ "$START_STAGE" -le 1 ]; then
# Stage 1: weak-label training (mid budget), stall-resumable
run scripts/resumable.sh results/WeakLabel \
    $PY train_Vaihingen3D_WeakLabel.py --fused \
    --data_root "$ROOT" --max_epoch "$WL_EPOCHS" --epoch_steps "$WL_STEPS" \
    --validation_size 50 --al_iterations 0 \
    2>&1 | tee "$WD/wl.log"
fi

# Resolve the WL log ONCE (newest after stage 1) and pin every later
# stage to it — stages 2-5 must not re-glob (ADVICE r3 #1: a stray newer
# log, e.g. from a concurrent smoke run, would hijack the chain).
WL_LOG_DIR=$(ls -d results/WeakLabel/Log_* 2>/dev/null | sort | tail -1)
WL_LOG=$(basename "$WL_LOG_DIR")

if [ "$START_STAGE" -le 2 ]; then
# Stage 2: 20-vote probability dump on the training tile. test_models.py
# resumes from the per-boundary vote checkpoint on stall/OOM retries;
# RESUME_LOG pins the retries to the chain's own WL log.
run env RESUME_LOG="$WL_LOG_DIR" scripts/resumable.sh results/WeakLabel \
    $PY test_models.py --log "$WL_LOG_DIR" --on train --num_votes 20 \
    --data_root "$ROOT" --fused 2>&1 | tee "$WD/vote.log"
fi

if [ "$START_STAGE" -le 3 ]; then
# Stage 3: pseudo-label refinement (threshold 20%, reference default).
# Host-side numpy, but wrapped anyway: a transient failure should not
# abort the chain (ADVICE r3 #2).
run scripts/resumable.sh --no-resume-arg results/WeakLabel \
    $PY pseudoLabel_refinement.py --weak_label_log "$WL_LOG" \
    --data_root "$ROOT" 2>&1 | tee "$WD/refine.log"
fi

if [ "$START_STAGE" -le 4 ]; then
# Stage 4: pseudo-label training (mid budget)
run scripts/resumable.sh results/PseudoLabel \
    $PY train_Vaihingen3D_PseudoLabel.py --fused \
    --data_root "$ROOT" --weak_label_log "$WL_LOG" \
    --max_epoch "$PL_EPOCHS" --epoch_steps "$PL_STEPS" \
    --validation_size 50 2>&1 | tee "$WD/pl.log"
fi

# Stage 5: PL eval — validation-set voting inference (reference protocol;
# EVAL_VOTES scales the vote count to the available wall clock).
run scripts/resumable.sh results/PseudoLabel \
    $PY test_models.py --log last_Vaihingen3DPL --on validation \
    --num_votes "$EVAL_VOTES" \
    --data_root "$ROOT" --fused 2>&1 | tee "$WD/eval.log"

echo "chain complete: logs under $WD"
