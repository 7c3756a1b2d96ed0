#!/bin/bash
# Size-bucketed shape plans, measured on the long-tailed tile that
# motivated them (VERDICT r4 #4 / r3 #4): regenerate the 1.9M-point
# multi-district Vaihingen-like tile and train the SAME short budget at
# p100 (one plan sized to the largest sphere) vs --plan_buckets 80
# (bucket-homogeneous batches, no point cropping). Report device step
# time (loop stats + profiler) and the val-mIoU trajectory of both arms.
#
# Usage: scripts/run_bucket_measure.sh [workdir] (default full_run/buckets)
set -eu -o pipefail
PY=${PY:-/opt/venv/bin/python}
WD=${1:-full_run/buckets}
ROOT="$WD/root/Vaihingen3D"
EPOCHS=${EPOCHS:-3}
STEPS=${STEPS:-600}
INIT_LABELS=${INIT_LABELS:-600}
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

for ARM in p100 b80; do
    EXTRA=()
    if [ "$ARM" = "b80" ]; then EXTRA=(--plan_buckets 80); fi
    SAVE="$WD/$ARM/results/WeakLabel"
    if [ -f "$WD/$ARM/done" ]; then continue; fi
    rm -rf "$WD/$ARM"           # partial arm from an interrupted run
    mkdir -p "$SAVE"
    WEASAL_LOOP_STATS=1 scripts/resumable.sh "$SAVE" \
        $PY train_Vaihingen3D_WeakLabel.py "$SAVE/Log_$ARM" --fused \
        --data_root "$ROOT" --max_epoch "$EPOCHS" --epoch_steps "$STEPS" \
        --validation_size 50 --al_iterations 0 \
        --initial_labels "$INIT_LABELS" \
        ${EXTRA[@]+"${EXTRA[@]}"} 2>&1 | tee "$WD/$ARM.log"
    touch "$WD/$ARM/done"
done

echo "=== summary ==="
for ARM in p100 b80; do
    echo "--- $ARM"
    grep -E "loop-stats|mean IoU" "$WD/$ARM.log" | tail -8
done
