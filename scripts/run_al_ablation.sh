#!/bin/bash
# Active-learning efficacy A/B (VERDICT r3 #3): entropy x class-rarity
# acquisition (the reference's policy, tester_WeakLabel.py:403-474) vs
# uniformly-random unused anchors, at IDENTICAL label budget.
#
# Each arm: WL training with AL_ITERS acquisition rounds, each retraining
# from scratch (the reference's restart protocol) on a shared multi-
# district tile. The arms use SEPARATE COPIES of the data root: the anchor
# ledgers (input_*/*_subsampled_anchors.pkl) live inside the root, so a
# shared root would leak one arm's acquisitions into the other.
#
# Output: per-arm results under $WD/{entropy,random}/results, summarized
# by scripts/compare_al.py (val mIoU per AL iteration at equal budget).
#
# Usage: scripts/run_al_ablation.sh [workdir]   (default full_run/al_ab)
set -eu -o pipefail
PY=${PY:-/opt/venv/bin/python}
WD=${1:-full_run/al_ab}
AL_ITERS=${AL_ITERS:-2}          # acquisition rounds (trainings = +1)
EPOCHS=${EPOCHS:-10}             # epochs per AL iteration
STEPS=${STEPS:-400}
INIT_LABELS=${INIT_LABELS:-300}  # initial anchors per file
ADDED=${ADDED:-300}              # anchors added per acquisition
AL_VOTES=${AL_VOTES:-10}         # votes per acquisition (reference: 10)
EXTENT=${EXTENT:-120.0}
DENSITY=${DENSITY:-6.0}
DISTRICTS=${DISTRICTS:-4}
export CRASH_RETRIES=${CRASH_RETRIES:-2}
mkdir -p "$WD"

MASTER="$WD/root_master/Vaihingen3D"
if [ ! -f "$MASTER/Vaihingen3D_Training.ply" ]; then
    $PY - <<EOF
from weasal_tpu.data.synthetic import make_vaihingen_like_root
make_vaihingen_like_root("$MASTER", extent=$EXTENT, density=$DENSITY,
                         seed=913, districts=$DISTRICTS)
print("master root ready")
EOF
fi

run() {
    echo "=== $* ==="
    if ! "$@"; then
        echo "al_ablation: stage failed: $*" >&2
        exit 1
    fi
}

for ARM in entropy random; do
    ROOT="$WD/$ARM/root/Vaihingen3D"
    if [ ! -f "$ROOT/Vaihingen3D_Training.ply" ]; then
        mkdir -p "$(dirname "$ROOT")"
        # raw plys only: each arm builds its own trees/anchor ledgers
        mkdir -p "$ROOT"
        cp "$MASTER"/*.ply "$ROOT/"
    fi
    SAVE="$WD/$ARM/results/WeakLabel"
    mkdir -p "$SAVE"
    if [ -f "$WD/$ARM/done" ]; then
        echo "=== arm $ARM already complete ==="
        continue
    fi
    # subsample_labels must stay on for AL (the ledger is the budget);
    # both arms share every knob except the acquisition policy.
    run scripts/resumable.sh "$SAVE" \
        $PY train_Vaihingen3D_WeakLabel.py "$SAVE/Log_${ARM}" --fused \
        --data_root "$ROOT" --max_epoch "$EPOCHS" --epoch_steps "$STEPS" \
        --validation_size 50 --al_iterations "$AL_ITERS" \
        --initial_labels "$INIT_LABELS" --al_votes "$AL_VOTES" \
        --al_acquisition "$ARM" \
        2>&1 | tee "$WD/$ARM/wl.log"
    touch "$WD/$ARM/done"
done

$PY scripts/compare_al.py --workdir "$WD" | tee "$WD/summary.txt"
echo "al ablation complete: $WD"
