#!/bin/bash
# Vote-count sensitivity on THIS round's DALES dump (VERDICT r4 #7): the
# round-3/4 claim (13-vs-20-vote refinement agreement on the Vaihingen
# mid-chain) lost its artifacts with that machine. Re-derive the same
# question at the DALES 2-vote protocol: run a fresh 1-vote dump from the
# same WL checkpoint, refine both dumps at threshold 10%, and report
# pseudo-label agreement + class-weight deltas.
#
# Usage: scripts/vote_sensitivity_dales.sh
set -eu -o pipefail
PY=${PY:-/opt/venv/bin/python}
WD=${WD:-full_run/dales}
ROOT="$WD/root/DALES"
WL_LOG=${WL_LOG:-Log_2026-08-20_09-40-27}
ONE=${ONE:-${WL_LOG}_1vote}
export CRASH_RETRIES=${CRASH_RETRIES:-2}

# Clone the trained WL log under a new name (checkpoint + params only;
# the 1-vote dump writes its own test/ artifacts under the clone's name)
if [ ! -d "results/WeakLabel/$ONE" ]; then
    mkdir -p "results/WeakLabel/$ONE"
    cp -r "results/WeakLabel/$WL_LOG/checkpoints" \
          "results/WeakLabel/$WL_LOG/parameters.txt" \
          "results/WeakLabel/$ONE/"
fi

RESUME_LOG="results/WeakLabel/$ONE" scripts/resumable.sh results/WeakLabel \
    $PY test_models.py --log "results/WeakLabel/$ONE" --on train \
    --num_votes 1 --data_root "$ROOT" --fused \
    2>&1 | tee "$WD/vote1.log"

$PY pseudoLabel_refinement.py --weak_label_log "$ONE" \
    --threshold 10 --data_root "$ROOT" 2>&1 | tee "$WD/refine1.log"

$PY - <<EOF | tee "$WD/vote_sensitivity.txt"
import numpy as np, glob, os
two = "$ROOT/PseudoLabels/$WL_LOG"
one = "$ROOT/PseudoLabels/$ONE"
tot = agree = both = bagree = lab1 = lab2 = 0
for f2 in sorted(glob.glob(os.path.join(two, "tile_*_t10_pseudo.txt"))):
    f1 = os.path.join(one, os.path.basename(f2))
    a2 = np.loadtxt(f2, dtype=np.int32); a1 = np.loadtxt(f1, dtype=np.int32)
    tot += a2.size; agree += (a1 == a2).sum()
    m = (a1 != 10) & (a2 != 10)
    both += m.sum(); bagree += (a1[m] == a2[m]).sum()
    lab1 += (a1 != 10).sum(); lab2 += (a2 != 10).sum()
w2 = np.loadtxt(glob.glob(os.path.join(two, "*_weight.txt"))[0])
w1 = np.loadtxt(glob.glob(os.path.join(one, "*_weight.txt"))[0])
nz = w2 != 0
rel = np.max(np.abs(w1[nz] - w2[nz]) / np.abs(w2[nz])) if nz.any() else 0.0
print(f"1-vote vs 2-vote pseudo labels over {tot} points:")
print(f"  agreement (all points):        {100*agree/tot:.2f}%")
print(f"  agreement (both labeled):      {100*bagree/max(both,1):.2f}%")
print(f"  labeled fraction: 1-vote {100*lab1/tot:.2f}%  2-vote {100*lab2/tot:.2f}%")
print(f"  class-weight max relative delta: {100*rel:.2f}%")
EOF
