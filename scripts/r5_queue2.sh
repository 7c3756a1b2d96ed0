#!/bin/bash
# Round-5 TPU queue, part 2 (after the DALES chain + maxpool A/B):
# AL ablation -> bucketed-plan measurement -> vote-count sensitivity.
set -u
echo "=== AL ablation ($(date)) ==="
rm -rf full_run/al_ab/entropy full_run/al_ab/random
AL_VOTES=6 scripts/run_al_ablation.sh 2>&1 | tail -40
echo "=== size-bucketed plans ($(date)) ==="
scripts/run_bucket_measure.sh 2>&1 | tail -30
echo "=== DALES vote-count sensitivity ($(date)) ==="
scripts/vote_sensitivity_dales.sh 2>&1 | tail -12
echo "=== queue2 complete ($(date)) ==="
