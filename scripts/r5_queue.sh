#!/bin/bash
# Round-5 TPU work queue: waits for the DALES chain to release the chip,
# then runs the remaining measured items back-to-back so the TPU never
# idles at a stage boundary (VERDICT r4: demonstrations died at round
# end because long runs started too late).
#   1. max-pool backward A/B (bench vaihingen section, new argmax route
#      vs the dense oracle) — VERDICT r4 #6 measurement
#   2. AL ablation, entropy vs random at equal budget — VERDICT r4 #3
set -u
PY=${PY:-/opt/venv/bin/python}
CHAIN_PID=${1:?usage: r5_queue.sh <chain-pid>}

while kill -0 "$CHAIN_PID" 2>/dev/null; do sleep 30; done
echo "=== chain done ($(date)) — 1. maxpool A/B ==="

mkdir -p full_run/perf
timeout 1500 $PY bench.py --section vaihingen > /tmp/mp_argmax.log 2>&1
rc1=$?
WEASAL_MAXPOOL=dense timeout 1500 $PY bench.py --section vaihingen \
    > /tmp/mp_dense.log 2>&1
rc2=$?
{ echo "# max_pool backward route A/B at Vaihingen bench shapes (round 5; argmax = flat re-gather route now default, dense = jnp.max VJP). rc=$rc1/$rc2"
  grep -h '^@@BENCH_SECTION@@' /tmp/mp_argmax.log | sed 's/^@@BENCH_SECTION@@ /{"route": "argmax", "r": /; s/$/}/'
  grep -h '^@@BENCH_SECTION@@' /tmp/mp_dense.log | sed 's/^@@BENCH_SECTION@@ /{"route": "dense", "r": /; s/$/}/'
} > full_run/perf/maxpool_route.jsonl
echo "=== 2. AL ablation ==="
# wipe round-4's 3-minute partial arm state (stale Log_entropy dir and a
# possibly part-built ledger) so both arms start from the master root
# with freshly built, equal-budget ledgers. AL_VOTES=6 (identical in
# both arms) trims the acquisition dumps to fit the round; the full
# 10-vote protocol was already demonstrated in round 3's AL run.
rm -rf full_run/al_ab/entropy full_run/al_ab/random
AL_VOTES=6 scripts/run_al_ablation.sh 2>&1 | tail -40
echo "=== 3. size-bucketed plans on the long-tailed tile ==="
scripts/run_bucket_measure.sh 2>&1 | tail -30
echo "=== 4. DALES vote-count sensitivity (1 vs 2 votes) ==="
scripts/vote_sensitivity_dales.sh 2>&1 | tail -12
echo "=== queue complete ($(date)) ==="
