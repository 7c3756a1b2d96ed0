#!/bin/bash
# Auto-resume wrapper for training/voting runs on the remote-TPU platform.
#
# The tunnel can drop an in-flight RPC and wedge the process. Two layers
# catch that:
#   1. The in-process stall watchdog (weasal_tpu/utils/watchdog.py) exits
#      86 when its heartbeat goes stale.
#   2. This wrapper's OUTER monitor: the watchdog also touches
#      $WEASAL_HEARTBEAT_FILE on every beat; if the file goes stale for
#      STALL_KILL_S (default 1800 s) while the child still runs — i.e. the
#      in-process watchdog itself is wedged (main thread holding the GIL
#      or the interpreter's stdout lock; both observed) — the wrapper
#      kill -9s the child and treats it as a stall.
# Either way the command is rerun until it exits with a non-stall code.
# Training state lives in per-epoch checkpoints, so each retry costs at
# most one epoch.
#
# Usage: scripts/resumable.sh [--no-resume-arg] <results-stage-dir> <command...>
#   e.g. scripts/resumable.sh results/PseudoLabel \
#          /opt/venv/bin/python train_Vaihingen3D_PseudoLabel.py --fused ...
#
# --no-resume-arg: rerun the command UNCHANGED after a stall, for commands
# that do not define --resume (test_models.py voting restarts from scratch
# and overwrites its artifacts — idempotent, just slower).
#
# Resume-target selection: set RESUME_LOG=<dir> to pin the log dir
# explicitly. Otherwise the first retry picks the newest Log_* CREATED (or
# touched) after this wrapper started — i.e. the child's own log — and that
# choice is then FROZEN for every later retry, so a stray newer log from a
# concurrent run (smoke test, other dataset) can't hijack the resume.
set -u
RESUME_SUPPORTED=1
if [ "${1:-}" = "--no-resume-arg" ]; then
    RESUME_SUPPORTED=0; shift
fi
STAGE_DIR=$1; shift
MAX_RETRIES=${MAX_RETRIES:-12}
# CRASH_RETRIES > 0 also reruns a child that CRASHES with a nonzero,
# non-stall exit code (observed: a transient TPU-tunnel FailedPrecondition
# right after a previous process's teardown aborted a chain stage that
# succeeded on plain rerun). Opt-in: the default 0 preserves fail-fast on
# real bugs.
CRASH_RETRIES=${CRASH_RETRIES:-0}
STALL_KILL_S=${STALL_KILL_S:-1800}
MONITOR_INTERVAL_S=${MONITOR_INTERVAL_S:-30}
# The platform's TPU tunnel client leaks host memory per dispatch (measured
# ~22 MB/batch on the 1.9M-point vote loop; a 20-vote dump OOM-killed at
# 131 GB RSS). Restart the child BEFORE the kernel OOM-killer fires, so
# the retry resumes from a checkpoint instead of dying with SIGKILL and
# losing the whole stage. Default: 75% of MemTotal.
MEM_KILL_KB=${MEM_KILL_KB:-$(awk '/MemTotal/{printf "%d", $2*0.75}' /proc/meminfo)}

HB=$(mktemp /tmp/weasal_hb.XXXXXX)
export WEASAL_HEARTBEAT_FILE=$HB
trap 'rm -f "$HB"' EXIT

age() { echo $(( $(date +%s) - $(stat -c %Y "$HB" 2>/dev/null || date +%s) )); }

WRAPPER_START=$(date +%s)
# Optional explicit resume target (ADVICE r3 #1): pins --resume to this
# dir instead of globbing the stage dir.
PINNED_LOG=${RESUME_LOG:-}

try=0
crash=0
RESUME_ARGS=()
while :; do
    touch "$HB"
    HB_INIT_MTIME=$(stat -c %Y "$HB")
    # setsid: the child leads its own process group so a stall kill can
    # take out its whole tree (a bare kill -9 would orphan grandchildren,
    # which keep the stdout/stderr pipes open and wedge the pipeline).
    setsid "$@" ${RESUME_ARGS[@]+"${RESUME_ARGS[@]}"} &
    CHILD=$!
    STALL_KILLED=0
    while kill -0 "$CHILD" 2>/dev/null; do
        sleep "$MONITOR_INTERVAL_S"
        # Before the child's first beat (heartbeat mtime past the
        # wrapper's own initial touch) the kill threshold is 3x — a long
        # pre-first-beat phase (cold compiles through the tunnel on a
        # contended host) must not be killed while making progress
        # (ADVICE r3 #3), but a child wedged from birth must still die
        # eventually. After the first beat, the normal threshold. The
        # RSS guard below stays armed throughout.
        KILL_S=$STALL_KILL_S
        if [ "$(stat -c %Y "$HB" 2>/dev/null || echo "$HB_INIT_MTIME")" \
             -le "$HB_INIT_MTIME" ]; then
            KILL_S=$((3 * STALL_KILL_S))
        fi
        if [ "$(age)" -gt "$KILL_S" ] \
           && kill -0 "$CHILD" 2>/dev/null
        then
            echo "resumable.sh: heartbeat stale >$KILL_S s and the" \
                 "in-process watchdog did not fire; kill -9 group $CHILD" >&2
            kill -9 -- "-$CHILD" 2>/dev/null || kill -9 "$CHILD" 2>/dev/null
            STALL_KILLED=1
        fi
        RSS=$(awk '/VmRSS/{print $2}' "/proc/$CHILD/status" 2>/dev/null)
        if [ -n "${RSS:-}" ] && [ "$RSS" -gt "$MEM_KILL_KB" ]; then
            echo "resumable.sh: child RSS ${RSS} kB > ${MEM_KILL_KB} kB" \
                 "(tunnel-client leak); kill -9 group $CHILD for a" \
                 "checkpoint resume before the kernel OOM-killer fires" >&2
            kill -9 -- "-$CHILD" 2>/dev/null || kill -9 "$CHILD" 2>/dev/null
            STALL_KILLED=1
        fi
    done
    wait "$CHILD"
    rc=$?
    if [ $rc -eq 0 ]; then
        exit 0
    fi
    if [ $rc -eq 86 ] || [ $STALL_KILLED -eq 1 ]; then
        try=$((try + 1))
        if [ $try -gt "$MAX_RETRIES" ]; then
            echo "resumable.sh: giving up after $MAX_RETRIES stalls" >&2
            exit 86
        fi
        kind="stalled (attempt $try)"
    else
        crash=$((crash + 1))
        if [ $crash -gt "$CRASH_RETRIES" ]; then
            exit $rc
        fi
        kind="crashed rc=$rc (crash retry $crash/$CRASH_RETRIES)"
    fi
    # Resolve the resume target per retry. An explicit RESUME_LOG env pin
    # always wins (ADVICE r3 #1 — vote stages resume into the training
    # log, whose marker is a vote_chkp_*.pkl, not a trainer checkpoint).
    # Otherwise prefer the NEWEST log created after this wrapper started
    # that actually contains a restorable trainer checkpoint — a child
    # log that stalled/crashed before its first epoch completed has no
    # checkpoints/current_chkp.tar, and resuming from it crash-loops
    # (observed: PL resume, round 4). When no candidate qualifies, rerun
    # with the ORIGINAL arguments — if they carried a --resume it still
    # points at the last known-good log.
    if [ -n "$PINNED_LOG" ]; then
        TARGET_LOG=$PINNED_LOG
    else
        TARGET_LOG=""
        for cand in $(find "$STAGE_DIR" -maxdepth 1 -name 'Log_*' \
                          -newermt "@$WRAPPER_START" 2>/dev/null \
                      | sort -r) \
                    $(ls -d "$STAGE_DIR"/Log_* 2>/dev/null | sort -r); do
            if [ -f "$cand/checkpoints/current_chkp.tar" ]; then
                TARGET_LOG=$cand
                break
            fi
        done
    fi
    if [ $RESUME_SUPPORTED -eq 0 ] || [ -z "$TARGET_LOG" ]; then
        echo "resumable.sh: $kind; rerunning with original args" >&2
        RESUME_ARGS=()
        continue
    fi
    echo "resumable.sh: $kind; resuming from $TARGET_LOG" >&2
    RESUME_ARGS=(--resume "$TARGET_LOG")   # replace, don't accumulate
done
