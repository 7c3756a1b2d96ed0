"""scripts/resumable.sh stall-recovery contract.

Observed failure modes this wrapper exists for (see watchdog.py header):
the in-process stall watchdog exits 86 (rerun with --resume), or the
process wedges so hard the watchdog itself cannot run (outer heartbeat
monitor kill -9s it and reruns). test_models.py-style commands without a
--resume flag are rerun unchanged via --no-resume-arg.
"""

import os
import stat
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WRAPPER = os.path.join(REPO, "scripts", "resumable.sh")


def _fake_cmd(tmp_path, body):
    path = tmp_path / "fake.sh"
    path.write_text("#!/bin/bash\n" + body)
    path.chmod(path.stat().st_mode | stat.S_IEXEC)
    return str(path)


def _stage(tmp_path, checkpoint=True):
    d = tmp_path / "stage" / "Log_a"
    d.mkdir(parents=True)
    if checkpoint:
        # Resume candidates must hold a restorable trainer checkpoint
        (d / "checkpoints").mkdir()
        (d / "checkpoints" / "current_chkp.tar").write_bytes(b"")
    return str(tmp_path / "stage")


def _run(args, timeout=60, env=None):
    e = dict(os.environ, MONITOR_INTERVAL_S="1")
    e.update(env or {})
    return subprocess.run(["bash", WRAPPER] + args, capture_output=True,
                          text=True, timeout=timeout, env=e)


def test_exit_86_resumes_with_latest_log(tmp_path):
    marker = tmp_path / "marker"
    cmd = _fake_cmd(tmp_path, f"""
if [ ! -f {marker} ]; then touch {marker}; echo run1 "$@"; exit 86; fi
echo run2 "$@"; exit 0
""")
    r = _run([_stage(tmp_path), cmd, "--foo"])
    assert r.returncode == 0, (r.stdout, r.stderr)
    assert "run1 --foo\n" in r.stdout
    assert "run2 --foo --resume" in r.stdout          # resume arg appended


def test_checkpointless_log_is_not_a_resume_target(tmp_path):
    """A log dir without checkpoints/current_chkp.tar (the child died
    before its first epoch completed) must not be picked as the retry
    target — the retry reruns with the ORIGINAL args, whose own --resume
    still points at the last good log. Regression: round-4 PL resume
    crash-looped on FileNotFoundError resuming its own checkpointless
    log."""
    marker = tmp_path / "marker"
    stage = _stage(tmp_path, checkpoint=False)
    # the child "creates" a new log (no checkpoint) then stalls once
    cmd = _fake_cmd(tmp_path, f"""
mkdir -p {stage}/Log_b
if [ ! -f {marker} ]; then touch {marker}; echo run1 "$@"; exit 86; fi
echo run2 "$@"; exit 0
""")
    r = _run([stage, cmd, "--resume", "orig_log"])
    assert r.returncode == 0, (r.stdout, r.stderr)
    assert "run2 --resume orig_log\n" in r.stdout     # original args kept
    assert "rerunning with original args" in r.stderr


def test_retry_follows_newest_checkpointed_log(tmp_path):
    """When the child's own new log HAS a checkpoint, the retry resumes
    from it (not from the older pre-existing log) so completed epochs
    are not lost."""
    marker = tmp_path / "marker"
    stage = _stage(tmp_path)
    cmd = _fake_cmd(tmp_path, f"""
mkdir -p {stage}/Log_z/checkpoints
touch {stage}/Log_z/checkpoints/current_chkp.tar
if [ ! -f {marker} ]; then touch {marker}; exit 86; fi
echo run2 "$@"; exit 0
""")
    r = _run([stage, cmd])
    assert r.returncode == 0, (r.stdout, r.stderr)
    assert "run2 --resume " + stage + "/Log_z" in r.stdout


def test_no_resume_arg_reruns_unchanged(tmp_path):
    marker = tmp_path / "marker"
    cmd = _fake_cmd(tmp_path, f"""
if [ ! -f {marker} ]; then touch {marker}; exit 86; fi
echo run2 args:"$@"; exit 0
""")
    r = _run(["--no-resume-arg", _stage(tmp_path), cmd, "--foo"])
    assert r.returncode == 0, (r.stdout, r.stderr)
    assert "run2 args:--foo\n" in r.stdout            # no --resume added


def test_non_stall_exit_codes_pass_through(tmp_path):
    cmd = _fake_cmd(tmp_path, "exit 3\n")
    r = _run([_stage(tmp_path), cmd])
    assert r.returncode == 3


def test_crash_retries_rerun_with_resume(tmp_path):
    """With CRASH_RETRIES set, a nonzero non-stall exit (e.g. a transient
    tunnel FailedPrecondition) is rerun with --resume; the budget is
    separate from the stall budget and exhausting it passes the rc through."""
    marker = tmp_path / "marker"
    cmd = _fake_cmd(tmp_path, f"""
if [ ! -f {marker} ]; then touch {marker}; echo run1; exit 1; fi
echo run2 "$@"; exit 0
""")
    stage = _stage(tmp_path)
    r = _run([stage, cmd], env={"CRASH_RETRIES": "2"})
    assert r.returncode == 0, (r.stdout, r.stderr)
    assert "run2 --resume" in r.stdout
    assert "crash retry 1/2" in r.stderr

    # budget exhausted -> original exit code propagates
    cmd2 = _fake_cmd(tmp_path, "exit 5\n")
    r2 = _run([stage, cmd2], env={"CRASH_RETRIES": "1"})
    assert r2.returncode == 5


def test_wedged_child_is_killed_and_rerun(tmp_path):
    """A child that never touches the heartbeat file (fully wedged — even
    the in-process watchdog can't run) is kill -9d by the outer monitor
    and the command rerun."""
    marker = tmp_path / "marker"
    cmd = _fake_cmd(tmp_path, f"""
if [ ! -f {marker} ]; then touch {marker}; sleep 300; exit 0; fi
echo recovered; exit 0
""")
    r = _run(["--no-resume-arg", _stage(tmp_path), cmd], timeout=90,
             env={"STALL_KILL_S": "2"})
    assert r.returncode == 0, (r.stdout, r.stderr)
    assert "recovered" in r.stdout
    assert "kill -9" in r.stderr


def test_bloated_child_is_killed_and_resumed(tmp_path):
    """A child whose RSS exceeds MEM_KILL_KB (the tunnel client's
    per-dispatch host leak) is kill -9d proactively — before the kernel
    OOM-killer — and rerun with --resume."""
    marker = tmp_path / "marker"
    cmd = _fake_cmd(tmp_path, f"""
touch "$WEASAL_HEARTBEAT_FILE"
if [ ! -f {marker} ]; then
  touch {marker}
  # balloon ~80 MB of RSS, then idle (heartbeat stays fresh)
  exec /opt/venv/bin/python -c '
import os, time
x = bytearray(80 * 1024 * 1024)
f = os.environ["WEASAL_HEARTBEAT_FILE"]
for _ in range(300):
    os.utime(f)
    time.sleep(1)'
fi
echo resumed "$@"; exit 0
""")
    r = _run([_stage(tmp_path), cmd], timeout=120,
             env={"MEM_KILL_KB": "40000"})
    assert r.returncode == 0, (r.stdout, r.stderr)
    assert "resumed" in r.stdout
    assert "--resume" in r.stdout
    assert "RSS" in r.stderr


def test_beating_child_is_left_alone(tmp_path):
    """A slow child that beats (touches $WEASAL_HEARTBEAT_FILE) must NOT
    be killed even with a tight STALL_KILL_S."""
    cmd = _fake_cmd(tmp_path, """
for i in 1 2 3 4 5 6; do sleep 1; touch "$WEASAL_HEARTBEAT_FILE"; done
echo finished; exit 0
""")
    r = _run(["--no-resume-arg", _stage(tmp_path), cmd], timeout=60,
             env={"STALL_KILL_S": "3"})
    assert r.returncode == 0, (r.stdout, r.stderr)
    assert "finished" in r.stdout
    assert "kill -9" not in r.stderr
