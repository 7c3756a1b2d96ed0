"""bench.py survivable-orchestration tests (VERDICT r4 #1b).

The bench runs every measurement in its own subprocess with a timeout and
one fresh-process retry, and emits whatever completed. These tests drive
the real subprocess path with cheap failure modes (no TPU needed): an
unknown section fails fast, and the induced-kill hook (the round-4
failure mode — hard child death, no traceback) must consume exactly one
retry.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402


def test_unknown_section_reports_error_not_crash():
    r, err = bench.run_section_subprocess("no_such_section", timeout_s=120)
    assert r is None
    assert "rc=" in err and "attempt 2" in err


def test_induced_kill_consumes_one_retry(monkeypatch):
    # Attempt 0 dies with os._exit(137) (the induced-kill hook); attempt 1
    # reaches compute_section, which rejects the unknown name with a clean
    # SystemExit — proving the retry really re-spawned a fresh process.
    monkeypatch.setenv("WEASAL_BENCH_INDUCE_KILL", "no_such_section")
    r, err = bench.run_section_subprocess("no_such_section", timeout_s=120)
    assert r is None
    # the FINAL error is attempt 2's clean failure, not attempt 1's kill
    assert "attempt 2" in err and "no_such_section" in err


def test_section_sentinel_roundtrip():
    # A subprocess that prints the sentinel line is parsed to a dict even
    # with stdout noise around it.
    code = (
        "import json\n"
        f"print('noise before')\n"
        f"print({bench._SENTINEL!r} + json.dumps({{'x': 1}}))\n"
    )
    proc = subprocess.run([sys.executable, "-c", code],
                          capture_output=True, text=True, timeout=60)
    for line in reversed(proc.stdout.splitlines()):
        if line.startswith(bench._SENTINEL):
            assert __import__("json").loads(
                line[len(bench._SENTINEL):]) == {"x": 1}
            break
    else:
        pytest.fail("sentinel line not found")
