"""Stall watchdog: turn silent hangs into restartable crashes.

On this platform the remote-TPU tunnel connection can drop under load;
an in-flight RPC then never completes and the training process blocks
forever in a `device_get`/dispatch futex wait (observed: a 150-epoch run
hung at epoch 34 with all threads sleeping and the tunnel's connection
threads respawned). No exception is raised, so only liveness monitoring
can catch it.

`StallWatchdog` is a daemon thread armed with a heartbeat: the training
and voting loops call `beat()` every time real progress completes (a
batch consumed, a flush returned, a vote epoch finished). If no beat
arrives for `timeout_s`, the watchdog prints a diagnostic and hard-exits
the process with `EXIT_STALLED` — `os._exit`, because the main thread is
wedged in native code and cannot run Python signal handlers or atexit
hooks. Per-epoch checkpoints (`current_chkp.tar`) + `--resume` make the
restart cheap; `full_run/chain3.sh`-style wrappers loop on the exit code.

The reference has no equivalent (its failure story is the kill-file +
checkpoint restart, utils/trainer_WeakLabel.py:146-150,274-288); this is
the TPU-platform extension of SURVEY §5.3.
"""

from __future__ import annotations

import faulthandler
import os
import threading
import time

EXIT_STALLED = 86

# faulthandler.dump_traceback_later is a process-global singleton: two live
# watchdogs (e.g. a vote inside an active-learning training run) would
# re-arm/cancel each other's wedge-diagnostic backstop (ADVICE r3 #4). The
# first instance to arm it owns it; others run their kill thread only.
_fh_lock = threading.Lock()
_fh_owner: "StallWatchdog | None" = None


def _fh_acquire(inst: "StallWatchdog") -> bool:
    global _fh_owner
    with _fh_lock:
        if _fh_owner is None:
            _fh_owner = inst
        return _fh_owner is inst


def _fh_release(inst: "StallWatchdog") -> bool:
    global _fh_owner
    with _fh_lock:
        if _fh_owner is inst:
            _fh_owner = None
            return True
        return False


class StallWatchdog:
    """Hard-exit the process when no heartbeat arrives for `timeout_s`.

    :param timeout_s: stall threshold; pick well above the longest
        legitimate gap between beats (first-compile through the tunnel is
        minutes; 900 s default leaves a wide margin). <= 0 disables.
    :param label: printed in the stall diagnostic.
    """

    @classmethod
    def from_config(cls, config, label: str) -> "StallWatchdog":
        """Armed on real-TPU backends only (the hang mode is tunnel
        RPC loss); disabled elsewhere (CPU CI must not be killed for
        being slow)."""
        import jax
        timeout = float(getattr(config, "stall_watchdog_s", 0) or 0)
        if jax.default_backend() != "tpu":
            timeout = 0.0
        return cls(timeout, label=label)

    def __init__(self, timeout_s: float = 900.0, label: str = "train"):
        self.timeout_s = float(timeout_s)
        self.label = label
        self._last = time.monotonic()
        self._beaten = False
        self._stop = threading.Event()
        self._thread = None
        # External heartbeat file (scripts/resumable.sh exports the path):
        # beat() touches it so an OUTER process can detect a stall even
        # when this in-process watchdog cannot run at all (main thread
        # wedged while holding the GIL) and hard-kill us.
        self._hb_file = os.environ.get("WEASAL_HEARTBEAT_FILE")
        self._hb_touched = 0.0
        self._fh_owned = False
        if self.timeout_s > 0:
            if self._hb_file:
                try:
                    with open(self._hb_file, "a"):
                        pass
                except OSError:
                    self._hb_file = None
            # GIL-free diagnostic backstop: a C-level timer that dumps
            # every thread's stack to stderr if no beat re-arms it for
            # 1.5x the stall timeout — when a hang DOES slip past the
            # thread below, the dump shows where the process was wedged.
            # exit=False: reaping stays the job of _run / the outer
            # monitor so the exit code contract (86) holds. Armed only if
            # no other live watchdog already owns the global timer.
            self._fh_owned = _fh_acquire(self)
            if self._fh_owned:
                faulthandler.dump_traceback_later(self.timeout_s * 1.5,
                                                  exit=False)
            self._thread = threading.Thread(target=self._run, daemon=True)
            self._thread.start()

    def beat(self) -> None:
        now = time.monotonic()
        self._last = now
        self._beaten = True
        if self.timeout_s > 0 and now - self._hb_touched > 5.0:
            self._hb_touched = now
            if self._hb_file:
                try:
                    os.utime(self._hb_file)
                except OSError:
                    pass
            if self._fh_owned:
                faulthandler.dump_traceback_later(self.timeout_s * 1.5,
                                                  exit=False)   # re-arm

    def stop(self) -> None:
        self._stop.set()
        if self.timeout_s > 0 and _fh_release(self):
            faulthandler.cancel_dump_traceback_later()

    def _run(self) -> None:
        while not self._stop.wait(min(self.timeout_s / 4, 60.0)):
            stale = time.monotonic() - self._last
            # First-beat grace: the gap between construction and the
            # first completed step legitimately includes a cold XLA
            # compile through the tunnel on a contended host (observed
            # >900 s when self-tuned bands invalidated the compile
            # cache). 3x the steady-state threshold before the first
            # beat; normal afterwards.
            threshold = (self.timeout_s if self._beaten
                         else 3.0 * self.timeout_s)
            if stale > threshold:
                # Raw fd write + immediate _exit: print()/sys.stdout would
                # take the interpreter's stdout lock, which the wedged main
                # thread can be holding mid-write — observed to delay the
                # exit by 20+ minutes. os.write to stderr takes no Python
                # locks; _exit skips atexit/stdio entirely.
                msg = (f"[watchdog] {self.label}: no progress for "
                       f"{stale:.0f} s (> {threshold:.0f} s) — "
                       f"assuming a lost tunnel RPC; exiting "
                       f"{EXIT_STALLED} for a checkpoint resume.\n")
                try:
                    os.write(2, msg.encode())
                except OSError:
                    pass
                os._exit(EXIT_STALLED)
