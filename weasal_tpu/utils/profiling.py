"""Lightweight step timing + device profiler integration.

The reference hand-rolls wall-clock EMAs printed at >=1 s intervals
(utils/trainer_WeakLabel.py:190-241) and persists step time as the last
column of training_iteration*.txt. `StepTimer` reproduces that pattern;
`device_trace` wraps jax.profiler for real TPU traces (viewable in
TensorBoard / Perfetto), which the reference has no analog of.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List



class StepTimer:
    """Exponential-moving-average phase timer for the train loop.

    Usage:
        timer = StepTimer(["data", "step", "log"])
        with timer.phase("data"): ...
        if timer.should_display(): print(timer.summary())
    """

    def __init__(self, phases: List[str], smoothing: float = 0.9,
                 display_interval: float = 1.0):
        self.phases = phases
        self.smoothing = smoothing
        self.display_interval = display_interval
        self.ema: Dict[str, float] = {}
        self._last_display = time.time()
        self._count = 0

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        if name in self.ema and self._count >= 2:
            self.ema[name] = (self.smoothing * self.ema[name]
                              + (1 - self.smoothing) * dt)
        else:
            self.ema[name] = dt
        if name == self.phases[-1]:
            self._count += 1

    def should_display(self) -> bool:
        if time.time() - self._last_display > self.display_interval:
            self._last_display = time.time()
            return True
        return False

    def summary(self) -> str:
        return " ".join(f"{p}={1000 * self.ema.get(p, 0):.1f}ms"
                        for p in self.phases)

    def total_ms(self) -> float:
        return 1000 * sum(self.ema.values())


@contextlib.contextmanager
def device_trace(log_dir: str = "/tmp/weasal_trace",
                 enabled: bool = True):
    """jax.profiler trace context (no-op when disabled or unsupported)."""
    if not enabled:
        yield
        return
    import jax
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception as e:                           # pragma: no cover
        print(f"profiler unavailable: {e}")
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
                print(f"device trace written to {log_dir}")
            except Exception:                        # pragma: no cover
                pass
