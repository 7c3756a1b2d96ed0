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

# ----------------------------------------------------------------------------
# XSpace (xplane.pb) parsing — truthful device-time measurement
# ----------------------------------------------------------------------------
# Through the remote-TPU tunnel `jax.block_until_ready` returns before the
# device finishes, so wall-clock loops measure dispatch rate, not compute
# (discovered round 2; round-1 bench numbers were dispatch-rate). The
# profiler's device plane is ground truth: "XLA Modules" events carry the
# true per-execution duration, "XLA Ops" the per-op self-times.


def _device_planes(trace_dir: str):
    import glob
    import os
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        raise RuntimeError(f"no xplane.pb under {trace_dir}")
    for path in paths:
        space = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            space.ParseFromString(f.read())
        for plane in space.planes:
            if "TPU" in plane.name or "/device:" in plane.name:
                yield plane


def module_times_us(trace_dir: str, name_filter: str = "") -> List[float]:
    """Per-execution device durations (us) of XLA modules in a trace."""
    out: List[float] = []
    for plane in _device_planes(trace_dir):
        meta = plane.event_metadata
        for line in plane.lines:
            if line.name != "XLA Modules":
                continue
            for ev in line.events:
                if name_filter in meta[ev.metadata_id].name:
                    out.append(ev.duration_ps / 1e6)
    return out


def op_self_times_us(trace_dir: str) -> Dict[str, float]:
    """Summed per-op device self-time (us) over a trace ("XLA Ops" line;
    the "Async XLA Ops" line overlaps real work and is excluded)."""
    per_op: Dict[str, float] = {}
    for plane in _device_planes(trace_dir):
        meta = plane.event_metadata
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = meta[ev.metadata_id].name
                per_op[name] = per_op.get(name, 0.0) + ev.duration_ps / 1e6
    return per_op


def categorize_op(event_name: str) -> str:
    """Map an "XLA Ops" event name to a coarse stage category.

    Event text looks like "%fusion.44 = f32[9195,512]{...} fusion(s32[...]
    %copy-done.108, ...)" — operands included, so categorize on the
    DEFINED op's name and opcode only, never the full string.
    """
    import re
    lhs, _, rhs = event_name.partition(" = ")
    opname = lhs.strip().lstrip("%").lower()
    m = re.search(r"\}\s*([a-zA-Z0-9_\-]+)\(", rhs)
    opcode = (m.group(1) if m else "").lower()

    if opname.startswith("kpconv"):
        return "pallas_kpconv"
    if opname.startswith("radius_search"):
        return "pallas_radius_search"
    if "custom-call" in (opcode, opname) or opcode == "custom-call":
        return "custom_call_other"
    for pat, cat in (("sort", "sort_topk"), ("top-k", "sort_topk"),
                     ("gather", "gather"), ("scatter", "scatter"),
                     ("dynamic-slice", "slice_copy"),
                     ("dynamic-update-slice", "slice_copy"),
                     ("slice", "slice_copy"), ("copy", "slice_copy"),
                     ("transpose", "slice_copy"),
                     ("bitcast", "slice_copy"), ("reshape", "slice_copy"),
                     ("dot", "matmul"), ("convolution", "matmul"),
                     ("all-reduce", "collective"),
                     ("reduce-scatter", "collective"),
                     ("all-gather", "collective"),
                     ("fusion", "fusion_elementwise")):
        if opcode.startswith(pat) or opname.startswith(pat):
            return cat
    return "other"


def stage_breakdown(trace_dir: str, steps: int) -> Dict[str, float]:
    """Per-category device self-time (us/step) from a trace."""
    per_cat: Dict[str, float] = {}
    for name, t in op_self_times_us(trace_dir).items():
        cat = categorize_op(name)
        per_cat[cat] = per_cat.get(cat, 0.0) + t / steps
    return dict(sorted(per_cat.items(), key=lambda kv: -kv[1]))
