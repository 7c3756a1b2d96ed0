"""Shared geometry of the banded Pallas kernels.

The banded radius search (radius_pallas.py), the banded KPConv
(kpconv_banded.py) and the band CALIBRATION (ops/pyramid.measure_bands /
data/batching._band_from_need) must agree on the window scheme: tile
rows, the 128-row block quantum window starts are quantized at, and how
many blocks a half-window W expands to. Calibration measures coverage
need under exactly this rule; if a kernel changed its copy independently,
bands would be measured with one coverage rule and consumed with another,
producing uncounted neighbor drops. Single-sourcing here makes the
invariant structural instead of comment-enforced.
"""

from __future__ import annotations

from jax.experimental.pallas import tpu as pltpu

DEFAULT_TILE = 128
DEFAULT_BAND = 512
QUANTUM = 128          # window block rows; window starts quantized at this

# v5e has 128 MB of VMEM; the default 16 MB *scoped* limit rejects wide
# windows at coarse levels and the resident dX/dW slabs of the widest
# convs. Raise it (headroom left for Mosaic's own scratch).
COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def n_win(band: int) -> int:
    """Window block count for half-window W (coverage of spans <= W+1):
    ceil(W/QUANTUM) + 1 — the +1 block absorbs the start quantization."""
    return -(-band // QUANTUM) + 1
