"""Dense static-shape sphere batch: the device-side input format.

The reference stacks variable-length spheres into ragged arrays with
per-element lengths (datasets/Vaihingen3D_WeakLabel.py:1345-1447). On TPU we
use a dense per-sphere layout instead: every pyramid level l has a static
point budget N_l (chosen by calibration, weasal_tpu/data/batching.py), every
neighborhood a static width K_l, and spheres are padded with shadow rows.

Shadow semantics (identical to the reference):
- padded points carry coordinate 1e6 (models/blocks.py:278),
- shadow neighbor index == N_l, which maps to an appended zero-feature /
  far-away row inside the ops,
- padded labels are -1 (ignored by losses).

All index arrays are sphere-local (in [0, N_l]); the batch axis is only ever
mixed by vmap/einsum, which keeps data-parallel sharding of the B axis
trivial.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class PyramidBatch:
    """One jitted-step input: B spheres with their multi-scale pyramid.

    Tuples are indexed by pyramid level (length = num_layers).
    """

    # Geometry per level
    points: Tuple[jnp.ndarray, ...]      # [B, N_l, 3] float32
    masks: Tuple[jnp.ndarray, ...]       # [B, N_l] bool
    neighbors: Tuple[jnp.ndarray, ...]   # [B, N_l, K_l] int32, self-neighbors
    pools: Tuple[jnp.ndarray, ...]       # [B, N_{l+1}, K_l] int32 into level l
    upsamples: Tuple[jnp.ndarray, ...]   # [B, N_l, U_l] int32 into level l+1

    # Level-0 payload
    features: jnp.ndarray                # [B, N_0, F] float32
    labels: jnp.ndarray                  # [B, N_0] int32, -1 = padding/ignored

    # Per-sphere metadata
    lengths: Tuple[jnp.ndarray, ...]     # [B] int32 real counts per level
    center_pts: jnp.ndarray              # [B, 3] float32 sphere centers

    # Classification payload (reference classification_inputs,
    # datasets/common.py:348-458: one label per cloud, no upsamples)
    cloud_label: Optional[jnp.ndarray] = None    # [B] int32

    # Weak-label payload (zeros/empty when unused)
    cloud_lb: Optional[jnp.ndarray] = None       # [B, C] float32 multi-hot
    region_inds: Optional[jnp.ndarray] = None    # [B, R, P] int32 into N_0
    region_masks: Optional[jnp.ndarray] = None   # [B, R] bool: region exists
    region_point_masks: Optional[jnp.ndarray] = None  # [B, R, P] bool
    region_lb: Optional[jnp.ndarray] = None      # [B, R, C] float32 multi-hot

    # Telemetry: per-edge banded-search window-overflow counts for this
    # batch (all-zero = the device pyramid's neighbor lists are exact; see
    # ops/pallas/radius_pallas.py). Slot layout = ops/pyramid.search_slot;
    # the trainer widens the matching ShapePlan band when an edge's tail
    # grows. None when built by the host pyramid.
    search_overflow: Optional[jnp.ndarray] = None  # [3L-2] float32

    @property
    def num_layers(self) -> int:
        return len(self.points)

    @property
    def batch_size(self) -> int:
        return self.features.shape[0]
