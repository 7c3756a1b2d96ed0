"""Level-0-only batch assembly for the fused device-pyramid step.

When `config.device_pyramid` is on, the host stops building neighbor indices
entirely: it pads the sampled sphere points/features/labels/regions to the
shape plan's level-0 budget and ships them (plus per-sphere random grid
rotations); the jitted training step then constructs the whole multi-scale
pyramid on device (weasal_tpu/ops/pyramid.py), making
sample -> pyramid -> forward -> backward a single compiled program
(BASELINE.json north star).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

from weasal_tpu.data.batching import (
    ShapePlan, fill_region_row, grid_rotations, payload_meta)
from weasal_tpu.ops.subsample import SHADOW_COORD


def assemble_level0(payloads: Sequence[Dict],
                    plan: ShapePlan,
                    num_classes: int,
                    rng: Optional[np.random.Generator] = None,
                    spatial_sort: bool = True) -> Dict:
    """Pad sphere payloads (from dataset.sample_sphere) to level-0 arrays.

    Returns a dict of numpy arrays consumed by the fused train step:
    points0 [B, N0, 3], mask0 [B, N0], features [B, N0, F],
    labels [B, N0] (-1 pad), rotations [B, 3, 3] (vertical-axis grid
    rotations for voxel de-aliasing), center_pts [B, 3], cloud_lb [B, C],
    region_inds/masks/point_masks/lb like PyramidBatch.

    With `spatial_sort` (default), each sphere's kept points are reordered
    by voxel-linear id in the *grid-rotated* frame — the same frame the
    device pyramid subsamples in — so every pyramid level is ordered along
    one spatial axis and the banded Pallas KPConv kernel sees narrow
    neighbor bands (ops/pallas/kpconv_banded.py). The payload dicts are
    updated in place (points/features/labels/input_inds reordered, region
    indices remapped) so metas built from them stay consistent; the sort is
    semantically free otherwise (all consumers are order-invariant).
    """
    rng = rng or np.random.default_rng()
    B = len(payloads)
    n0 = plan.num_points[0]
    F = payloads[0]["features"].shape[1]
    R, P = max(plan.max_regions, 1), max(plan.max_region_points, 1)

    points0 = np.full((B, n0, 3), SHADOW_COORD, np.float32)
    mask0 = np.zeros((B, n0), bool)
    features = np.zeros((B, n0, F), np.float32)
    labels = np.full((B, n0), -1, np.int32)
    centers = np.zeros((B, 3), np.float32)
    cloud_lb = np.zeros((B, num_classes), np.float32)
    region_inds = np.full((B, R, P), n0, np.int32)
    region_masks = np.zeros((B, R), bool)
    region_point_masks = np.zeros((B, R, P), bool)
    region_lb = np.zeros((B, R, num_classes), np.float32)

    rotations = grid_rotations(rng, B)

    for b, p in enumerate(payloads):
        k = min(p["points"].shape[0], n0)
        if spatial_sort and k:
            _sort_payload(p, rotations[b], k)
        points0[b, :k] = p["points"][:k]
        mask0[b, :k] = True
        features[b, :k] = p["features"][:k]
        if p.get("labels") is not None:
            labels[b, :k] = p["labels"][:k]
        centers[b] = p.get("center", np.zeros(3))
        if p.get("cloud_lb") is not None:
            cloud_lb[b] = p["cloud_lb"]
        fill_region_row(region_inds[b], region_point_masks[b],
                        region_masks[b], region_lb[b],
                        p.get("regions"), k, rng)

    return dict(points0=points0, mask0=mask0, features=features,
                labels=labels, rotations=rotations, center_pts=centers,
                cloud_lb=cloud_lb, region_inds=region_inds,
                region_masks=region_masks,
                region_point_masks=region_point_masks, region_lb=region_lb)


def _sort_payload(p: Dict, rotation: np.ndarray, k: int) -> None:
    """Reorder the first `k` payload rows by grid-rotated voxel order.

    Voxel size = extent/256 (fine enough that the order is effectively a
    lexicographic spatial sort; the exact granularity only affects band
    tightness, not correctness).
    """
    pts = p["points"][:k] @ rotation          # rotated frame (pts @ R)
    lo = pts.min(axis=0)
    extent = float(max(pts.max() - lo.min(), 1e-6))
    vox = np.floor((pts - lo) / (extent / 256.0)).astype(np.int64)
    dims = vox.max(axis=0) + 1
    lin = (vox[:, 0] * dims[1] + vox[:, 1]) * dims[2] + vox[:, 2]
    perm = np.argsort(lin, kind="stable")
    if np.array_equal(perm, np.arange(k)):
        return
    inv = np.empty(k, np.int64)
    inv[perm] = np.arange(k)

    for key in ("points", "features", "labels", "input_inds"):
        if p.get(key) is not None:
            arr = np.asarray(p[key])
            p[key] = np.concatenate([arr[:k][perm], arr[k:]], axis=0)
    if p.get("regions"):
        remapped = []
        for inds, lb in p["regions"]:
            inds = np.asarray(inds, dtype=np.int64)
            inds = inds[inds < k]
            remapped.append((inv[inds], lb))
        p["regions"] = remapped


class Level0BatchSource:
    """Adapter exposing next_batch() that returns level-0 arrays + metas.

    Drop-in replacement for a dataset in the fused-pyramid training loop; sampling
    (potentials) still runs on the dataset.
    """

    def __init__(self, dataset, plan: ShapePlan):
        self.dataset = dataset
        self.plan = plan
        self.config = dataset.config

    def next_batch(self, rng, plan=None, num_spheres=None, augment=None):
        plan = plan or self.plan
        ds = self.dataset
        b = num_spheres or ds.config.batch_num
        if augment is None:
            augment = ds.split == "training"
        payloads = [ds.sample_sphere(rng, augment=augment,
                                     max_points=plan.num_points[0])
                    for _ in range(b)]
        arrays = assemble_level0(payloads, plan, ds.config.num_classes, rng)
        metas = [payload_meta(p, plan.num_points[0]) for p in payloads]
        return arrays, metas
