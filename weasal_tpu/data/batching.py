"""Shape plan + host-side pyramid building for dense static batches.

The reference calibrates a PID-controlled `batch_limit` (points per ragged
batch) and per-layer `neighborhood_limits`
(datasets/Vaihingen3D_WeakLabel.py:1036-1342). The TPU design promotes this
to a first-class **shape plan**: static per-level point budgets N_l, neighbor
widths K_l, and region budgets (R, P), chosen once from sampled-sphere
percentiles and persisted (`shape_plan.json`) — every training step then
compiles exactly once.

`build_sphere_pyramid` computes the multi-scale pyramid of one sphere on the
host (same radius schedule as the reference's segmentation_inputs,
datasets/common.py:461-577: conv at r_l, pool after subsampling at
dl_{l+1} = 2 dl_l, upsample at 2 r_l with per-element random grid rotations);
`assemble_batch` pads B spheres into one PyramidBatch.

The device-side pyramid (weasal_tpu/ops/pyramid.py) mirrors this with
fixed-shape XLA ops for the fully-fused step.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from weasal_tpu.data.batch import PyramidBatch
from weasal_tpu.ops.neighbors import radius_search
from weasal_tpu.ops.subsample import SHADOW_COORD, grid_subsample
from weasal_tpu.kernels.kernel_points import create_3d_rotations


@dataclasses.dataclass
class ShapePlan:
    """Static shape budgets for one config's pyramid."""
    num_points: List[int]          # N_l per level
    conv_neighbors: List[int]      # K_l per level
    pool_neighbors: List[int]      # width of pools[l] (levels 0..L-2)
    up_neighbors: int = 1          # only column 0 is consumed (closest_pool)
    max_regions: int = 0           # R (weak-label sub-regions per sphere)
    max_region_points: int = 0     # P (points per sub-region)
    # Measured per-edge band half-windows for the banded Pallas kernels
    # (ops/pallas/): {"search": {"conv"|"pool"|"up": [W_l]},
    # "kpconv": {...}} in support rows — the radius search needs key-range
    # windows, the conv needs (narrower) index-spread windows — sized from
    # observed per-tile spreads at calibration time
    # (ops/pyramid.measure_bands). None = analytic auto_band fallback.
    bands: Optional[Dict[str, Dict[str, List[int]]]] = None
    # Optional small-sphere bucket (config.plan_bucket_percentile > 0):
    # {"num_points": [N_l], "cut": int}. Real tiles have long-tailed
    # sphere sizes (mean ~1/3 of max on the 1.9M-point quality tile), so a
    # p100-only plan runs ~50% shadow rows on the average batch. Training
    # batches whose every sphere has <= `cut` level-0 points run through a
    # second compiled step sized at these budgets instead — no points are
    # cropped (unlike plan_point_percentile thinning), so quality is
    # identical by construction; the reference gets the same effect with
    # variable spheres-per-batch under a point budget
    # (Vaihingen3D_WeakLabel.py:1154-1257).
    small: Optional[Dict] = None

    @property
    def num_layers(self) -> int:
        return len(self.num_points)

    def derive_small(self) -> Optional["ShapePlan"]:
        """ShapePlan for the small bucket: per-level point budgets from
        `small`, everything else — neighbor widths, region budget, measured
        BANDS (shared by reference, so trainer band self-tuning widens both
        plans at once) — inherited. Bands are upper bounds in sorted-row
        units; windows measured on the full sphere population remain valid
        (merely generous) for small spheres."""
        if not self.small:
            return None
        return ShapePlan(num_points=list(self.small["num_points"]),
                         conv_neighbors=self.conv_neighbors,
                         pool_neighbors=self.pool_neighbors,
                         up_neighbors=self.up_neighbors,
                         max_regions=self.max_regions,
                         max_region_points=self.max_region_points,
                         bands=self.bands,
                         small=None)

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(dataclasses.asdict(self), f, indent=2)

    @classmethod
    def load(cls, path: str) -> "ShapePlan":
        with open(path) as f:
            return cls(**json.load(f))


def payload_meta(payload: Dict, n0: int) -> Dict:
    """Host-side per-sphere metadata every batch source attaches.

    Single source for the trainer/tester contract: `has_regions` lets the
    weak-mode empty-batch skip run on host metas instead of fetching
    `batch.region_masks` from the device (a full tunnel round-trip per
    step), and `n_real`/`input_inds` drive the vote scatter.
    """
    return dict(cloud_ind=payload["cloud_ind"],
                input_inds=payload["input_inds"],
                center=payload["center"],
                has_regions=bool(payload.get("regions")),
                n_real=min(payload["input_inds"].shape[0], n0))


def fill_region_row(region_inds_b: np.ndarray,
                    region_point_masks_b: np.ndarray,
                    region_masks_b: np.ndarray,
                    region_lb_b: np.ndarray,
                    regions, limit: int,
                    rng: np.random.Generator) -> None:
    """Fill one sphere's rows of the padded region tables.

    Single source for the weak-label region budget rule (filter members
    past the kept-point `limit`, random-subsample crowded regions to P)
    used identically by the host-pyramid (assemble_batch), fused
    (assemble_level0) and resident (pack_payloads) paths — the parity
    tests between those paths rely on the rule staying in lockstep.
    """
    R, P = region_inds_b.shape
    for ri, (inds, lb) in enumerate((regions or [])[:R]):
        inds = np.asarray(inds, dtype=np.int64)
        inds = inds[inds < limit]
        if inds.size == 0:
            continue
        if inds.size > P:
            inds = rng.choice(inds, size=P, replace=False)
        region_inds_b[ri, :inds.size] = inds
        region_point_masks_b[ri, :inds.size] = True
        region_masks_b[ri] = True
        region_lb_b[ri] = lb


def grid_rotations(rng: np.random.Generator, n: int) -> np.ndarray:
    """[n, 3, 3] random vertical-axis rotations for voxel de-aliasing.

    Shared by assemble_level0 and pack_payloads, which must draw the SAME
    rng stream positions so the host and resident fused paths stay
    bit-identical for a given seed.
    """
    theta = rng.random(n) * 2 * np.pi
    c, s = np.cos(theta), np.sin(theta)
    rotations = np.zeros((n, 3, 3), np.float32)
    rotations[:, 0, 0] = c
    rotations[:, 0, 1] = -s
    rotations[:, 1, 0] = s
    rotations[:, 1, 1] = c
    rotations[:, 2, 2] = 1.0
    return rotations


def _round_up(x: int, m: int) -> int:
    return ((int(x) + m - 1) // m) * m


def layer_radii(config) -> Tuple[List[float], List[float], List[float]]:
    """Per-level (conv_radius, pool_radius, up_radius) in meters.

    Mirrors the reference's radius schedule: r_l = dl_l * conv_radius with
    dl_l = first_subsampling_dl * 2^l; deform layers widen by
    deform_radius / conv_radius (datasets/common.py:487-534).
    """
    conv_r, pool_r, up_r = [], [], []
    r_normal = config.first_subsampling_dl * config.conv_radius
    deform_layers = getattr(config, "deform_layers", None) or \
        [False] * config.num_layers
    for l in range(config.num_layers):
        if deform_layers[l]:
            r = r_normal * config.deform_radius / config.conv_radius
        else:
            r = r_normal
        conv_r.append(r)
        pool_r.append(r)
        up_r.append(2 * r_normal)
        r_normal *= 2
    return conv_r, pool_r, up_r


def build_sphere_pyramid(points: np.ndarray,
                         config,
                         rng: Optional[np.random.Generator] = None,
                         max_neighbors: Optional[Sequence[int]] = None,
                         max_pool_neighbors: Optional[Sequence[int]] = None,
                         random_grid_orient: bool = True,
                         with_upsamples: bool = True) -> Dict:
    """Host pyramid of one sphere: per-level points + neighbor index lists.

    Returns dict with keys 'points' (list of [n_l, 3]), 'neighbors'
    (list of [n_l, K] into level l), 'pools' (list of [n_{l+1}, K] into
    level l), 'upsamples' (list of [n_l, 1] into level l+1). Widths are
    data-driven unless `max_neighbors` caps them.
    """
    rng = rng or np.random.default_rng()
    conv_r, pool_r, up_r = layer_radii(config)
    L = config.num_layers

    level_points = [np.asarray(points, dtype=np.float32)]
    for l in range(L - 1):
        dl = config.first_subsampling_dl * (2 ** (l + 1))
        pts = level_points[l]
        if random_grid_orient:
            theta = rng.random() * 2 * np.pi
            phi = (rng.random() - 0.5) * np.pi
            u = np.array([[np.cos(theta) * np.cos(phi),
                           np.sin(theta) * np.cos(phi),
                           np.sin(phi)]])
            alpha = np.array([rng.random() * 2 * np.pi])
            R = create_3d_rotations(u, alpha)[0].astype(np.float32)
            sub = grid_subsample(pts @ R.T, dl=dl) @ R
        else:
            sub = grid_subsample(pts, dl=dl)
        level_points.append(sub.astype(np.float32))

    neighbors, pools, upsamples = [], [], []
    for l in range(L):
        cap = max_neighbors[l] if max_neighbors is not None else 0
        neighbors.append(radius_search(level_points[l], level_points[l],
                                       conv_r[l], max_count=cap))
        if l < L - 1:
            pool_cap = (max_pool_neighbors[l]
                        if max_pool_neighbors is not None else cap)
            pools.append(radius_search(level_points[l + 1], level_points[l],
                                       pool_r[l], max_count=pool_cap))
            if with_upsamples:
                up = radius_search(level_points[l], level_points[l + 1],
                                   up_r[l], max_count=1)
                upsamples.append(up)
    return {"points": level_points, "neighbors": neighbors,
            "pools": pools, "upsamples": upsamples}


def calibrate_shape_plan(sphere_point_clouds: Sequence[np.ndarray],
                         config,
                         untouched_ratio: float = 0.9,
                         point_percentile: float = 100.0,
                         region_budget: Tuple[int, int] = (0, 0),
                         rng: Optional[np.random.Generator] = None,
                         bucket_percentile: float = 0.0,
                         ) -> ShapePlan:
    """Choose static budgets from sampled spheres.

    - N_l: `point_percentile` of observed level-l point counts, padded ~10%
      and rounded up to a multiple of 8 (sublane-friendly);
    - K_l: the neighbor count that keeps `untouched_ratio` of neighborhoods
      uncropped (same rule as the reference's neighborhood_limits,
      Vaihingen3D_WeakLabel.py:1280-1283);
    - `bucket_percentile` in (0, 100): additionally size a small-sphere
      bucket (`plan.small`) — per-level p100 budgets over the subset of
      calibration spheres whose level-0 count is at or below that
      percentile, plus the level-0 `cut` that routes a sampled sphere into
      the bucket. Upper levels are sized from the SUBSET's own counts
      (voxel occupancy does not scale linearly with level-0 size, ADVICE
      r3 #5), not scaled down proportionally.
    """
    rng = rng or np.random.default_rng(0)
    L = config.num_layers
    counts: List[List[int]] = [[] for _ in range(L)]
    conv_hist: List[List[np.ndarray]] = [[] for _ in range(L)]
    pool_hist: List[List[np.ndarray]] = [[] for _ in range(L - 1)]

    for pts in sphere_point_clouds:
        pyr = build_sphere_pyramid(pts, config, rng=rng)
        for l in range(L):
            counts[l].append(pyr["points"][l].shape[0])
            n_s = pyr["points"][l].shape[0]
            conv_hist[l].append(
                np.sum(pyr["neighbors"][l] < n_s, axis=1))
        for l in range(L - 1):
            n_s = pyr["points"][l].shape[0]
            pool_hist[l].append(np.sum(pyr["pools"][l] < n_s, axis=1))

    def percentile_width(rows: List[np.ndarray]) -> int:
        allc = np.concatenate(rows)
        return int(np.quantile(allc, untouched_ratio)) + 1

    # point_percentile sizes LEVEL 0 ONLY: the runtime crop that makes an
    # undersized budget legal is the sampler's level-0 thinning
    # (datasets.sample_sphere max_points), and random point thinning
    # barely reduces the occupied-VOXEL counts that set the upper-level
    # sizes — an upper level sized at p<100 of uncropped calibration
    # counts would overflow (surface as kernel_drops) for every sphere
    # above the percentile (ADVICE r3 #5). Upper levels stay at p100.
    num_points = [
        _round_up(np.percentile(counts[l],
                                point_percentile if l == 0 else 100.0)
                  * 1.1 + 1, 8)
        for l in range(L)]
    conv_neighbors = [percentile_width(conv_hist[l]) for l in range(L)]
    pool_neighbors = [percentile_width(pool_hist[l]) for l in range(L - 1)]

    small = None
    if 0.0 < bucket_percentile < 100.0:
        counts0 = np.asarray(counts[0])
        cut = int(np.percentile(counts0, bucket_percentile))
        in_bucket = counts0 <= cut
        # Degenerate distributions (uniform synthetic demo spheres) can
        # put everything in one bucket — then there is nothing to gain
        if 0 < int(in_bucket.sum()) < len(counts0):
            small_points = []
            for l in range(L):
                sub = np.asarray(counts[l])[in_bucket]
                small_points.append(_round_up(sub.max() * 1.1 + 1, 8))
            # Every sphere routed by `cut` must fit the bucket's level 0
            small_points[0] = max(small_points[0], _round_up(cut + 1, 8))
            if small_points[0] < num_points[0]:
                small = {"num_points": small_points, "cut": cut}
    return ShapePlan(num_points=num_points, conv_neighbors=conv_neighbors,
                     pool_neighbors=pool_neighbors,
                     max_regions=region_budget[0],
                     max_region_points=region_budget[1],
                     small=small)


def assemble_classification_batch(clouds: Sequence[Dict],
                                  plan: ShapePlan) -> PyramidBatch:
    """Dense classification batch: the ShapePlan port of the reference's
    `classification_inputs` (datasets/common.py:348-458) — a pyramid with
    conv + pool indices but no upsamples, one label per cloud.

    Each element of `clouds`: {'pyramid': build_sphere_pyramid(...,
    with_upsamples=False), 'features': [n0, F], 'label': int,
    'center': [3] optional}.
    """
    B = len(clouds)
    L = plan.num_layers
    F = clouds[0]["features"].shape[1]

    points = [np.zeros((B, plan.num_points[l], 3), np.float32)
              for l in range(L)]
    masks = [np.zeros((B, plan.num_points[l]), bool) for l in range(L)]
    neighbors = [np.zeros((B, plan.num_points[l], plan.conv_neighbors[l]),
                          np.int32) for l in range(L)]
    pools = [np.zeros((B, plan.num_points[l + 1], plan.pool_neighbors[l]),
                      np.int32) for l in range(L - 1)]
    features = np.zeros((B, plan.num_points[0], F), np.float32)
    lengths = [np.zeros((B,), np.int32) for _ in range(L)]
    centers = np.zeros((B, 3), np.float32)
    cloud_label = np.full((B,), -1, np.int32)

    for b, s in enumerate(clouds):
        pyr = s["pyramid"]
        for l in range(L):
            pts = pyr["points"][l]
            points[l][b], masks[l][b] = _pad_points(pts, plan.num_points[l])
            lengths[l][b] = min(pts.shape[0], plan.num_points[l])
            neighbors[l][b] = _pad_neighbors(
                pyr["neighbors"][l], plan.num_points[l],
                plan.conv_neighbors[l], pts.shape[0], plan.num_points[l])
        for l in range(L - 1):
            pts = pyr["points"][l]
            pools[l][b] = _pad_neighbors(
                pyr["pools"][l], plan.num_points[l + 1],
                plan.pool_neighbors[l], pts.shape[0], plan.num_points[l])
        k0 = min(pyr["points"][0].shape[0], plan.num_points[0])
        features[b, :k0] = s["features"][:k0]
        centers[b] = s.get("center", np.zeros(3))
        cloud_label[b] = int(s["label"])

    n0 = plan.num_points[0]
    return PyramidBatch(
        points=tuple(points), masks=tuple(masks),
        neighbors=tuple(neighbors), pools=tuple(pools), upsamples=(),
        features=features, labels=np.full((B, n0), -1, np.int32),
        lengths=tuple(lengths), center_pts=centers,
        cloud_label=cloud_label)


def _pad_points(pts: np.ndarray, n: int) -> Tuple[np.ndarray, np.ndarray]:
    k = min(pts.shape[0], n)
    out = np.full((n, 3), SHADOW_COORD, dtype=np.float32)
    out[:k] = pts[:k]
    mask = np.zeros(n, dtype=bool)
    mask[:k] = True
    return out, mask


def _pad_neighbors(inds: np.ndarray, n_rows: int, width: int,
                   n_support_real: int, n_support_pad: int) -> np.ndarray:
    """Crop/pad an index matrix to [n_rows, width]; remap shadows.

    Input shadow = n_support_real; output shadow = n_support_pad (the padded
    level size). Rows are distance-sorted so cropping keeps the nearest.
    Support indices >= n_support_pad (points dropped by level truncation)
    also become shadows.
    """
    rows = min(inds.shape[0], n_rows)
    out = np.full((n_rows, width), n_support_pad, dtype=np.int32)
    w = min(inds.shape[1], width)
    block = inds[:rows, :w].astype(np.int32).copy()
    block[block >= min(n_support_real, n_support_pad)] = n_support_pad
    out[:rows, :w] = block
    return out


def assemble_batch(spheres: Sequence[Dict],
                   plan: ShapePlan,
                   num_classes: int,
                   rng: Optional[np.random.Generator] = None) -> PyramidBatch:
    """Pad per-sphere pyramids + payloads into one dense PyramidBatch.

    Each element of `spheres` is a dict:
        pyramid: output of build_sphere_pyramid
        features: [n_0, F]
        labels: [n_0] int (already label-to-idx mapped); optional
        center: [3]
        cloud_lb: [C] multi-hot; optional
        regions: list of (point_index_array, multi_hot_label); optional
    """
    rng = rng or np.random.default_rng()
    B = len(spheres)
    L = plan.num_layers
    F = spheres[0]["features"].shape[1]

    points = [np.zeros((B, plan.num_points[l], 3), np.float32)
              for l in range(L)]
    masks = [np.zeros((B, plan.num_points[l]), bool) for l in range(L)]
    neighbors = [np.zeros((B, plan.num_points[l], plan.conv_neighbors[l]),
                          np.int32) for l in range(L)]
    pools = [np.zeros((B, plan.num_points[l + 1], plan.pool_neighbors[l]),
                      np.int32) for l in range(L - 1)]
    upsamples = [np.zeros((B, plan.num_points[l], plan.up_neighbors),
                          np.int32) for l in range(L - 1)]
    features = np.zeros((B, plan.num_points[0], F), np.float32)
    labels = np.full((B, plan.num_points[0]), -1, np.int32)
    lengths = [np.zeros((B,), np.int32) for l in range(L)]
    centers = np.zeros((B, 3), np.float32)

    R, P = plan.max_regions, plan.max_region_points
    cloud_lb = np.zeros((B, num_classes), np.float32)
    region_inds = np.full((B, max(R, 1), max(P, 1)),
                          plan.num_points[0], np.int32)
    region_masks = np.zeros((B, max(R, 1)), bool)
    region_point_masks = np.zeros((B, max(R, 1), max(P, 1)), bool)
    region_lb = np.zeros((B, max(R, 1), num_classes), np.float32)

    for b, s in enumerate(spheres):
        pyr = s["pyramid"]
        real_n0 = pyr["points"][0].shape[0]
        # Truncation of oversized level-0 spheres is handled upstream (the
        # sampler thins points before the pyramid); here we only crop.
        for l in range(L):
            pts = pyr["points"][l]
            points[l][b], masks[l][b] = _pad_points(pts, plan.num_points[l])
            lengths[l][b] = min(pts.shape[0], plan.num_points[l])
            neighbors[l][b] = _pad_neighbors(
                pyr["neighbors"][l], plan.num_points[l],
                plan.conv_neighbors[l], pts.shape[0], plan.num_points[l])
        for l in range(L - 1):
            pts = pyr["points"][l]
            pools[l][b] = _pad_neighbors(
                pyr["pools"][l], plan.num_points[l + 1],
                plan.pool_neighbors[l], pts.shape[0], plan.num_points[l])
            upsamples[l][b] = _pad_neighbors(
                pyr["upsamples"][l], plan.num_points[l], plan.up_neighbors,
                pyr["points"][l + 1].shape[0], plan.num_points[l + 1])

        k0 = min(real_n0, plan.num_points[0])
        features[b, :k0] = s["features"][:k0]
        if s.get("labels") is not None:
            labels[b, :k0] = s["labels"][:k0]
        centers[b] = s.get("center", np.zeros(3))
        if s.get("cloud_lb") is not None:
            cloud_lb[b] = s["cloud_lb"]
        fill_region_row(region_inds[b], region_point_masks[b],
                        region_masks[b], region_lb[b],
                        s.get("regions"), k0, rng)

    return PyramidBatch(
        points=tuple(points), masks=tuple(masks),
        neighbors=tuple(neighbors), pools=tuple(pools),
        upsamples=tuple(upsamples), features=features, labels=labels,
        lengths=tuple(lengths), center_pts=centers,
        cloud_lb=cloud_lb,
        region_inds=region_inds,
        region_masks=region_masks, region_point_masks=region_point_masks,
        region_lb=region_lb)
