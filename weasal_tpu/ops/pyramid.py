"""Device-side multi-scale pyramid: the fully-fused input path.

The reference builds conv/pool/upsample neighbor indices in C++ worker
processes per batch (datasets/common.py:461-577 calling the cpp_wrappers).
Here the whole pyramid is fixed-shape XLA: voxel-grid subsampling
(ops/subsample.grid_subsample_fixed) and radius search
(ops/neighbors.radius_search_fixed) vmapped over the sphere axis, so
sample -> pyramid -> forward -> backward compiles into ONE program
(BASELINE.json north star). The host then only crops spheres and assembles
features.

Semantics match the host pyramid builder (weasal_tpu/data/batching.py):
same radius schedule, distance-sorted neighbor rows, shadow index = N_l,
optional per-sphere random grid rotations for voxel de-aliasing.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from weasal_tpu.data.batch import PyramidBatch
from weasal_tpu.data.batching import ShapePlan, layer_radii
from weasal_tpu.ops.neighbors import radius_search_fixed
from weasal_tpu.ops.subsample import grid_extent_cells, grid_subsample_fixed
from weasal_tpu.utils.platform import resolve_pallas_flag


def _plan_tuple(plan: ShapePlan):
    return (tuple(plan.num_points), tuple(plan.conv_neighbors),
            tuple(plan.pool_neighbors), plan.up_neighbors)


_EDGE_ORDER = ("conv", "pool", "up")


def plan_bands_tuple(plan: ShapePlan):
    """plan.bands["search"] -> hashable static tuple
    ((conv...), (pool...), (up...)) for jit, or None when the plan carries
    no measured bands. The search windows are key-range bound and wider
    than the KPConv windows (plan.bands["kpconv"], consumed by
    models/blocks via config.pallas_band_table)."""
    bands = getattr(plan, "bands", None)
    if not bands or "search" not in bands:
        return None
    return tuple(tuple(int(w) for w in bands["search"].get(k, ()))
                 for k in _EDGE_ORDER)


def _edge_band(bands, edge: str, l: int) -> int:
    """Measured half-window for (edge, level), 0 when unavailable."""
    if bands is None:
        return 0
    row = bands[_EDGE_ORDER.index(edge)]
    return row[l] if l < len(row) else 0


def search_slot(edge: str, l: int, L: int) -> int:
    """Slot of (edge, level) in the [3L-2] search-overflow vector:
    conv_0..conv_{L-1}, pool_0..pool_{L-2}, up_0..up_{L-2}."""
    return {"conv": l, "pool": L + l, "up": 2 * L - 1 + l}[edge]


def drop_vector_layout(L: int):
    """(kind, edge, level) labels for the trainer's concatenated per-edge
    drop vector [(2L-1) + (3L-2)]: KPConv oob slots first (matching
    KPConv.band_slot in models/blocks), then the search-overflow slots
    (matching _build_pyramid's vector / search_slot above). The per-edge
    attribution is what makes the band windows self-tuning: when an
    epoch's counted drops on one edge exceed the expected calibration
    tail, the trainer widens exactly that edge's persisted band
    (ShapePlan.bands) by one quantum instead of only warning."""
    kp = ([("kpconv", "conv", l) for l in range(L)]
          + [("kpconv", "pool", l) for l in range(L - 1)])
    se = ([("search", "conv", l) for l in range(L)]
          + [("search", "pool", l) for l in range(L - 1)]
          + [("search", "up", l) for l in range(L - 1)])
    return kp + se


@partial(jax.jit, static_argnames=("num_points", "conv_neighbors",
                                   "pool_neighbors", "up_neighbors",
                                   "dl0", "conv_radii", "pool_radii",
                                   "up_radii", "in_radius", "scale_max",
                                   "chunk", "banded", "band", "bands",
                                   "interpret"))
def _build_pyramid(points0: jnp.ndarray,
                   mask0: jnp.ndarray,
                   rotations: Optional[jnp.ndarray],
                   num_points: Tuple[int, ...],
                   conv_neighbors: Tuple[int, ...],
                   pool_neighbors: Tuple[int, ...],
                   up_neighbors: int,
                   dl0: float,
                   conv_radii: Tuple[float, ...],
                   pool_radii: Tuple[float, ...],
                   up_radii: Tuple[float, ...],
                   in_radius: float,
                   scale_max: float = 1.25,
                   chunk: int = 512,
                   banded: bool = False,
                   band: int = 512,
                   bands: Optional[Tuple[Tuple[int, ...], ...]] = None,
                   interpret: bool = False):
    L = len(num_points)
    points = [points0]
    masks = [mask0]

    # Subsampled levels (optionally in a rotated frame per sphere)
    for l in range(L - 1):
        dl = dl0 * (2 ** (l + 1))
        n_cells = grid_extent_cells(in_radius, dl, scale_max)
        pts, msk = points[l], masks[l]
        if rotations is not None:
            # HIGHEST precision: default matmuls run at bf16 granularity on
            # this platform, which would jitter meter-scale coordinates by
            # ~2^-9 * extent (cm) through the rotate/unrotate round trip.
            pts_r = jnp.einsum("bnd,bde->bne", pts, rotations,
                               precision=jax.lax.Precision.HIGHEST)
        else:
            pts_r = pts
        sub, sub_mask = jax.vmap(
            lambda p, m: grid_subsample_fixed(
                p, m, dl, num_points[l + 1], n_cells))(pts_r, msk)
        if rotations is not None:
            sub = jnp.einsum("bnd,bed->bne", sub, rotations,
                             precision=jax.lax.Precision.HIGHEST)
        points.append(sub)
        masks.append(sub_mask)

    # Per-edge overflow vector (search_slot layout) so the trainer can
    # attribute drops to the exact undersized band window; zeros on the
    # XLA fallback path (exact search, nothing to overflow).
    overflow = jnp.zeros((3 * L - 2,), jnp.float32)
    if banded:
        from weasal_tpu.ops.pallas.radius_pallas import (auto_band,
                                                         radius_search_banded)

        # Monotone sort keys: the rotated-frame x coordinate (each level
        # is emitted in rotated-frame voxel-linear order; level 0 is sorted
        # the same way by assemble_level0). Margin = the level's voxel
        # size (x varies within one x-voxel slab).
        if rotations is not None:
            skeys = [jnp.einsum("bnd,bd->bn", p, rotations[:, :, 0],
                                precision=jax.lax.Precision.HIGHEST)
                     for p in points]
        else:
            skeys = [p[:, :, 0] for p in points]

        def search(edge, l, lq, ls, r, k):
            nonlocal overflow
            # Sort slack: only the SUPPORT side's key disorder matters
            # (tile lo/hi come from actual query keys); that disorder is
            # bounded by the support level's voxel size. Level 0 is sorted
            # by assemble_level0 at extent/256 with extent up to
            # 2*scale_max*in_radius under scale augmentation, which can
            # exceed dl0 for deep configs — take the larger bound.
            margin = dl0 * (2 ** ls)
            if ls == 0:
                margin = max(margin,
                             2.0 * max(scale_max, 1.1) * in_radius / 256.0)
            w = band if band else _edge_band(bands, edge, l)
            if not w:
                w = auto_band(
                    float(r), float(margin), num_points[lq], num_points[ls],
                    in_radius)
            idx, ovf = radius_search_banded(
                points[lq], points[ls], masks[lq], masks[ls],
                skeys[lq], skeys[ls], radius=float(r), max_count=int(k),
                band=w, margin=float(margin), interpret=interpret)
            overflow = overflow.at[search_slot(edge, l, L)].add(
                jnp.sum(ovf))
            return idx
    else:
        def search(edge, l, lq, ls, r, k):
            return jax.vmap(
                lambda q, s, qm, sm: radius_search_fixed(
                    q, s, qm, sm, r, k, chunk))(
                points[lq], points[ls], masks[lq], masks[ls])

    neighbors, pools, upsamples = [], [], []
    for l in range(L):
        neighbors.append(search("conv", l, l, l,
                                conv_radii[l], conv_neighbors[l]))
        if l < L - 1:
            pools.append(search("pool", l, l + 1, l, pool_radii[l],
                                pool_neighbors[l]))
            upsamples.append(search("up", l, l, l + 1,
                                    up_radii[l], up_neighbors))
    return tuple(points), tuple(masks), tuple(neighbors), tuple(pools), \
        tuple(upsamples), overflow


def build_pyramid_device(points0: jnp.ndarray,
                         mask0: jnp.ndarray,
                         config,
                         plan: ShapePlan,
                         rotations: Optional[jnp.ndarray] = None,
                         chunk: int = 512):
    """Jitted pyramid for a padded sphere batch.

    :param points0: [B, N_0, 3] centered sphere points (padded rows
        arbitrary but masked out)
    :param mask0: [B, N_0] validity
    :param rotations: optional [B, 3, 3] per-sphere grid rotations
    :return: (points, masks, neighbors, pools, upsamples, overflow) —
        per-level tuples plus the [3L-2] per-edge vector of banded-search
        window overflow counts (search_slot layout; zeros on the XLA
        fallback path)
    """
    np_, cn, pn, un = _plan_tuple(plan)
    # The voxel-extent bound must cover scale augmentation (the
    # reference's PL configs scale up to 1.8x) or out-of-extent points
    # would be silently CLIPPED into border voxels (wrong barycenters at
    # every level); n_cells only bounds sort-key ranges, so covering the
    # config's actual scale range is free.
    scale_max = max(
        1.25, float(getattr(config, "augment_scale_max", 1.0) or 1.0))
    # Same per-level radius schedule as the host builder (incl. the wider
    # deform-layer radii, datasets/common.py:487-534)
    conv_r, pool_r, up_r = layer_radii(config)
    return _build_pyramid(points0, mask0, rotations, np_, cn, pn, un,
                          float(config.first_subsampling_dl),
                          tuple(float(r) for r in conv_r),
                          tuple(float(r) for r in pool_r),
                          tuple(float(r) for r in up_r),
                          float(config.in_radius),
                          scale_max=scale_max, chunk=chunk,
                          banded=resolve_pallas_flag(
                              getattr(config, "use_pallas_search", False)),
                          band=int(getattr(config, "pallas_band", 0)),
                          bands=plan_bands_tuple(plan),
                          interpret=bool(getattr(config,
                                                 "pallas_interpret",
                                                 False)))


def batch_from_device_pyramid(points0, mask0, features, labels, config,
                              plan: ShapePlan, center_pts,
                              rotations=None,
                              cloud_lb=None, region_inds=None,
                              region_masks=None, region_point_masks=None,
                              region_lb=None, chunk: int = 512
                              ) -> PyramidBatch:
    """Assemble a PyramidBatch whose levels are computed on device."""
    points, masks, neighbors, pools, upsamples, overflow = \
        build_pyramid_device(points0, mask0, config, plan, rotations, chunk)
    lengths = tuple(jnp.sum(m.astype(jnp.int32), axis=1) for m in masks)
    return PyramidBatch(
        points=points, masks=masks, neighbors=neighbors, pools=pools,
        upsamples=upsamples, features=features, labels=labels,
        lengths=lengths, center_pts=center_pts, cloud_lb=cloud_lb,
        region_inds=region_inds, region_masks=region_masks,
        region_point_masks=region_point_masks, region_lb=region_lb,
        search_overflow=overflow)


# ----------------------------------------------------------------------
# Band calibration: measured per-edge half-windows for the banded kernels
# ----------------------------------------------------------------------

from weasal_tpu.ops.pallas.common import (  # single-sourced window scheme
    DEFAULT_TILE as _TILE, QUANTUM as _QUANTUM)


def _tile_need_conv(idx: "np.ndarray", ns: int,
                    tile: int = _TILE, q: int = _QUANTUM) -> int:
    """Rows the banded-KPConv window must cover for these neighbor lists.

    Mirrors kpconv_banded._prep: per query tile the window starts at the
    tile's min valid neighbor index aligned down to `q`; every valid
    neighbor must land within the window. Returns max over tiles of
    (max_nb - aligned_down(min_nb) + 1); 0 if nothing valid.
    """
    import numpy as np
    idx = np.asarray(idx)
    b, nq, k = idx.shape
    pad = (-nq) % tile
    if pad:
        idx = np.pad(idx, ((0, 0), (0, pad), (0, 0)), constant_values=ns)
    t = idx.reshape(b, -1, tile * k)
    valid = t < ns
    has = valid.any(axis=2)
    lo = np.where(valid, t, 2 * ns).min(axis=2)
    hi = np.where(valid, t, -1).max(axis=2)
    need = hi - (lo // q) * q + 1
    return int(need[has].max()) if has.any() else 0


def _tile_need_search(kq: "np.ndarray", ks: "np.ndarray",
                      qm: "np.ndarray", sm: "np.ndarray",
                      radius: float, margin: float,
                      tile: int = _TILE, q: int = _QUANTUM) -> int:
    """Rows the banded radius-search window must cover for these keys.

    Mirrors radius_search_banded: per query tile, supports with sort key in
    [min_key - r - margin, max_key + r + margin] must fit in a window that
    starts at count(ks < lo) aligned down to `q`. Returns max over tiles of
    (count(ks <= hi) - aligned_down(count(ks < lo))).
    """
    import numpy as np
    kq = np.where(np.asarray(qm), np.asarray(kq), np.inf)
    ks = np.where(np.asarray(sm), np.asarray(ks), np.inf)
    b, nq = kq.shape
    pad = (-nq) % tile
    if pad:
        kq = np.pad(kq, ((0, 0), (0, pad)), constant_values=np.inf)
    kq_t = kq.reshape(b, -1, tile)
    lo = np.min(kq_t, axis=2) - radius - margin
    hi = np.max(np.where(np.isinf(kq_t), -np.inf, kq_t), axis=2) \
        + radius + margin
    below = np.sum(ks[:, None, :] < lo[:, :, None], axis=2)
    until = np.sum(ks[:, None, :] <= hi[:, :, None], axis=2)
    need = until - (below // q) * q
    need = need[hi >= lo]
    return int(need.max()) if need.size else 0


def _band_from_need(need: int, q: int = _QUANTUM) -> int:
    """Half-window W for a measured need: two spare blocks of headroom
    beyond the observed worst tile (the kernels cover W + q rows), floor
    256. One block was measurably not enough — with ~40 calibration
    spheres vs ~180k training spheres, the runtime tail exceeded
    need+2q on ~0.002% of slots at Vaihingen geometry; +2 blocks zeroes
    it while staying well under the analytic auto_band windows. Runtime
    oob/overflow counters remain the guard for tails beyond calibration."""
    w = ((need + 2 * q) + q - 1) // q * q
    return max(256, w)


def measure_bands(level0_batches, config, plan: ShapePlan,
                  headroom_fn=_band_from_need):
    """Measure per-edge band half-windows from calibration batches.

    :param level0_batches: iterable of (points0 [B,N0,3], mask0 [B,N0],
        rotations [B,3,3] or None) in the fused path's level-0 order
        (assemble_level0 output).
    :return: {"search": {"conv": [W_l], "pool": [W_l], "up": [W_l]},
        "kpconv": {"conv": [W_l], "pool": [W_l]}} — separate window sets
        because their coverage rules differ: the radius search must span
        the query tile's sort-KEY range (wide — all candidates in
        [key ± r+margin]), while the KPConv only spans the found
        neighbor INDEX spread (narrow). Kernel cost is linear in the
        window, and the convs dominate step time, so the split matters.

    Ground truth comes from the non-banded XLA pyramid (exact search),
    so a measured band can only be under-sized if runtime spheres spread
    wider than calibration spheres — which the runtime overflow/oob
    telemetry surfaces (trainer logs kernel_drops per epoch).
    """
    import numpy as np
    conv_r, pool_r, up_r = layer_radii(config)
    np_l = list(plan.num_points)
    L = len(np_l)
    dl0 = float(config.first_subsampling_dl)
    in_r = float(config.in_radius)
    # Calibration and consumption must share one coverage rule (the stated
    # goal of ops/pallas/common.py): use the same scale_max the runtime
    # banded search uses (build_pyramid_device:192), both for the
    # ground-truth pyramid geometry and the level-0 key margin — PL's 1.8x
    # anisotropic scale augmentation otherwise measures against a narrower
    # key window than the runtime searches (ADVICE r2).
    scale_max = max(
        1.25, float(getattr(config, "augment_scale_max", 1.0) or 1.0))
    s_needs = {"conv": [0] * L, "pool": [0] * (L - 1), "up": [0] * (L - 1)}
    k_needs = {"conv": [0] * L, "pool": [0] * (L - 1)}

    for pts0, m0, rot in level0_batches:
        pts, msks, neighbors, pools, ups, _ = _build_pyramid(
            jnp.asarray(pts0), jnp.asarray(m0),
            jnp.asarray(rot) if rot is not None else None,
            tuple(np_l), tuple(plan.conv_neighbors),
            tuple(plan.pool_neighbors), plan.up_neighbors,
            dl0, tuple(float(r) for r in conv_r),
            tuple(float(r) for r in pool_r),
            tuple(float(r) for r in up_r), in_r,
            scale_max=scale_max,
            banded=False)
        pts = [np.asarray(p) for p in pts]
        msks = [np.asarray(m) for m in msks]
        if rot is not None:
            rot = np.asarray(rot)
            keys = [np.einsum("bnd,bd->bn", p, rot[:, :, 0]) for p in pts]
        else:
            keys = [p[:, :, 0] for p in pts]

        def margin_of(ls):
            # identical to the runtime formula in _build_pyramid:133-138
            m = dl0 * (2 ** ls)
            if ls == 0:
                m = max(m, 2.0 * max(scale_max, 1.1) * in_r / 256.0)
            return m

        edges = ([("conv", l, l, l, conv_r[l], neighbors[l])
                  for l in range(L)]
                 + [("pool", l, l + 1, l, pool_r[l], pools[l])
                    for l in range(L - 1)]
                 + [("up", l, l, l + 1, up_r[l], ups[l])
                    for l in range(L - 1)])
        for edge, l, lq, ls, r, idx in edges:
            s = _tile_need_search(keys[lq], keys[ls], msks[lq],
                                  msks[ls], float(r), margin_of(ls))
            s_needs[edge][l] = max(s_needs[edge][l], s)
            if edge != "up":      # upsample is a gather, never a KPConv
                k = _tile_need_conv(np.asarray(idx), np_l[ls])
                k_needs[edge][l] = max(k_needs[edge][l], k)

    return {"search": {k: [headroom_fn(n) for n in v]
                       for k, v in s_needs.items()},
            "kpconv": {k: [headroom_fn(n) for n in v]
                       for k, v in k_needs.items()}}
