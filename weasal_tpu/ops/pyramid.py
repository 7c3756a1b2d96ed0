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


@partial(jax.jit, static_argnames=("num_points", "conv_neighbors",
                                   "pool_neighbors", "up_neighbors",
                                   "dl0", "conv_radii", "pool_radii",
                                   "up_radii", "in_radius", "chunk",
                                   "banded", "band", "interpret"))
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
                   chunk: int = 512,
                   banded: bool = False,
                   band: int = 512,
                   interpret: bool = False):
    L = len(num_points)
    points = [points0]
    masks = [mask0]

    # Subsampled levels (optionally in a rotated frame per sphere)
    for l in range(L - 1):
        dl = dl0 * (2 ** (l + 1))
        n_cells = grid_extent_cells(in_radius, dl)
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

    overflow = jnp.zeros((), jnp.float32)
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

        def search(lq, ls, r, k):
            nonlocal overflow
            # Sort slack: only the SUPPORT side's key disorder matters
            # (tile lo/hi come from actual query keys); that disorder is
            # bounded by the support level's voxel size. Level 0 is sorted
            # by assemble_level0 at extent/256 (~2.2*in_radius/256), which
            # can exceed dl0 for deep configs — take the larger bound.
            margin = dl0 * (2 ** ls)
            if ls == 0:
                margin = max(margin, 2.5 * in_radius / 256.0)
            w = band if band else auto_band(
                float(r), float(margin), num_points[lq], num_points[ls],
                in_radius)
            idx, ovf = radius_search_banded(
                points[lq], points[ls], masks[lq], masks[ls],
                skeys[lq], skeys[ls], radius=float(r), max_count=int(k),
                band=w, margin=float(margin), interpret=interpret)
            overflow = overflow + jnp.sum(ovf)
            return idx
    else:
        def search(lq, ls, r, k):
            return jax.vmap(
                lambda q, s, qm, sm: radius_search_fixed(
                    q, s, qm, sm, r, k, chunk))(
                points[lq], points[ls], masks[lq], masks[ls])

    neighbors, pools, upsamples = [], [], []
    for l in range(L):
        neighbors.append(search(l, l, conv_radii[l], conv_neighbors[l]))
        if l < L - 1:
            pools.append(search(l + 1, l, pool_radii[l],
                                pool_neighbors[l]))
            upsamples.append(search(l, l + 1, up_radii[l], up_neighbors))
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
    :return: (points, masks, neighbors, pools, upsamples) tuples per level
    """
    np_, cn, pn, un = _plan_tuple(plan)
    # Same per-level radius schedule as the host builder (incl. the wider
    # deform-layer radii, datasets/common.py:487-534)
    conv_r, pool_r, up_r = layer_radii(config)
    return _build_pyramid(points0, mask0, rotations, np_, cn, pn, un,
                          float(config.first_subsampling_dl),
                          tuple(float(r) for r in conv_r),
                          tuple(float(r) for r in pool_r),
                          tuple(float(r) for r in up_r),
                          float(config.in_radius), chunk,
                          banded=resolve_pallas_flag(
                              getattr(config, "use_pallas_search", False)),
                          band=int(getattr(config, "pallas_band", 0)),
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
