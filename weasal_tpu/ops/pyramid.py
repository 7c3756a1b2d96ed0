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


def _plan_tuple(plan: ShapePlan):
    return (tuple(plan.num_points), tuple(plan.conv_neighbors),
            tuple(plan.pool_neighbors), plan.up_neighbors)


@partial(jax.jit, static_argnames=("num_points", "conv_neighbors",
                                   "pool_neighbors", "up_neighbors",
                                   "dl0", "conv_radii", "pool_radii",
                                   "up_radii", "in_radius", "chunk"))
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
                   chunk: int = 512):
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

    neighbors, pools, upsamples = [], [], []
    for l in range(L):
        r = conv_radii[l]
        neighbors.append(jax.vmap(
            lambda q, s, qm, sm: radius_search_fixed(
                q, s, qm, sm, r, conv_neighbors[l], chunk))(
            points[l], points[l], masks[l], masks[l]))
        if l < L - 1:
            pr = pool_radii[l]
            ur = up_radii[l]
            pools.append(jax.vmap(
                lambda q, s, qm, sm: radius_search_fixed(
                    q, s, qm, sm, pr, pool_neighbors[l], chunk))(
                points[l + 1], points[l], masks[l + 1], masks[l]))
            upsamples.append(jax.vmap(
                lambda q, s, qm, sm: radius_search_fixed(
                    q, s, qm, sm, ur, up_neighbors, chunk))(
                points[l], points[l + 1], masks[l], masks[l + 1]))
    return tuple(points), tuple(masks), tuple(neighbors), tuple(pools), \
        tuple(upsamples)


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
                          float(config.in_radius), chunk)


def batch_from_device_pyramid(points0, mask0, features, labels, config,
                              plan: ShapePlan, center_pts,
                              rotations=None,
                              cloud_lb=None, region_inds=None,
                              region_masks=None, region_point_masks=None,
                              region_lb=None, chunk: int = 512
                              ) -> PyramidBatch:
    """Assemble a PyramidBatch whose levels are computed on device."""
    points, masks, neighbors, pools, upsamples = build_pyramid_device(
        points0, mask0, config, plan, rotations, chunk)
    lengths = tuple(jnp.sum(m.astype(jnp.int32), axis=1) for m in masks)
    return PyramidBatch(
        points=points, masks=masks, neighbors=neighbors, pools=pools,
        upsamples=upsamples, features=features, labels=labels,
        lengths=lengths, center_pts=center_pts, cloud_lb=cloud_lb,
        region_inds=region_inds, region_masks=region_masks,
        region_point_masks=region_point_masks, region_lb=region_lb)
