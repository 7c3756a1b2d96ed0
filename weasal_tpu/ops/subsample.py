"""Grid (voxel) subsampling.

Replaces the reference's C++ grid-subsampling core
(cpp_wrappers/cpp_subsampling/grid_subsampling/grid_subsampling.cpp:5-211):
each point hashes into a `dl`-sized voxel; the subsampled cloud holds one
point per occupied voxel at the **barycenter** of its members, features are
averaged, and integer labels take the per-voxel **majority vote**.

Two implementations:

- `grid_subsample` / `batch_grid_subsample`: host-side numpy, exact
  (variable-size output, canonical voxel-sorted order — the reference's
  unordered_map order is unspecified, consumers never depend on it).
- `grid_subsample_fixed`: fixed-shape jittable JAX version used inside the
  device pyramid. Output is padded to a static `max_out` voxels; the voxel
  grid extent is static because input spheres are bounded (extent derived
  from the per-call `grid_extent` bound), so voxel linear ids need no
  data-dependent shapes.

Shadow semantics: padded output rows carry the coordinate `SHADOW_COORD`
(1e6, matching the reference's fake far-away point, models/blocks.py:278) and
mask False.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

SHADOW_COORD = 1e6


# ----------------------------------------------------------------------------
# Host (numpy) versions
# ----------------------------------------------------------------------------

def _voxel_ids(points: np.ndarray, dl: float) -> Tuple[np.ndarray, np.ndarray]:
    """Linear voxel id per point, anchored at the cloud's min corner."""
    origin = points.min(axis=0)
    vox = np.floor((points - origin) / dl).astype(np.int64)
    dims = vox.max(axis=0) + 1
    lin = (vox[:, 0] * dims[1] + vox[:, 1]) * dims[2] + vox[:, 2]
    return lin, dims


def grid_subsample(points: np.ndarray,
                   features: Optional[np.ndarray] = None,
                   labels: Optional[np.ndarray] = None,
                   dl: float = 0.1):
    """Subsample one cloud. Returns (points[, features][, labels]).

    Output rows are ordered by linear voxel id (canonical deterministic
    order). Points/features are voxel barycenters; labels are majority votes
    (ties -> smallest label value).
    """
    points = np.asarray(points, dtype=np.float32)

    from weasal_tpu.ops import native
    if native.available():
        return native.grid_subsample_native(points, features, labels, dl)
    return grid_subsample_numpy(points, features, labels, dl)


def grid_subsample_numpy(points, features=None, labels=None, dl=0.1):
    """Pure-numpy reference implementation (oracle for the native kernel)."""
    points = np.asarray(points, dtype=np.float32)
    lin, _ = _voxel_ids(points, dl)
    uniq, inv, counts = np.unique(lin, return_inverse=True,
                                  return_counts=True)
    n_out = uniq.shape[0]

    sub_points = np.zeros((n_out, 3), dtype=np.float64)
    for d in range(3):
        sub_points[:, d] = np.bincount(inv, weights=points[:, d],
                                       minlength=n_out)
    sub_points /= counts[:, None]
    out = [sub_points.astype(np.float32)]

    if features is not None:
        features = np.asarray(features, dtype=np.float32)
        if features.ndim == 1:
            features = features[:, None]
        sub_feat = np.zeros((n_out, features.shape[1]), dtype=np.float64)
        for d in range(features.shape[1]):
            sub_feat[:, d] = np.bincount(inv, weights=features[:, d],
                                         minlength=n_out)
        sub_feat /= counts[:, None]
        out.append(sub_feat.astype(np.float32))

    if labels is not None:
        labels = np.squeeze(np.asarray(labels)).astype(np.int64)
        n_lbl = int(labels.max()) + 1 if labels.size else 1
        # Per-voxel per-label counts -> majority vote
        votes = np.zeros((n_out, n_lbl), dtype=np.int64)
        np.add.at(votes, (inv, labels), 1)
        sub_labels = np.argmax(votes, axis=1).astype(np.int32)
        out.append(sub_labels)

    return out[0] if len(out) == 1 else tuple(out)


def batch_grid_subsample(points: np.ndarray,
                         lengths: np.ndarray,
                         dl: float,
                         max_p: int = 0,
                         random_rotations: Optional[np.ndarray] = None):
    """Subsample a stacked cloud element-by-element (host side).

    Mirrors the reference's batch path (datasets/common.py:77-183): an
    optional per-element rotation is applied before voxelization and undone
    afterwards (de-aliases the fixed grid orientation), and each element may
    be truncated to its first `max_p` voxels.
    Returns (stacked_sub_points, sub_lengths).
    """
    points = np.asarray(points, dtype=np.float32)
    out_points = []
    out_lengths = []
    i0 = 0
    for bi, length in enumerate(lengths):
        elem = points[i0:i0 + length]
        if random_rotations is not None:
            R = random_rotations[bi]
            elem = elem @ R.T
        sub = grid_subsample(elem, dl=dl)
        if max_p and sub.shape[0] > max_p:
            sub = sub[:max_p]
        if random_rotations is not None:
            sub = sub @ R
        out_points.append(sub.astype(np.float32))
        out_lengths.append(sub.shape[0])
        i0 += length
    return (np.concatenate(out_points, axis=0),
            np.array(out_lengths, dtype=np.int32))


# ----------------------------------------------------------------------------
# Device (JAX) fixed-shape version
# ----------------------------------------------------------------------------

def grid_extent_cells(in_radius: float, dl: float,
                      scale_max: float = 1.25) -> int:
    """Static per-axis voxel count bound for points inside a sphere batch.

    Sphere points live in [-scale_max*r, scale_max*r] after centering and
    scale augmentation (the reference's PL configs scale up to 1.8x,
    train_Vaihingen3D_PseudoLabel.py:168); +2 covers the floor offset of
    the min-corner anchor. n_cells only bounds the linear sort-key range
    (no per-cell allocation exists), so a generous bound is free.
    """
    return int(math.ceil(2.0 * max(scale_max, 1.0) * in_radius / dl)) + 2


@partial(jax.jit, static_argnames=("max_out", "n_cells"))
def grid_subsample_fixed(points: jnp.ndarray,
                         mask: jnp.ndarray,
                         dl: float,
                         max_out: int,
                         n_cells: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fixed-shape voxel-barycenter subsample of one padded sphere.

    :param points: [N, 3] float32, padded rows arbitrary
    :param mask: [N] bool, True for real points
    :param dl: voxel size (static)
    :param max_out: static output size (voxels beyond it are dropped)
    :param n_cells: static per-axis voxel count bound (grid_extent_cells)
    :return: (sub_points [max_out, 3] with SHADOW_COORD padding,
              sub_mask [max_out] bool)

    Voxels are emitted in linear-id order (canonical sort); barycenters are
    exact segment means. vmap over a leading batch axis for batched use.
    """
    big = n_cells ** 3                              # static sentinel id
    inf = jnp.float32(jnp.inf)

    # Min corner over valid points only
    masked = jnp.where(mask[:, None], points, inf)
    origin = jnp.min(masked, axis=0)

    vox = jnp.floor((points - origin) / dl).astype(jnp.int32)
    vox = jnp.clip(vox, 0, n_cells - 1)
    lin = (vox[:, 0] * n_cells + vox[:, 1]) * n_cells + vox[:, 2]
    lin = jnp.where(mask, lin, big)                 # padded points last

    order = jnp.argsort(lin)                        # stable
    sorted_lin = lin[order]
    sorted_pts = points[order]
    valid = sorted_lin < big

    is_new = jnp.concatenate([
        jnp.ones((1,), dtype=bool),
        sorted_lin[1:] != sorted_lin[:-1]])
    is_new = is_new & valid
    seg = jnp.cumsum(is_new.astype(jnp.int32)) - 1  # voxel rank per point
    # Invalid points and overflow voxels go to the drop slot `max_out`
    seg = jnp.where(valid, jnp.minimum(seg, max_out), max_out)

    sums = jnp.zeros((max_out + 1, 3), jnp.float32).at[seg].add(
        jnp.where(valid[:, None], sorted_pts, 0.0))
    counts = jnp.zeros((max_out + 1,), jnp.float32).at[seg].add(
        valid.astype(jnp.float32))

    out_mask = counts[:max_out] > 0
    centers = sums[:max_out] / jnp.maximum(counts[:max_out, None], 1.0)
    centers = jnp.where(out_mask[:, None], centers, SHADOW_COORD)
    return centers, out_mask
