"""Device pyramid vs host pyramid equivalence + fused forward test."""

import numpy as np
import jax
import jax.numpy as jnp

from weasal_tpu.config import Config
from weasal_tpu.data.batching import (
    ShapePlan, build_sphere_pyramid)
from weasal_tpu.ops.pyramid import build_pyramid_device
from weasal_tpu.ops.subsample import SHADOW_COORD


class TinyConfig(Config):
    num_classes = 5
    in_features_dim = 4
    first_features_dim = 16
    in_radius = 5.0
    first_subsampling_dl = 0.5
    conv_radius = 2.5
    architecture = ["simple", "resnetb", "resnetb_strided", "resnetb",
                    "resnetb_strided", "resnetb",
                    "nearest_upsample", "nearest_upsample"]


def surface_sphere(rng, r=5.0, n=1500):
    xy = rng.uniform(-r, r, size=(n, 2))
    keep = np.linalg.norm(xy, axis=1) < r
    xy = xy[keep]
    z = 0.3 * np.sin(xy[:, 0]) + rng.normal(0, 0.1, xy.shape[0])
    return np.column_stack([xy, z]).astype(np.float32)


def test_device_pyramid_matches_host():
    cfg = TinyConfig()
    rng = np.random.default_rng(0)
    pts = surface_sphere(rng)

    host = build_sphere_pyramid(pts, cfg, rng=rng,
                                random_grid_orient=False)

    plan = ShapePlan(
        num_points=[max(16, ((p.shape[0] + 7) // 8) * 8 + 8)
                    for p in host["points"]],
        conv_neighbors=[host["neighbors"][l].shape[1] + 2 for l in range(3)],
        pool_neighbors=[host["pools"][l].shape[1] + 2 for l in range(2)])

    n0 = plan.num_points[0]
    padded = np.full((1, n0, 3), SHADOW_COORD, np.float32)
    padded[0, :pts.shape[0]] = pts
    mask = np.zeros((1, n0), bool)
    mask[0, :pts.shape[0]] = True

    points, masks, neighbors, pools, upsamples, _ovf = build_pyramid_device(
        jnp.asarray(padded), jnp.asarray(mask), cfg, plan)

    # Level point sets match (device order is voxel-sorted; compare as sets)
    for l in range(3):
        dev = np.asarray(points[l][0])[np.asarray(masks[l][0])]
        hst = host["points"][l]
        assert dev.shape[0] == hst.shape[0], f"level {l} count"
        np.testing.assert_allclose(
            np.array(sorted(map(tuple, dev))),
            np.array(sorted(map(tuple, hst))), atol=1e-4)

    # Conv neighbor *degrees* match per level-0 point (order of points at
    # deeper levels differs, so compare level 0 where order is shared)
    n_real = pts.shape[0]
    dev_nb = np.asarray(neighbors[0][0])[:n_real]
    hst_nb = host["neighbors"][0]
    dev_deg = (dev_nb < n0).sum(1)
    hst_deg = (hst_nb < n_real).sum(1)
    np.testing.assert_array_equal(dev_deg, hst_deg)
    # And the nearest neighbor (column 0) is identical
    np.testing.assert_array_equal(dev_nb[:, 0], hst_nb[:, 0])


def test_device_pyramid_degrees_under_rotation():
    """Neighbor structure is invariant to the per-sphere grid rotation of
    the *subsampling* only in distribution; degrees stay plausible."""
    cfg = TinyConfig()
    rng = np.random.default_rng(1)
    pts = surface_sphere(rng)
    n0 = 1600
    padded = np.full((2, n0, 3), SHADOW_COORD, np.float32)
    mask = np.zeros((2, n0), bool)
    for b in range(2):
        padded[b, :pts.shape[0]] = pts
        mask[b, :pts.shape[0]] = True

    theta = 0.6
    c, s = np.cos(theta), np.sin(theta)
    R = np.stack([np.eye(3, dtype=np.float32),
                  np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]],
                           np.float32)])

    plan = ShapePlan(num_points=[n0, 512, 256],
                     conv_neighbors=[16, 20, 24],
                     pool_neighbors=[16, 20])
    points, masks, neighbors, pools, upsamples, _ovf = build_pyramid_device(
        jnp.asarray(padded), jnp.asarray(mask), cfg, plan,
        rotations=jnp.asarray(R))
    # Rotated-grid subsample must still produce points near the originals
    for b in range(2):
        sub = np.asarray(points[1][b])[np.asarray(masks[1][b])]
        from scipy.spatial import cKDTree
        d, _ = cKDTree(pts).query(sub)
        assert d.max() < 1.0 * np.sqrt(3)
    # Counts differ slightly between rotations but stay in a sane band
    c0 = int(np.asarray(masks[1][0]).sum())
    c1 = int(np.asarray(masks[1][1]).sum())
    assert abs(c0 - c1) < 0.2 * max(c0, c1)
