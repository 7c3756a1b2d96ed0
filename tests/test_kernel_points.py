"""Tests for kernel-point disposition generation and loading."""

import numpy as np

from weasal_tpu.kernels.kernel_points import (
    create_3d_rotations, load_kernels, optimize_kernel_points, spherical_lloyd)


def test_create_3d_rotations_is_rotation():
    rng = np.random.default_rng(0)
    axis = rng.normal(size=(5, 3))
    axis /= np.linalg.norm(axis, axis=1, keepdims=True)
    angle = rng.uniform(0, 2 * np.pi, size=5)
    R = create_3d_rotations(axis, angle)
    for i in range(5):
        np.testing.assert_allclose(R[i] @ R[i].T, np.eye(3), atol=1e-10)
        assert abs(np.linalg.det(R[i]) - 1.0) < 1e-10
        # Axis is invariant under its rotation
        np.testing.assert_allclose(axis[i] @ R[i], axis[i], atol=1e-10)


def test_load_kernels_shipped_disposition():
    rng = np.random.default_rng(42)
    kp = load_kernels(1.2, 15, dimension=3, fixed="center", rng=rng)
    assert kp.shape == (15, 3)
    assert kp.dtype == np.float32
    # Center point stays near origin (only N(0, 0.01) jitter, scaled)
    assert np.linalg.norm(kp[0]) < 0.05 * 1.2
    # All points inside ~1.1 radius
    assert np.all(np.linalg.norm(kp, axis=1) < 1.1 * 1.2)
    # Rotation is vertical: z of jittered points preserved up to jitter scale
    kp2 = load_kernels(1.2, 15, dimension=3, fixed="center",
                       rng=np.random.default_rng(7))
    assert np.max(np.abs(np.sort(kp[:, 2]) - np.sort(kp2[:, 2]))) < 0.1


def test_optimize_kernel_points_well_spread():
    rng = np.random.default_rng(3)
    kernels, grads = optimize_kernel_points(
        1.0, 7, num_kernels=4, dimension=3, fixed="center", rng=rng)
    assert kernels.shape == (4, 7, 3)
    best = kernels[np.argmin(grads)]
    # Center fixed at origin
    assert np.linalg.norm(best[0]) < 1e-9
    # Non-center points roughly at ratio*radius and mutually separated
    radii = np.linalg.norm(best[1:], axis=1)
    assert np.all(radii > 0.3) and np.all(radii < 1.1)
    d = np.linalg.norm(best[1:, None] - best[None, 1:], axis=-1)
    d += np.eye(6) * 10
    assert d.min() > 0.2


def test_spherical_lloyd_coverage():
    rng = np.random.default_rng(5)
    sites = spherical_lloyd(1.0, 40, fixed="center", max_iter=60, rng=rng)
    assert sites.shape == (40, 3)
    assert np.linalg.norm(sites[0]) < 1e-9
    # Sites spread through the ball: mean radius of a uniform ball ~ 0.75R
    radii = np.linalg.norm(sites[1:], axis=1)
    assert 0.4 < radii.mean() < 0.95


def test_load_kernels_generates_and_caches(tmp_path):
    rng = np.random.default_rng(0)
    kp = load_kernels(1.0, 5, dimension=3, fixed="center",
                      rng=rng, dispositions_dir=str(tmp_path))
    assert (tmp_path / "k_005_center_3D.ply").exists()
    assert kp.shape == (5, 3)
    # Second load reads the cache (same base disposition, different pose)
    kp2 = load_kernels(1.0, 5, dimension=3, fixed="center",
                       rng=np.random.default_rng(1),
                       dispositions_dir=str(tmp_path))
    np.testing.assert_allclose(np.sort(np.abs(kp[:, 2])),
                               np.sort(np.abs(kp2[:, 2])), atol=0.05)
