"""Native C++ geometry kernels vs the numpy/scipy reference implementations."""

import numpy as np
import pytest

from weasal_tpu.ops import native
from weasal_tpu.ops.neighbors import radius_search_scipy
from weasal_tpu.ops.subsample import grid_subsample_numpy

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


class TestNativeGridSubsample:

    def test_points_only(self):
        rng = np.random.default_rng(0)
        pts = rng.uniform(-5, 5, size=(3000, 3)).astype(np.float32)
        ref = grid_subsample_numpy(pts, dl=0.8)
        got = native.grid_subsample_native(pts, dl=0.8)
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=1e-5)

    def test_features_and_labels(self):
        rng = np.random.default_rng(1)
        pts = rng.uniform(0, 6, size=(2000, 3)).astype(np.float32)
        feats = rng.normal(size=(2000, 2)).astype(np.float32)
        labels = rng.integers(0, 9, 2000).astype(np.int32)
        ref_p, ref_f, ref_l = grid_subsample_numpy(pts, feats, labels, dl=0.7)
        got_p, got_f, got_l = native.grid_subsample_native(
            pts, feats, labels, dl=0.7)
        np.testing.assert_allclose(got_p, ref_p, atol=1e-5)
        np.testing.assert_allclose(got_f, ref_f, atol=1e-4)
        np.testing.assert_array_equal(got_l, ref_l)

    def test_max_out_truncation(self):
        rng = np.random.default_rng(2)
        pts = rng.uniform(0, 10, size=(5000, 3)).astype(np.float32)
        got = native.grid_subsample_native(pts, dl=0.5, max_out=64)
        assert got.shape[0] == 64


class TestNativeRadiusSearch:

    def test_matches_scipy(self):
        rng = np.random.default_rng(3)
        q = rng.uniform(-3, 3, size=(200, 3)).astype(np.float32)
        s = rng.uniform(-3, 3, size=(500, 3)).astype(np.float32)
        ref = radius_search_scipy(q, s, 0.9, max_count=24)
        got = native.radius_search_native(q, s, 0.9, max_count=24)
        np.testing.assert_array_equal(got, ref)

    def test_queries_outside_support_bounds(self):
        rng = np.random.default_rng(4)
        s = rng.uniform(0, 1, size=(100, 3)).astype(np.float32)
        q = np.array([[5.0, 5.0, 5.0], [0.5, 0.5, 0.5],
                      [-0.4, 0.5, 0.5]], np.float32)
        ref = radius_search_scipy(q, s, 0.6, max_count=50)
        got = native.radius_search_native(q, s, 0.6, max_count=50)
        np.testing.assert_array_equal(got, ref)

    def test_large_throughput_sanity(self):
        import time
        rng = np.random.default_rng(5)
        pts = rng.uniform(-20, 20, size=(60000, 3)).astype(np.float32)
        pts[:, 2] *= 0.05                      # surface-like
        t0 = time.perf_counter()
        native.radius_search_native(pts, pts, 0.6, max_count=30)
        native_dt = time.perf_counter() - t0
        print(f"native 60k self-search: {native_dt * 1000:.0f}ms")
        assert native_dt < 5.0
