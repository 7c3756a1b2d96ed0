"""Banded Pallas KPConv (round 2): numerics, oob semantics, dispatch,
and the level-0 spatial sort feeding it.

Interpret mode on CPU; hardware numerics are exercised by bench.py and
scripts/bench_kpconv.py on the real chip.
"""

import numpy as np
import jax
import jax.numpy as jnp

from weasal_tpu.ops.kpconv import KPConvParams, kpconv, pallas_eligible
from weasal_tpu.ops.pallas.kpconv_banded import (kpconv_banded,
                                                 kpconv_banded_pallas)


def _problem(rng, b=2, n_q=100, n_s=300, k=9, kp=15, cin=8, cout=16,
             local=False):
    s = rng.uniform(-2, 2, size=(b, n_s, 3)).astype(np.float32)
    s = np.sort(s, axis=1)          # spatially coherent index order
    q = s[:, :n_q] + rng.normal(0, 0.05, (b, n_q, 3)).astype(np.float32)
    if local:
        base = (np.arange(n_q) * n_s // n_q)[None, :, None]
        nb = np.clip(base + rng.integers(-20, 20, (b, n_q, k)),
                     0, n_s - 1).astype(np.int32)
    else:
        nb = rng.integers(0, n_s + 1, size=(b, n_q, k)).astype(np.int32)
    x = rng.normal(size=(b, n_s, cin)).astype(np.float32)
    kpts = rng.uniform(-0.3, 0.3, size=(kp, 3)).astype(np.float32)
    w = (rng.normal(size=(kp, cin, cout)) / np.sqrt(cin)).astype(np.float32)
    return [jnp.asarray(a) for a in (q, s, nb, x, kpts, w)]


class TestBandedKPConv:

    def test_forward_and_grads_match_xla(self):
        rng = np.random.default_rng(0)
        q, s, nb, x, kpts, w = _problem(rng)
        params = KPConvParams(kp_extent=0.7)
        expected, _ = kpconv(q, s, nb, x, kpts, w, params)
        got, oob = kpconv_banded(q, s, nb, x, kpts, w, 0.7,
                                 interpret=True)
        assert float(jnp.sum(oob)) == 0.0   # band covers (ns <= 2W)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                                   rtol=2e-4, atol=2e-4)

        def loss_ref(x, w):
            return jnp.sum(kpconv(q, s, nb, x, kpts, w, params)[0] ** 2)

        def loss_band(x, w):
            return jnp.sum(kpconv_banded(q, s, nb, x, kpts, w, 0.7,
                                         interpret=True)[0] ** 2)

        gr = jax.grad(loss_ref, argnums=(0, 1))(x, w)
        gb = jax.grad(loss_band, argnums=(0, 1))(x, w)
        for a, b_ in zip(gr, gb):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=1e-3, atol=1e-3)

    def test_out_of_band_neighbors_count_and_act_as_shadow(self):
        """With an undersized band, far neighbors are dropped exactly like
        shadows, and the drop count is reported."""
        rng = np.random.default_rng(1)
        q, s, nb, x, kpts, w = _problem(rng, b=1, n_q=128, n_s=1024,
                                        local=True)
        # Inject far-away neighbors that cannot fit any 256-row window
        nb_np = np.asarray(nb).copy()
        nb_np[0, :64, 0] = 1000
        nb_np[0, 64:, 0] = 0
        nb = jnp.asarray(nb_np)

        out, oob = kpconv_banded_pallas(q, s, nb, x, kpts, w, 0.7,
                                        "linear", 128, 128, True, True)
        assert float(oob[0]) > 0

        # Reference: replace out-of-band entries with the shadow index
        ns = x.shape[1]
        starts = np.empty(128 // 128, np.int64)
        # band start per 128-query tile (replicates _prep's rule, W=128)
        masked = np.where(nb_np < ns, nb_np, 10 ** 6)
        params = KPConvParams(kp_extent=0.7)
        nb_ref = nb_np.copy()
        tmin = masked.reshape(1, 1, -1).min(axis=2)  # single tile
        start = np.clip(tmin // 128, 0, 1024 // 128 - 2)[0, 0]
        rel = nb_ref - start * 128
        nb_ref[(rel < 0) | (rel >= 256)] = ns
        expected, _ = kpconv(q, s, jnp.asarray(nb_ref), x, kpts, w, params)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                                   rtol=2e-4, atol=2e-4)

    def test_single_half_skip_path(self):
        """Tiles whose neighbors fit the first W block take the skipped
        second-half branch; result must equal the XLA conv exactly."""
        rng = np.random.default_rng(11)
        q, s, nb, x, kpts, w = _problem(rng, b=1, n_q=128, n_s=512, k=6)
        nb = jnp.asarray(np.asarray(nb) % 100)   # all in rows [0, 100)
        params = KPConvParams(kp_extent=0.7)
        expected, _ = kpconv(q, s, nb, x, kpts, w, params)
        got, oob = kpconv_banded_pallas(q, s, nb, x, kpts, w, 0.7,
                                        "linear", 128, 128, True, True)
        assert float(oob[0]) == 0.0
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                                   rtol=2e-4, atol=2e-4)

        def loss(x, w):
            return jnp.sum(kpconv_banded_pallas(
                q, s, nb, x, kpts, w, 0.7, "linear", 128, 128, True, True)[0]
                ** 2)

        def loss_ref(x, w):
            return jnp.sum(kpconv(q, s, nb, x, kpts, w, params)[0] ** 2)

        gr = jax.grad(loss_ref, argnums=(0, 1))(x, w)
        gb = jax.grad(loss, argnums=(0, 1))(x, w)
        for a, b_ in zip(gr, gb):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=1e-3, atol=1e-3)

    def test_wide_channels_grouped_dw(self):
        """Cin=512/Cout=256 forces the dW kernel onto >1 kernel-point
        group; numerics and both grads must still match the XLA path."""
        rng = np.random.default_rng(7)
        q, s, nb, x, kpts, w = _problem(rng, b=1, n_q=24, n_s=48, k=5,
                                        cin=512, cout=256)
        params = KPConvParams(kp_extent=0.7)

        def loss_ref(x, w):
            return jnp.sum(kpconv(q, s, nb, x, kpts, w, params)[0] ** 2)

        def loss_band(x, w):
            return jnp.sum(kpconv_banded(q, s, nb, x, kpts, w, 0.7,
                                         interpret=True)[0] ** 2)

        np.testing.assert_allclose(
            float(loss_band(x, w)), float(loss_ref(x, w)), rtol=1e-4)
        gr = jax.grad(loss_ref, argnums=(0, 1))(x, w)
        gb = jax.grad(loss_band, argnums=(0, 1))(x, w)
        for a, b_ in zip(gr, gb):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=2e-3, atol=2e-3)

    def test_dispatch_gating(self):
        pal = KPConvParams(kp_extent=0.5, use_pallas=True)
        assert pallas_eligible(pal, 64, 128)
        assert pallas_eligible(pal, 256, 256)           # MPRM heads too
        assert pallas_eligible(pal, 512, 256)
        assert not pallas_eligible(pal, 1024, 64)       # beyond VMEM plan
        assert not pallas_eligible(pal._replace(deformable=True), 64, 64)
        assert not pallas_eligible(
            pal._replace(aggregation="closest"), 64, 64)
        off = KPConvParams(kp_extent=0.5, use_pallas=False)
        assert not pallas_eligible(off, 64, 64)

    def test_pblk_skip_matches_unskipped(self):
        """The per-kernel-point block-range skip is semantics-neutral:
        outputs and grads with pblk_skip on == off (which is itself
        pinned to the XLA oracle by the tests above), for every
        influence mode. Local neighbor structure gives the ranges real
        sub-spans to skip (rather than full windows)."""
        rng = np.random.default_rng(21)
        q, s, nb, x, kpts, w = _problem(rng, b=2, n_q=128, n_s=512, k=7,
                                        local=True)
        for influence in ("linear", "constant", "gaussian"):
            def loss(x, w, skip):
                out, _ = kpconv_banded(q, s, nb, x, kpts, w, 0.7,
                                       influence=influence,
                                       interpret=True, pblk_skip=skip)
                return jnp.sum(out ** 2), out

            (l_on, o_on), (l_off, o_off) = (loss(x, w, True),
                                            loss(x, w, False))
            np.testing.assert_allclose(np.asarray(o_on),
                                       np.asarray(o_off),
                                       rtol=1e-6, atol=1e-6,
                                       err_msg=influence)
            g_on = jax.grad(lambda x, w: loss(x, w, True)[0],
                            argnums=(0, 1))(x, w)
            g_off = jax.grad(lambda x, w: loss(x, w, False)[0],
                             argnums=(0, 1))(x, w)
            for a, b_ in zip(g_on, g_off):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                           rtol=1e-6, atol=1e-6,
                                           err_msg=influence)

    def test_kpconv_dispatch_returns_oob(self):
        rng = np.random.default_rng(2)
        q, s, nb, x, kpts, w = _problem(rng, b=1, n_q=64, n_s=128)
        params = KPConvParams(kp_extent=0.7, use_pallas=True,
                              pallas_interpret=True)
        out, min_sq, oob = kpconv(q, s, nb, x, kpts, w, params,
                                  return_oob=True)
        assert min_sq is None
        assert oob.shape == (1,)
        ref, _ = kpconv(q, s, nb, x, kpts, w,
                        KPConvParams(kp_extent=0.7))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)


class TestLevel0SpatialSort:

    def test_sorted_payload_consistency(self):
        from weasal_tpu.data.batching import ShapePlan
        from weasal_tpu.data.level0 import assemble_level0

        rng = np.random.default_rng(3)
        n = 200
        pts = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
        feats = np.hstack([np.ones((n, 1), np.float32),
                           pts[:, 2:]]).astype(np.float32)
        labels = rng.integers(0, 5, n).astype(np.int32)
        input_inds = rng.permutation(10 ** 4)[:n]
        region_inds = np.sort(rng.choice(n, 40, replace=False))
        region_lb = np.zeros(5, np.float32)
        region_lb[1] = 1.0
        payload = dict(points=pts.copy(), features=feats.copy(),
                       labels=labels.copy(), input_inds=input_inds.copy(),
                       center=np.zeros(3, np.float32),
                       cloud_lb=region_lb.copy(),
                       regions=[(region_inds.copy(), region_lb)],
                       cloud_ind=0)
        plan = ShapePlan(num_points=[256, 128], conv_neighbors=[8, 8],
                         pool_neighbors=[8], max_regions=4,
                         max_region_points=64)
        arrays = assemble_level0([payload], plan, 5,
                                 rng=np.random.default_rng(0))

        # Every original (point, feature, label, input_ind) row survives
        # as an intact tuple, just reordered.
        got = arrays["points0"][0][arrays["mask0"][0]]
        assert got.shape == (n, 3)
        order = {tuple(p): i for i, p in enumerate(pts.round(5).tolist())}
        perm = np.array([order[tuple(p)] for p in got.round(5).tolist()])
        assert sorted(perm.tolist()) == list(range(n))
        np.testing.assert_array_equal(arrays["labels"][0][:n],
                                      labels[perm])
        np.testing.assert_array_equal(payload["input_inds"][:n],
                                      input_inds[perm])
        # Region indices point at the same physical points
        ri = arrays["region_inds"][0, 0]
        valid = arrays["region_point_masks"][0, 0]
        np.testing.assert_array_equal(
            np.sort(perm[ri[valid]]), region_inds)
        # Emitted order is spatially sorted in the rotated frame
        rot = arrays["rotations"][0]
        xr = (got @ rot)[:, 0]
        # x coordinate is non-decreasing up to the voxel granularity
        assert np.all(np.diff(xr) > -(xr.max() - xr.min()) / 128)
