"""Banded Pallas radius search (round 2): numerics vs brute force,
overflow accounting, and the banded device pyramid end-to-end.

Interpret mode on CPU; hardware numerics are exercised by bench.py on the
real chip. Reference contract: nanoflann's batch_query (reference
cpp_wrappers/cpp_neighbors/neighbors.cpp:211-332) — distance-sorted rows,
shadow index = Ns.
"""

import numpy as np
import jax.numpy as jnp

from weasal_tpu.ops.pallas.radius_pallas import radius_search_banded


def _brute(q, s, s_valid, radius, k):
    """Exact numpy reference: [Nq, K] distance-sorted, shadow = Ns."""
    nq, ns = q.shape[0], s.shape[0]
    out = np.full((nq, k), ns, np.int32)
    d2 = ((q[:, None, :] - s[None, :, :]) ** 2).sum(-1)
    d2[:, ~s_valid] = np.inf
    d2[d2 > radius ** 2] = np.inf
    for i in range(nq):
        order = np.argsort(d2[i], kind="stable")
        order = order[d2[i][order] < np.inf][:k]
        out[i, :len(order)] = order
    return out


def _check_rows(got, q, s, s_valid, radius, k, eps=1e-4):
    """Validate the neighbor contract row-by-row with a boundary epsilon
    (implementations differ in d2 rounding near the radius shell)."""
    ns = s.shape[0]
    d2 = ((q[:, None, :] - s[None, :, :]) ** 2).sum(-1)
    d2[:, ~s_valid] = np.inf
    r_lo, r_hi = (radius - eps) ** 2, (radius + eps) ** 2
    for i in range(q.shape[0]):
        row = got[i]
        real = row[row < ns]
        # no duplicates; everything returned is within radius (+eps)
        assert len(set(real.tolist())) == len(real)
        assert np.all(d2[i, real] <= r_hi)
        # distance-sorted (within eps slack)
        dd = d2[i, real]
        assert np.all(np.diff(dd) >= -eps)
        # complete: every support strictly inside r-eps appears, unless the
        # row is full and its last entry is farther out
        inside = np.where(d2[i] < r_lo)[0]
        missing = set(inside.tolist()) - set(real.tolist())
        if len(real) < k:
            assert not missing, (i, missing)
        else:
            worst = dd[-1]
            assert all(d2[i, m] >= worst - eps for m in missing)


class TestBandedRadiusSearch:

    def _problem(self, rng, b=2, nq=200, ns=700, spread=4.0):
        s = rng.uniform(-spread, spread, (b, ns, 3)).astype(np.float32)
        s = s[np.arange(b)[:, None], np.argsort(s[:, :, 0], axis=1)]
        q = s[:, rng.permutation(ns)[:nq]]
        q = q[np.arange(b)[:, None], np.argsort(q[:, :, 0], axis=1)]
        return q, s

    def test_matches_brute_force(self):
        rng = np.random.default_rng(0)
        q, s = self._problem(rng)
        b, nq, ns = q.shape[0], q.shape[1], s.shape[1]
        qm = np.ones((b, nq), bool)
        sm = np.ones((b, ns), bool)
        radius, k = 1.1, 12
        got, ovf = radius_search_banded(
            jnp.asarray(q), jnp.asarray(s), jnp.asarray(qm),
            jnp.asarray(sm), jnp.asarray(q[:, :, 0]),
            jnp.asarray(s[:, :, 0]), radius=radius, max_count=k,
            band=512, interpret=True)
        assert float(jnp.sum(ovf)) == 0.0
        got = np.asarray(got)
        for bi in range(b):
            _check_rows(got[bi], q[bi], s[bi], sm[bi], radius, k)
        # strict equality vs brute force away from the radius shell
        ref = _brute(q[0], s[0], sm[0], radius, k)
        agree = (got[0] == ref).mean()
        assert agree > 0.99, agree

    def test_padded_rows_and_masks(self):
        rng = np.random.default_rng(1)
        q, s = self._problem(rng, b=1, nq=150, ns=500)
        nq, ns = q.shape[1], s.shape[1]
        qm = np.ones((1, nq), bool)
        qm[0, 120:] = False
        sm = np.ones((1, ns), bool)
        sm[0, 400:] = True  # keep valid; invalidate a *prefix-internal* run
        sm[0, 100:140] = False
        got, ovf = radius_search_banded(
            jnp.asarray(q), jnp.asarray(s), jnp.asarray(qm),
            jnp.asarray(sm), jnp.asarray(q[:, :, 0]),
            jnp.asarray(s[:, :, 0]), radius=1.0, max_count=10,
            band=512, interpret=True)
        got = np.asarray(got)
        # padded queries -> all-shadow rows
        assert np.all(got[0, 120:] == ns)
        # masked supports never appear
        real = got[0][got[0] < ns]
        assert not np.any((real >= 100) & (real < 140))
        _check_rows(got[0, :120], q[0, :120], s[0], sm[0], 1.0, 10)

    def test_overflow_counted_with_undersized_band(self):
        """A band too narrow for the data's spans must *report* overflow
        (the guarantee that silent truncation cannot happen)."""
        rng = np.random.default_rng(2)
        q, s = self._problem(rng, b=1, nq=256, ns=2048, spread=1.5)
        nq, ns = q.shape[1], s.shape[1]
        qm = np.ones((1, nq), bool)
        sm = np.ones((1, ns), bool)
        got, ovf = radius_search_banded(
            jnp.asarray(q), jnp.asarray(s), jnp.asarray(qm),
            jnp.asarray(sm), jnp.asarray(q[:, :, 0]),
            jnp.asarray(s[:, :, 0]), radius=1.4, max_count=8,
            band=128, interpret=True)
        assert float(ovf[0]) > 0

    def test_margin_covers_unsorted_slack(self):
        """Keys monotone only up to a slack `margin` (voxel slabs) still
        give exact results when margin is passed."""
        rng = np.random.default_rng(3)
        q, s = self._problem(rng, b=1, nq=100, ns=600)
        # shuffle within 0.3-wide x slabs: keys now non-monotone by <= 0.3
        slab = (s[0, :, 0] // 0.3).astype(np.int64)
        perm = np.lexsort((rng.random(s.shape[1]), slab))
        s = s[:, perm]
        qm = np.ones((1, 100), bool)
        sm = np.ones((1, 600), bool)
        got, ovf = radius_search_banded(
            jnp.asarray(q), jnp.asarray(s), jnp.asarray(qm),
            jnp.asarray(sm), jnp.asarray(q[:, :, 0]),
            jnp.asarray(s[:, :, 0]), radius=0.9, max_count=10,
            band=512, margin=0.3, interpret=True)
        assert float(ovf[0]) == 0.0
        _check_rows(np.asarray(got)[0], q[0], s[0], sm[0], 0.9, 10)


class TestBandedDevicePyramid:

    def test_banded_pyramid_matches_xla_search(self):
        """Full device pyramid with use_pallas_search: neighbor/pool/up
        indices equal the XLA top_k path's (away from radius-shell ties),
        overflow telemetry is zero."""
        from weasal_tpu.data.batching import ShapePlan
        from weasal_tpu.ops.pyramid import build_pyramid_device

        class Cfg:
            first_subsampling_dl = 0.35
            in_radius = 4.0
            conv_radius = 2.5
            deform_radius = 5.0
            num_layers = 3
            deformable_blocks = ()
            architecture = []
            use_pallas_search = False
            pallas_band = 0           # auto: sized per level from the plan
            pallas_interpret = True

        rng = np.random.default_rng(4)
        n0 = 1024
        pts = rng.uniform(-4, 4, (2, n0, 3)).astype(np.float32)
        pts = pts[np.arange(2)[:, None], np.argsort(pts[:, :, 0], axis=1)]
        mask = np.ones((2, n0), bool)
        mask[1, 900:] = False
        plan = ShapePlan(num_points=[n0, 512, 256],
                         conv_neighbors=[16, 20, 24],
                         pool_neighbors=[16, 20])

        ref = build_pyramid_device(jnp.asarray(pts), jnp.asarray(mask),
                                   Cfg, plan)
        Cfg.use_pallas_search = True
        got = build_pyramid_device(jnp.asarray(pts), jnp.asarray(mask),
                                   Cfg, plan)
        assert float(jnp.sum(got[5])) == 0.0, \
            "window overflow on sorted input"
        for kind in (2, 3, 4):            # neighbors, pools, upsamples
            for lref, lgot in zip(ref[kind], got[kind]):
                a, b = np.asarray(lref), np.asarray(lgot)
                agree = (a == b).mean()
                assert agree > 0.97, (kind, agree)
