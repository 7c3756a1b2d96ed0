"""KPConv op tests against a literal numpy port of the reference math.

The oracle below re-implements models/blocks.py:238-374 (rigid path) in
plain numpy on a single un-padded sphere; the JAX op must match it to float
tolerance on real points, with shadow-padded queries/neighbors handled by
masking.
"""

import numpy as np
import jax
import jax.numpy as jnp

from weasal_tpu.ops.kpconv import (
    KPConvParams, closest_pool, global_average, kpconv,
    max_pool)


def numpy_kpconv_rigid(q_pts, s_pts, neighb_inds, x, K_points, weights,
                       kp_extent, influence="linear", aggregation="sum"):
    """Oracle: the reference rigid KPConv forward, numpy, single sphere."""
    n_s = s_pts.shape[0]
    s_pad = np.vstack([s_pts, np.full((1, 3), 1e6, np.float32)])
    neighbors = s_pad[neighb_inds] - q_pts[:, None, :]        # [n, k, 3]
    diffs = neighbors[:, :, None, :] - K_points[None, None]   # [n, k, Kp, 3]
    sq = np.sum(diffs ** 2, axis=3)                           # [n, k, Kp]

    if influence == "constant":
        w = np.ones_like(sq)
    elif influence == "linear":
        w = np.clip(1 - np.sqrt(sq) / kp_extent, 0, None)
    elif influence == "gaussian":
        sig = kp_extent * 0.3
        w = np.exp(-sq / (2 * sig ** 2 + 1e-9))
    w = np.transpose(w, (0, 2, 1))                            # [n, Kp, k]

    if aggregation == "closest":
        closest = np.argmin(sq, axis=2)                       # [n, k]
        onehot = np.eye(K_points.shape[0], dtype=w.dtype)[closest]
        w = w * np.transpose(onehot, (0, 2, 1))

    x_pad = np.vstack([x, np.zeros((1, x.shape[1]), np.float32)])
    nx = x_pad[neighb_inds]                                   # [n, k, cin]
    weighted = np.matmul(w, nx)                               # [n, Kp, cin]
    out = np.einsum("npc,pcd->nd", weighted, weights)
    return out


def _random_problem(rng, n_q=50, n_s=80, k=12, kp=15, cin=5, cout=7,
                    radius=1.0):
    q = rng.uniform(-2, 2, size=(n_q, 3)).astype(np.float32)
    s = rng.uniform(-2, 2, size=(n_s, 3)).astype(np.float32)
    # Real-ish neighbor rows: nearest k within radius, else shadow
    d2 = np.sum((q[:, None] - s[None]) ** 2, axis=2)
    neighb = np.full((n_q, k), n_s, dtype=np.int32)
    for i in range(n_q):
        inds = np.where(d2[i] <= radius ** 2)[0]
        inds = inds[np.argsort(d2[i][inds])][:k]
        neighb[i, :len(inds)] = inds
    x = rng.normal(size=(n_s, cin)).astype(np.float32)
    kpoints = rng.uniform(-0.3, 0.3, size=(kp, 3)).astype(np.float32)
    w = rng.normal(size=(kp, cin, cout)).astype(np.float32) / np.sqrt(cin)
    return q, s, neighb, x, kpoints, w


class TestKPConvForward:

    def _check(self, influence, aggregation):
        rng = np.random.default_rng(0)
        q, s, neighb, x, kpoints, w = _random_problem(rng)
        expected = numpy_kpconv_rigid(q, s, neighb, x, kpoints, w,
                                      kp_extent=0.4, influence=influence,
                                      aggregation=aggregation)
        params = KPConvParams(kp_extent=0.4, influence=influence,
                              aggregation=aggregation)
        got, min_sq = kpconv(jnp.asarray(q[None]), jnp.asarray(s[None]),
                             jnp.asarray(neighb[None]), jnp.asarray(x[None]),
                             jnp.asarray(kpoints), jnp.asarray(w), params)
        assert min_sq is None
        np.testing.assert_allclose(np.asarray(got[0]), expected,
                                   rtol=2e-4, atol=2e-4)

    def test_linear_sum(self):
        self._check("linear", "sum")

    def test_gaussian_sum(self):
        self._check("gaussian", "sum")

    def test_constant_sum(self):
        self._check("constant", "sum")

    def test_linear_closest(self):
        self._check("linear", "closest")

    def test_batched_matches_per_sphere(self):
        rng = np.random.default_rng(1)
        problems = [_random_problem(rng) for _ in range(3)]
        params = KPConvParams(kp_extent=0.4)
        kpoints, w = problems[0][4], problems[0][5]
        q = jnp.stack([jnp.asarray(p[0]) for p in problems])
        s = jnp.stack([jnp.asarray(p[1]) for p in problems])
        nb = jnp.stack([jnp.asarray(p[2]) for p in problems])
        x = jnp.stack([jnp.asarray(p[3]) for p in problems])
        got, _ = kpconv(q, s, nb, x, jnp.asarray(kpoints), jnp.asarray(w),
                        params)
        for b, p in enumerate(problems):
            exp = numpy_kpconv_rigid(p[0], p[1], p[2], p[3], kpoints, w, 0.4)
            np.testing.assert_allclose(np.asarray(got[b]), exp,
                                       rtol=2e-4, atol=2e-4)

    def test_all_shadow_row_gives_zero(self):
        rng = np.random.default_rng(2)
        q, s, neighb, x, kpoints, w = _random_problem(rng)
        neighb[7, :] = s.shape[0]  # query 7 has no neighbors
        params = KPConvParams(kp_extent=0.4)
        got, _ = kpconv(jnp.asarray(q[None]), jnp.asarray(s[None]),
                        jnp.asarray(neighb[None]), jnp.asarray(x[None]),
                        jnp.asarray(kpoints), jnp.asarray(w), params)
        np.testing.assert_allclose(np.asarray(got[0, 7]), 0.0, atol=1e-6)

    def test_deformable_offsets_and_min_sq(self):
        rng = np.random.default_rng(3)
        q, s, neighb, x, kpoints, w = _random_problem(rng)
        offsets = rng.normal(scale=0.05,
                             size=(1, q.shape[0], 15, 3)).astype(np.float32)
        params = KPConvParams(kp_extent=0.4, deformable=True)
        got, min_sq = kpconv(jnp.asarray(q[None]), jnp.asarray(s[None]),
                             jnp.asarray(neighb[None]), jnp.asarray(x[None]),
                             jnp.asarray(kpoints), jnp.asarray(w), params,
                             offsets=jnp.asarray(offsets))
        assert min_sq.shape == (1, q.shape[0], 15)
        # Oracle with shifted kernels, per query (masking of out-of-range
        # neighbors only affects neighbors with zero linear weight anyway)
        for i in [0, 11, 29]:
            exp = numpy_kpconv_rigid(q[i:i + 1], s, neighb[i:i + 1], x,
                                     kpoints + offsets[0, i], w, 0.4)
            np.testing.assert_allclose(np.asarray(got[0, i]), exp[0],
                                       rtol=3e-4, atol=3e-4)

    def test_gradients_finite_difference(self):
        # Finite differences need float64; enable x64 for this test only
        jax.config.update("jax_enable_x64", True)
        try:
            self._gradients_finite_difference()
        finally:
            jax.config.update("jax_enable_x64", False)

    def _gradients_finite_difference(self):
        rng = np.random.default_rng(4)
        q, s, neighb, x, kpoints, w = _random_problem(
            rng, n_q=10, n_s=20, k=6, kp=5, cin=3, cout=2)
        params = KPConvParams(kp_extent=0.5)

        def loss(w_, x_):
            out, _ = kpconv(jnp.asarray(q[None]), jnp.asarray(s[None]),
                            jnp.asarray(neighb[None]), x_[None],
                            jnp.asarray(kpoints), w_, params)
            return jnp.sum(out ** 2)

        g_w, g_x = jax.grad(loss, argnums=(0, 1))(
            jnp.asarray(w.astype(np.float64)),
            jnp.asarray(x.astype(np.float64)))
        eps = 1e-5
        # Spot-check a few coordinates of each gradient
        for idx in [(0, 0, 0), (2, 1, 1), (4, 2, 0)]:
            wp = w.astype(np.float64).copy(); wp[idx] += eps
            wm = w.astype(np.float64).copy(); wm[idx] -= eps
            fd = (loss(jnp.asarray(wp), jnp.asarray(x.astype(np.float64)))
                  - loss(jnp.asarray(wm), jnp.asarray(x.astype(np.float64))))
            fd = float(fd) / (2 * eps)
            np.testing.assert_allclose(float(g_w[idx]), fd, rtol=1e-3,
                                       atol=1e-3)
        for idx in [(0, 0), (7, 2), (19, 1)]:
            xp = x.astype(np.float64).copy(); xp[idx] += eps
            xm = x.astype(np.float64).copy(); xm[idx] -= eps
            fd = (loss(jnp.asarray(w.astype(np.float64)), jnp.asarray(xp))
                  - loss(jnp.asarray(w.astype(np.float64)), jnp.asarray(xm)))
            fd = float(fd) / (2 * eps)
            np.testing.assert_allclose(float(g_x[idx]), fd, rtol=1e-3,
                                       atol=1e-3)


class TestPooling:

    def test_max_pool_with_shadow(self):
        x = jnp.asarray(np.array(
            [[[1., -2.], [3., -4.], [-5., 6.]]], np.float32))   # [1, 3, 2]
        inds = jnp.asarray(np.array([[[0, 1, 3], [2, 3, 3]]], np.int32))
        out = np.asarray(max_pool(x, inds))
        # Row 0: max(x0, x1, zero) ; row 1: max(x2, zero, zero)
        np.testing.assert_allclose(out[0, 0], [3., 0.])
        np.testing.assert_allclose(out[0, 1], [0., 6.])

    def test_max_pool_routes_agree(self):
        # The argmax-regather route (cheap backward, round 5) must match
        # the dense jnp.max route exactly in value and — off ties — in
        # gradient. Random continuous features have no exact ties except
        # at the zero shadow row, which both routes handle.
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(2, 40, 8)).astype(np.float32))
        inds = jnp.asarray(rng.integers(0, 41, size=(2, 24, 5))
                           .astype(np.int32))        # 40 == shadow
        out_a = np.asarray(max_pool(x, inds, route="argmax"))
        out_d = np.asarray(max_pool(x, inds, route="dense"))
        np.testing.assert_array_equal(out_a, out_d)

        def loss(route):
            return lambda v: jnp.sum(
                jnp.sin(max_pool(v, inds, route=route) * 3.0))
        g_a = np.asarray(jax.grad(loss("argmax"))(x))
        g_d = np.asarray(jax.grad(loss("dense"))(x))
        np.testing.assert_allclose(g_a, g_d, rtol=1e-6, atol=1e-6)

    def test_max_pool_all_shadow_row_gradient_is_zero(self):
        x = jnp.asarray(np.random.default_rng(0)
                        .normal(size=(1, 4, 3)).astype(np.float32))
        inds = jnp.asarray(np.array([[[4, 4, 4], [0, 4, 4]]], np.int32))
        out = np.asarray(max_pool(x, inds, route="argmax"))
        np.testing.assert_allclose(out[0, 0], 0.0)   # all-shadow -> 0
        g = np.asarray(jax.grad(
            lambda v: jnp.sum(max_pool(v, inds, route="argmax")))(x))
        # row 0's gradient lands on the pad row (dropped); row 1 routes
        # to support 0 only where it beats the zero pad
        win = np.asarray(x[0, 0] > 0).astype(np.float32)
        np.testing.assert_allclose(g[0, 0], win)
        np.testing.assert_allclose(g[0, 1:], 0.0)

    def test_closest_pool_reads_column_zero(self):
        x = jnp.asarray(np.arange(6, dtype=np.float32).reshape(1, 3, 2))
        inds = jnp.asarray(np.array([[[2, 0], [3, 1]]], np.int32))
        out = np.asarray(closest_pool(x, inds))
        np.testing.assert_allclose(out[0, 0], [4., 5.])  # support 2
        np.testing.assert_allclose(out[0, 1], [0., 0.])  # shadow -> zeros

    def test_global_average_masked(self):
        x = jnp.asarray(np.array([[[2., 4.], [4., 8.], [100., 100.]]],
                                 np.float32))
        mask = jnp.asarray(np.array([[True, True, False]]))
        out = np.asarray(global_average(x, mask))
        np.testing.assert_allclose(out[0], [3., 6.])
