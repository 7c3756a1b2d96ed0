"""Pallas fused KPConv vs the XLA reference op (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from weasal_tpu.ops.kpconv import KPConvParams, kpconv
from weasal_tpu.ops.pallas.kpconv_pallas import kpconv_batched_pallas


def _problem(rng, b=2, n_q=100, n_s=150, k=9, kp=15, cin=8, cout=16):
    q = rng.uniform(-2, 2, size=(b, n_q, 3)).astype(np.float32)
    s = rng.uniform(-2, 2, size=(b, n_s, 3)).astype(np.float32)
    nb = rng.integers(0, n_s + 1, size=(b, n_q, k)).astype(np.int32)
    x = rng.normal(size=(b, n_s, cin)).astype(np.float32)
    kpts = rng.uniform(-0.3, 0.3, size=(kp, 3)).astype(np.float32)
    w = (rng.normal(size=(kp, cin, cout)) / np.sqrt(cin)).astype(np.float32)
    return q, s, nb, x, kpts, w


class TestPallasKPConv:

    def test_forward_matches_xla(self):
        rng = np.random.default_rng(0)
        q, s, nb, x, kpts, w = _problem(rng)
        params = KPConvParams(kp_extent=0.5)
        expected, _ = kpconv(jnp.asarray(q), jnp.asarray(s),
                             jnp.asarray(nb), jnp.asarray(x),
                             jnp.asarray(kpts), jnp.asarray(w), params)
        got = kpconv_batched_pallas(jnp.asarray(q), jnp.asarray(s),
                                    jnp.asarray(nb), jnp.asarray(x),
                                    kpts, jnp.asarray(w), kp_extent=0.5,
                                    tile=32, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                                   rtol=2e-4, atol=2e-4)

    def test_forward_gaussian(self):
        rng = np.random.default_rng(1)
        q, s, nb, x, kpts, w = _problem(rng, b=1, n_q=64)
        params = KPConvParams(kp_extent=0.5, influence="gaussian")
        expected, _ = kpconv(jnp.asarray(q), jnp.asarray(s),
                             jnp.asarray(nb), jnp.asarray(x),
                             jnp.asarray(kpts), jnp.asarray(w), params)
        got = kpconv_batched_pallas(jnp.asarray(q), jnp.asarray(s),
                                    jnp.asarray(nb), jnp.asarray(x),
                                    kpts, jnp.asarray(w), kp_extent=0.5,
                                    influence="gaussian", tile=32,
                                    interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                                   rtol=2e-4, atol=2e-4)

    def test_query_count_not_multiple_of_tile(self):
        rng = np.random.default_rng(2)
        q, s, nb, x, kpts, w = _problem(rng, b=1, n_q=77)
        params = KPConvParams(kp_extent=0.5)
        expected, _ = kpconv(jnp.asarray(q), jnp.asarray(s),
                             jnp.asarray(nb), jnp.asarray(x),
                             jnp.asarray(kpts), jnp.asarray(w), params)
        got = kpconv_batched_pallas(jnp.asarray(q), jnp.asarray(s),
                                    jnp.asarray(nb), jnp.asarray(x),
                                    kpts, jnp.asarray(w), kp_extent=0.5,
                                    tile=32, interpret=True)
        assert got.shape == (1, 77, 16)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                                   rtol=2e-4, atol=2e-4)

    def test_gradients_match_xla(self):
        rng = np.random.default_rng(3)
        q, s, nb, x, kpts, w = _problem(rng, b=2, n_q=40, n_s=60, k=6,
                                        kp=7, cin=4, cout=5)
        params = KPConvParams(kp_extent=0.5)

        def loss_xla(x_, w_):
            out, _ = kpconv(jnp.asarray(q), jnp.asarray(s), jnp.asarray(nb),
                            x_, jnp.asarray(kpts), w_, params)
            return jnp.sum(out ** 2)

        def loss_pallas(x_, w_):
            out = kpconv_batched_pallas(
                jnp.asarray(q), jnp.asarray(s), jnp.asarray(nb), x_, kpts,
                w_, kp_extent=0.5, tile=16, interpret=True)
            return jnp.sum(out ** 2)

        gx_ref, gw_ref = jax.grad(loss_xla, argnums=(0, 1))(
            jnp.asarray(x), jnp.asarray(w))
        gx, gw = jax.grad(loss_pallas, argnums=(0, 1))(
            jnp.asarray(x), jnp.asarray(w))
        np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                                   rtol=5e-4, atol=5e-4)
        np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref),
                                   rtol=5e-4, atol=5e-4)
