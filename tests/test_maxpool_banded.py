"""Banded max-pool backward kernel vs the dense jnp.max oracle.

Interpret mode (CPU): the kernel must reproduce the dense route's VJP
exactly — including tie splitting and shadow handling — because the
winner fractions it consumes ARE jnp.max's VJP mask.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from weasal_tpu.ops.kpconv import max_pool
from weasal_tpu.ops.pallas.maxpool_banded import max_pool_banded


def _problem(rng, b=2, nq=40, ns=37, k=5, c=8, sorted_supports=True):
    x = rng.normal(size=(b, ns, c)).astype(np.float32)
    # banded neighbor lists: indices near the query's own row position,
    # like spatially sorted levels produce
    base = (np.arange(nq) * ns / nq).astype(np.int32)
    nb = base[None, :, None] + rng.integers(-4, 5, size=(b, nq, k))
    nb = np.clip(nb, 0, ns)                     # ns == shadow
    nb[rng.random(size=nb.shape) < 0.1] = ns    # sprinkle shadows
    return jnp.asarray(x), jnp.asarray(nb.astype(np.int32))


class TestMaxPoolBanded:

    def test_value_matches_dense(self):
        x, nb = _problem(np.random.default_rng(0))
        out_b = max_pool_banded(x, nb, 0, 128, True)
        out_d = max_pool(x, nb, route="dense")
        np.testing.assert_array_equal(np.asarray(out_b), np.asarray(out_d))

    def test_grad_matches_dense_vjp(self):
        x, nb = _problem(np.random.default_rng(1))

        def loss(fn):
            return lambda v: jnp.sum(jnp.sin(fn(v) * 3.0))
        g_b = jax.grad(loss(lambda v: max_pool_banded(v, nb, 0, 128,
                                                      True)))(x)
        g_d = jax.grad(loss(lambda v: max_pool(v, nb, route="dense")))(x)
        np.testing.assert_allclose(np.asarray(g_b), np.asarray(g_d),
                                   rtol=1e-6, atol=1e-6)

    def test_grad_with_exact_ties_splits_like_dense(self):
        # duplicate support rows force exact value ties across slots
        rng = np.random.default_rng(2)
        x = rng.normal(size=(1, 8, 4)).astype(np.float32)
        x[0, 4] = x[0, 1]
        x[0, 6] = x[0, 1]
        nb = np.array([[[1, 4, 6], [0, 2, 8], [8, 8, 8]]], np.int32)
        xj, nbj = jnp.asarray(x), jnp.asarray(nb)
        g_b = jax.grad(lambda v: jnp.sum(
            max_pool_banded(v, nbj, 0, 128, True)))(xj)
        g_d = jax.grad(lambda v: jnp.sum(
            max_pool(v, nbj, route="dense")))(xj)
        np.testing.assert_allclose(np.asarray(g_b), np.asarray(g_d),
                                   rtol=1e-6, atol=1e-6)

    def test_multi_tile_multi_sphere(self):
        # nq > tile exercises the per-tile window starts and the dX
        # accumulation across query tiles of one sphere
        x, nb = _problem(np.random.default_rng(3), b=3, nq=300, ns=280,
                         k=7, c=16)
        g_b = jax.grad(lambda v: jnp.sum(
            max_pool_banded(v, nb, 0, 128, True) ** 2))(x)
        g_d = jax.grad(lambda v: jnp.sum(
            max_pool(v, nb, route="dense") ** 2))(x)
        np.testing.assert_allclose(np.asarray(g_b), np.asarray(g_d),
                                   rtol=1e-5, atol=1e-5)
