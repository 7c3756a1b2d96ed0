"""Radius neighbor search with fixed-width, distance-sorted, shadow-padded rows.

Replaces the reference's C++ nanoflann batch search
(cpp_wrappers/cpp_neighbors/neighbors/neighbors.cpp:211-332). Semantics
preserved exactly, because downstream ops depend on them:

- each row lists support indices within `radius` of the query, **sorted by
  distance** (closest first) — `closest_pool` reads column 0
  (models/blocks.py:80-92) and row cropping must keep the nearest;
- rows are padded with the **shadow index = number of supports**, which maps
  to an appended far-away point / zero feature row in KPConv
  (models/blocks.py:278,357).

Implementations:

- `radius_search`: host-side scipy cKDTree (variable max_count like the C++).
- `radius_search_fixed`: jittable fixed-shape version for padded spheres.
  Distances come from one |q|^2 + |s|^2 - 2 q.s matmul (MXU-friendly), the
  K nearest inside the radius from `jax.lax.top_k`. Query chunking keeps the
  distance tile in a controlled working-set size.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial import cKDTree


# ----------------------------------------------------------------------------
# Host (numpy / cKDTree) version
# ----------------------------------------------------------------------------

def radius_search(queries: np.ndarray,
                  supports: np.ndarray,
                  radius: float,
                  max_count: int = 0) -> np.ndarray:
    """Distance-sorted radius neighbors of each query among supports.

    Returns int32 [n_queries, max_count] (or the observed max row length if
    max_count == 0), padded with shadow index = len(supports).
    """
    queries = np.asarray(queries, dtype=np.float32)
    supports = np.asarray(supports, dtype=np.float32)
    n_s = supports.shape[0]

    # Fixed-width queries go through the native bucket-grid kernel when built
    if max_count:
        from weasal_tpu.ops import native
        if native.available():
            return native.radius_search_native(queries, supports,
                                               float(radius), max_count)
    return radius_search_scipy(queries, supports, radius, max_count)


def radius_search_scipy(queries, supports, radius, max_count=0):
    """cKDTree reference implementation (oracle for the native kernel)."""
    queries = np.asarray(queries, dtype=np.float32)
    supports = np.asarray(supports, dtype=np.float32)
    n_s = supports.shape[0]
    tree = cKDTree(supports)
    neighbor_lists = tree.query_ball_point(queries, r=radius)

    # Sort each row by distance
    rows = []
    for qi, inds in enumerate(neighbor_lists):
        inds = np.asarray(inds, dtype=np.int32)
        if inds.size:
            d2 = np.sum((supports[inds] - queries[qi]) ** 2, axis=1)
            inds = inds[np.argsort(d2, kind="stable")]
        rows.append(inds)

    width = max_count if max_count else max((r.size for r in rows), default=1)
    out = np.full((queries.shape[0], max(width, 1)), n_s, dtype=np.int32)
    for qi, inds in enumerate(rows):
        k = min(inds.size, out.shape[1])
        out[qi, :k] = inds[:k]
    return out


def batch_radius_search(queries: np.ndarray,
                        supports: np.ndarray,
                        q_lengths: np.ndarray,
                        s_lengths: np.ndarray,
                        radius: float,
                        max_count: int = 0) -> np.ndarray:
    """Batched host search over stacked clouds (reference batch_query API).

    Indices refer to the stacked support array; rows of different elements
    never mix. Shadow index = total support count (like the reference's
    supports.size() pad, neighbors.cpp:324).
    """
    n_total = supports.shape[0]
    per_elem = []
    qi0 = si0 = 0
    for ql, sl in zip(q_lengths, s_lengths):
        local = radius_search(queries[qi0:qi0 + ql],
                              supports[si0:si0 + sl], radius, max_count)
        shadow = local == sl
        local = local.astype(np.int32) + np.int32(si0)
        local[shadow] = n_total
        per_elem.append(local)
        qi0 += ql
        si0 += sl

    width = max_count if max_count else max(p.shape[1] for p in per_elem)
    # int32 like radius_search and the reference's batch_query
    out = np.full((queries.shape[0], width), n_total, dtype=np.int32)
    qi0 = 0
    for p in per_elem:
        out[qi0:qi0 + p.shape[0], :p.shape[1]] = p[:, :width]
        qi0 += p.shape[0]
    return out


# ----------------------------------------------------------------------------
# Device (JAX) fixed-shape version
# ----------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("max_count", "chunk"))
def radius_search_fixed(queries: jnp.ndarray,
                        supports: jnp.ndarray,
                        q_mask: jnp.ndarray,
                        s_mask: jnp.ndarray,
                        radius: float,
                        max_count: int,
                        chunk: int = 512) -> jnp.ndarray:
    """Fixed-shape radius search for one padded sphere.

    :param queries: [Nq, 3] float32
    :param supports: [Ns, 3] float32
    :param q_mask / s_mask: validity masks
    :param radius: search radius (static or traced scalar)
    :param max_count: static row width K
    :param chunk: static query tile size (controls distance-tile memory)
    :return: int32 [Nq, K], distance-sorted, shadow index = Ns

    Padded queries get all-shadow rows. vmap over a leading batch axis for
    batched spheres.
    """
    n_q, _ = queries.shape
    n_s, _ = supports.shape
    r2 = jnp.float32(radius) ** 2
    inf = jnp.float32(jnp.inf)

    s_norm2 = jnp.sum(supports * supports, axis=1)          # [Ns]
    s_invalid = jnp.logical_not(s_mask)

    # Pad query count to a multiple of chunk (extra rows discarded at the end)
    pad = (-n_q) % chunk
    q_pad = jnp.pad(queries, ((0, pad), (0, 0)))
    n_tiles = (n_q + pad) // chunk
    q_tiles = q_pad.reshape(n_tiles, chunk, 3)

    def one_tile(q_tile):
        q_norm2 = jnp.sum(q_tile * q_tile, axis=1)          # [chunk]
        # [chunk, Ns] squared distances via MXU matmul. precision=HIGHEST is
        # REQUIRED: this platform demotes default-precision f32 matmuls to
        # bf16 granularity, and at meter-scale coordinates (|q.s| ~ r_in^2)
        # the resulting d2 error (measured up to ~4 m^2 at r_in=18) exceeds
        # the search radius itself, silently corrupting every neighborhood.
        d2 = (q_norm2[:, None] + s_norm2[None, :]
              - 2.0 * jnp.matmul(q_tile, supports.T,
                                 precision=jax.lax.Precision.HIGHEST))
        d2 = jnp.where(s_invalid[None, :], inf, d2)
        d2 = jnp.where(d2 > r2, inf, d2)
        neg, idx = jax.lax.top_k(-d2, max_count)            # ascending d2
        idx = jnp.where(jnp.isinf(-neg), n_s, idx)
        return idx.astype(jnp.int32)

    inds = jax.lax.map(one_tile, q_tiles)                   # [T, chunk, K]
    inds = inds.reshape(-1, max_count)[:n_q]
    return jnp.where(q_mask[:, None], inds, n_s)
