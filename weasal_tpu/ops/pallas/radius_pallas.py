"""Banded radius neighbor search — Pallas TPU kernel.

Replaces the XLA `radius_search_fixed` path inside the device pyramid
(weasal_tpu/ops/neighbors.py), whose `lax.top_k` lowers to a full variadic
sort of every [chunk, Ns] distance tile — measured at ~80% of the whole
fused train step at reference geometry (331 ms of device time; see
scripts/profile_fused.py and STATUS.md).

Design: supports arrive spatially sorted along one axis (voxel-linear
order — grid_subsample_fixed emits it, assemble_level0 applies it to
level 0), and a monotone sort key (the rotated-frame x coordinate) is
provided for both sides. For each 128-query tile the wrapper computes the
index window that can contain in-radius supports (count of sort keys
below the tile's lower bound), quantized to `n_win` 128-row blocks
fetched via scalar-prefetched BlockSpec indices (start quantized at 128
rows, so the fetched window is span+256 — a two-W-block scheme wastes
~2x). The kernel then:

    d2[t, n] = |q_t - s_n|^2 over the window         (per-axis f32 VPU —
               no matmul, so no bf16-demotion precision trap, no HIGHEST
               multi-pass cost)
    d2 = inf where d2 > r^2
    K x (min / arg-min / knock-out)  ->  distance-sorted indices

which is exactly nanoflann's contract (cpp_wrappers/cpp_neighbors/
neighbors.cpp:211-332): rows sorted by distance, ties by lowest index,
shadow index = Ns for missing neighbors. No sort, no MXU — the whole
search is VPU element-wise work.

Coverage: `band` keeps its half-window meaning W — spans <= W+1 are
always covered. Supports whose key lies inside the tile's [lo, hi] range
but beyond the window are *counted* by the wrapper (`overflow` output, a
conservative upper bound on missed candidates): undersized windows are
visible, never silent.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from weasal_tpu.ops.pallas.common import (
    COMPILER_PARAMS as _COMPILER_PARAMS, DEFAULT_BAND, DEFAULT_TILE,
    QUANTUM, n_win as _n_win)


def auto_band(radius: float, margin: float, nq: int, ns: int,
              in_radius: float, tile: int = DEFAULT_TILE,
              safety: float = 1.35) -> int:
    """Static band half-window W for a given search geometry.

    With x-major spatial order, the support rows reachable from one
    `tile`-query block span the x-strip [x_lo - (r+m), x_hi + (r+m)].
    For a radius-R disc with Ns points, a strip of width 2(r+m) holds
    about density * 2(r+m) * mean-chord = Ns*(r+m)/R rows (mean chord
    of a disc = pi*R/2); the tile's own queries map to ~tile * Ns/Nq
    support rows. `margin` is the support order's sort slack (that
    level's voxel size). Kernel cost scales linearly with the window, so
    this uses the *mean* strip population (validated against measured
    spans at reference geometry) with a `safety` factor for density
    pockets — undersized windows show up in the overflow/oob outputs,
    never silently. The window guarantees coverage of spans <= W+1.
    """
    span = (ns * (radius + margin) / in_radius
            + tile * max(1.0, ns / max(nq, 1)))
    # +64 absolute headroom: density pockets in clustered scenes push the
    # tail past the mean-chord estimate (measured ~0.05% drops without it
    # on 133k-pt synthetic tiles; counted, but avoidable)
    return max(256, int(math.ceil((safety * span + 64) / 128.0)) * 128)


def _search_kernel(starts_ref, q_ref, *s_refs, out_ref,
                   radius2: float, max_count: int, n_support: int,
                   n_win: int):
    t = q_ref.shape[0]
    width = n_win * QUANTUM
    i = pl.program_id(0)
    start_row = starts_ref[i] * QUANTUM

    q = q_ref[:]                                              # [T, 3]
    s = jnp.concatenate([r[:] for r in s_refs], axis=0)       # [win, 3]

    inf = jnp.float32(jnp.inf)
    d2 = jnp.zeros((t, width), jnp.float32)
    for d in range(3):
        diff = q[:, d:d + 1] - s[:, d:d + 1].T                # [T, win]
        d2 += diff * diff
    d2 = jnp.where(d2 > radius2, inf, d2)

    col_ids = jax.lax.broadcasted_iota(jnp.int32, (t, width), 1)
    big = jnp.int32(2 * n_support + width)
    for k in range(max_count):
        m = jnp.min(d2, axis=1, keepdims=True)                # [T, 1]
        is_min = (d2 <= m) & (m < inf)
        idx = jnp.min(jnp.where(is_min, col_ids, big), axis=1,
                      keepdims=True)                          # [T, 1]
        found = idx < big
        out_ref[:, k:k + 1] = jnp.where(
            found, idx + start_row, n_support).astype(jnp.int32)
        d2 = jnp.where(col_ids == idx, inf, d2)


@functools.partial(jax.jit, static_argnames=("radius", "max_count", "band",
                                             "tile", "margin", "interpret"))
def radius_search_banded(queries: jnp.ndarray,
                         supports: jnp.ndarray,
                         q_mask: jnp.ndarray,
                         s_mask: jnp.ndarray,
                         skey_q: jnp.ndarray,
                         skey_s: jnp.ndarray,
                         radius,
                         max_count: int,
                         band: int = DEFAULT_BAND,
                         tile: int = DEFAULT_TILE,
                         margin: float = 0.0,
                         interpret: bool = False):
    """Banded fixed-width radius search over a batch of padded spheres.

    :param queries: [B, Nq, 3]; supports: [B, Ns, 3] sorted so that
        `skey_s` is non-decreasing up to `margin`
    :param q_mask/s_mask: [B, N] validity
    :param skey_q/skey_s: [B, N] monotone sort keys (rotated x coord)
    :param radius: search radius; margin: sort-key slack (voxel size)
    :param max_count: static row width K
    :param band: half-window W — key spans <= W+1 rows always covered
    :return: (neighbors [B, Nq, K] int32 — distance-sorted, shadow = Ns;
        overflow [B] f32 — count of window rows that could not be covered;
        0 means the result equals the exact search)
    """
    b, nq, _ = queries.shape
    ns = supports.shape[1]
    r = jnp.float32(radius)
    n_win = _n_win(band)

    pad_q = (-nq) % tile
    n_tiles = (nq + pad_q) // tile
    ns_pad = max(n_win * QUANTUM,
                 ((ns + QUANTUM - 1) // QUANTUM) * QUANTUM)
    n_blocks = ns_pad // QUANTUM

    inf = jnp.float32(jnp.inf)
    # Invalid entries: queries to +inf key (window selection only),
    # supports to 1e6 coords (never in radius) and +inf key.
    q_pad = jnp.pad(jnp.where(q_mask[..., None], queries, 1e6),
                    ((0, 0), (0, pad_q), (0, 0)), constant_values=1e6)
    s_valid = jnp.where(s_mask[..., None], supports, 1e6)
    s_pad = jnp.pad(s_valid, ((0, 0), (0, ns_pad - ns), (0, 0)),
                    constant_values=1e6)
    kq = jnp.where(q_mask, skey_q, inf)
    kq = jnp.pad(kq, ((0, 0), (0, pad_q)), constant_values=jnp.inf)
    ks = jnp.where(s_mask, skey_s, inf)

    # Per-tile key range over valid queries
    kq_t = kq.reshape(b, n_tiles, tile)
    lo = jnp.min(kq_t, axis=2) - r - margin                   # [B, T#]
    hi = jnp.max(jnp.where(jnp.isinf(kq_t), -inf, kq_t),
                 axis=2) + r + margin

    # Window = [count(ks < lo), count(ks <= hi))
    below = jnp.sum((ks[:, None, :] < lo[:, :, None]), axis=2)
    until = jnp.sum((ks[:, None, :] <= hi[:, :, None]), axis=2)
    starts = jnp.clip(below // QUANTUM, 0,
                      n_blocks - n_win).astype(jnp.int32)
    covered_end = (starts + n_win) * QUANTUM
    overflow = jnp.sum(jnp.maximum(until - covered_end, 0)
                       * (hi >= lo), axis=1).astype(jnp.float32)

    q2 = q_pad.reshape(b * (nq + pad_q), 3)
    s2 = s_pad.reshape(b * ns_pad, 3)
    starts2 = starts.reshape(-1)

    def block_map(j):
        return lambda i, st: ((i // n_tiles) * n_blocks + st[i] + j, 0)

    def kernel(starts_ref, q_ref, *s_refs_and_out):
        _search_kernel(starts_ref, q_ref, *s_refs_and_out[:-1],
                       out_ref=s_refs_and_out[-1],
                       radius2=float(radius) ** 2, max_count=max_count,
                       n_support=ns, n_win=n_win)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b * n_tiles,),
        in_specs=[pl.BlockSpec((tile, 3), lambda i, st: (i, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((QUANTUM, 3), block_map(j),
                        memory_space=pltpu.VMEM) for j in range(n_win)],
        out_specs=pl.BlockSpec((tile, max_count), lambda i, st: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b * (nq + pad_q), max_count),
                                       jnp.int32),
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(starts2, q2, *([s2] * n_win))
    out = out.reshape(b, nq + pad_q, max_count)[:, :nq]
    out = jnp.where(q_mask[..., None], out, ns)
    return out, overflow
