"""Banded max-pool backward — Pallas TPU kernel (scatter-free dX).

The strided-shortcut max pools are the largest coherent non-conv cost of
the fused train step (~3.4 ms of 45.7 ms at Vaihingen bench shapes,
round-5 trace mining): jnp.max's VJP broadcasts the pooled output over
all K neighbor slots, rebuilds the [B, Nq, K, C] comparison mask and
scatter-adds K*C-deep — ~10x off its own memory roofline. A flat
per-(query, channel) re-gather route was measured 2x WORSE end to end
(XLA lowers element-granularity 1D gathers/scatters to serialized
loops; full_run/perf/maxpool_route.jsonl).

This module keeps the FORWARD in XLA (gather + max is cheap and fuses)
and replaces only the backward with a banded kernel in the style of
kpconv_banded's dX pass: with supports spatially sorted, each query
tile's neighbors live in a contiguous block window, so for every
neighbor slot k the scatter becomes a membership matmul

    A_k[t, q] = (nb[t, k] == block_start + q)        # one compare pass
    dX[block] += A_k^T @ (win_k * g)                 # MXU, no scatter

where win_k[t, c] = (pooled[t, k, c] == out[t, c]) / ties[t, c] is the
winner mask the forward saves (divided by the tie count — EXACTLY
jnp.max's distribute-among-ties VJP, so the banded route is numerically
the dense route's gradient at f32, bf16 MXU granularity on hardware).
Per-k block sub-ranges (min/max of nb[:, k]) skip the window blocks a
slot never touches.

Neighbors outside the window would silently lose gradient here; the
same pool-edge neighbor lists feed the banded KPConv forward on the
same step, whose oob counter already monitors exactly these drops (0 at
calibrated bands), so this kernel stays counter-free.

Measured (round-5 bench, Vaihingen geometry): v1 (slot-outer, per-
(slot, block) slab read-modify-write) ran 3.5 ms self-time — net
+0.4 ms vs the dense route. The shipped block-outer version accumulates
all K slots in registers and writes the slab once per occupied block:
1.7 ms self-time, fused step 44.7 -> 43.3 ms (full_run/perf/
maxpool_route.jsonl).

Reference op: models/blocks.py:95-111 (max_pool), used by the
resnetb_strided shortcut and max_pool blocks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from weasal_tpu.ops.pallas.common import (
    COMPILER_PARAMS as _COMPILER_PARAMS, DEFAULT_BAND, DEFAULT_TILE,
    QUANTUM, n_win as _n_win)


def _bwd_kernel(starts_ref, nb_ref, win_ref, g_ref, dx_ref, *,
                n_support: int, mxu_dtype, n_win: int, n_tiles: int,
                k_width: int):
    t = nb_ref.shape[0]
    i = pl.program_id(0)
    start_row = starts_ref[i] * QUANTUM

    @pl.when(i % n_tiles == 0)
    def _init_dx():
        dx_ref[:] = jnp.zeros_like(dx_ref)

    nb = nb_ref[:]
    g = g_ref[:]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (t, QUANTUM), 1)
    # Invalid (shadow / out-of-slab) slots get the sentinel -1, which no
    # window column matches — folds the validity mask into the single
    # equality pass below. win already carries the tie split; fold g in
    # once per slot.
    nbm = jnp.where(nb < n_support, nb, -1)                   # [T, K]
    contribs = [(win_ref[:, k, :] * g).astype(mxu_dtype)
                for k in range(k_width)]
    # Block-outer, slot-inner: accumulate the block's dX in registers and
    # touch the per-sphere slab ONCE per block (the per-(k, j) dynamic
    # read-modify-write of the first version measured ~2x the matmul
    # cost). Per (k, occupied block): one [T, Q] equality + one bf16 cast
    # + one [T, Q] x [T, C] MXU product.
    for j in range(n_win):
        block_start = start_row + j * QUANTUM

        @pl.when(_block_needed(nb, block_start, n_support))
        def _do_block(block_start=block_start):
            acc = None
            for k in range(k_width):
                a = (nbm[:, k:k + 1] - block_start
                     == col_ids).astype(mxu_dtype)            # [T, Q]
                z = jnp.dot(a.T, contribs[k],
                            preferred_element_type=jnp.float32)
                acc = z if acc is None else acc + z
            dx_ref[pl.ds(block_start, QUANTUM), :] += acc


def _block_needed(nb, block_start, n_support):
    """Scalar: does any valid neighbor land in block [start, start+Q)?"""
    rel = nb - block_start
    return jnp.any((nb < n_support) & (rel >= 0) & (rel < QUANTUM))


def maxpool_bwd_banded(neighb_inds, win, g, ns: int,
                       band: int = 0, tile: int = DEFAULT_TILE,
                       interpret: bool = False):
    """dX [B, Ns, C] of a masked neighborhood max-pool.

    :param neighb_inds: [B, Nq, K] support indices (>= ns = shadow)
    :param win: [B, Nq, K, C] winner fractions (eq-mask / tie count)
    :param g: [B, Nq, C] upstream gradient
    """
    b, nq, k_width = neighb_inds.shape
    c = g.shape[-1]
    band = band if band > 0 else DEFAULT_BAND
    n_win = _n_win(band)
    mxu_dtype = jnp.float32 if interpret else jnp.bfloat16

    pad_q = (-nq) % tile
    n_tiles = (nq + pad_q) // tile
    ns_pad = max(n_win * QUANTUM, ((ns + QUANTUM - 1) // QUANTUM) * QUANTUM)
    n_blocks = ns_pad // QUANTUM
    # window is clamped to the support slab like kpconv's _prep
    nb = jnp.minimum(neighb_inds.astype(jnp.int32), ns)
    nb = jnp.pad(nb, ((0, 0), (0, pad_q), (0, 0)), constant_values=ns)
    big = jnp.int32(2 * ns_pad)
    masked = jnp.where(nb < ns, nb, big)
    tile_min = jnp.min(masked.reshape(b, n_tiles, -1), axis=2)
    starts = jnp.clip(tile_min // QUANTUM, 0, n_blocks - n_win)
    starts = jnp.where(tile_min >= big, 0, starts).astype(jnp.int32)

    win_p = jnp.pad(win.astype(mxu_dtype),
                    ((0, 0), (0, pad_q), (0, 0), (0, 0)))
    g_p = jnp.pad(g, ((0, 0), (0, pad_q), (0, 0)))

    nb2 = nb.reshape(b * (nq + pad_q), k_width)
    win2 = win_p.reshape(b * (nq + pad_q), k_width, c)
    g2 = g_p.reshape(b * (nq + pad_q), c)
    starts2 = starts.reshape(-1)

    kernel = functools.partial(
        _bwd_kernel, n_support=ns, mxu_dtype=mxu_dtype, n_win=n_win,
        n_tiles=n_tiles, k_width=k_width)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b * n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, k_width), lambda i, st: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, k_width, c), lambda i, st: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, c), lambda i, st: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ns_pad, c), lambda i, st: (i // n_tiles, 0),
                               memory_space=pltpu.VMEM),
    )
    dx = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b * ns_pad, c), jnp.float32),
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(starts2, nb2, win2, g2)
    return dx.reshape(b, ns_pad, c)[:, :ns].astype(g.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def max_pool_banded(x, neighb_inds, band: int = 0,
                    tile: int = DEFAULT_TILE, interpret: bool = False):
    """Neighborhood max-pool with the banded backward (value == jnp.max
    over gathered neighbors with a zero shadow row)."""
    out, _ = _fwd(x, neighb_inds)
    return out


def _fwd(x, neighb_inds):
    from weasal_tpu.ops.kpconv import gather_neighbors
    pooled = gather_neighbors(x, neighb_inds, 0.0)          # [B, Nq, K, C]
    out = jnp.max(pooled, axis=2)
    eq = (pooled == out[:, :, None, :])
    # distribute among ties exactly like jnp.max's VJP; shadow slots tie
    # at 0.0 and route their share to the pad row (dropped)
    win = eq.astype(jnp.float32) / jnp.maximum(
        jnp.sum(eq, axis=2, dtype=jnp.float32)[:, :, None, :], 1.0)
    return out, win


def _fwd_rule(x, neighb_inds, band, tile, interpret):
    out, win = _fwd(x, neighb_inds)
    return out, (win, neighb_inds, x.shape[1])


def _bwd_rule(band, tile, interpret, res, g):
    win, neighb_inds, ns = res
    dx = maxpool_bwd_banded(neighb_inds, win, g, ns, band, tile, interpret)
    return dx, None


max_pool_banded.defvjp(_fwd_rule, _bwd_rule)
