"""Gatherless banded rigid KPConv — Pallas TPU kernel with custom VJP.

Third-generation kernel. The XLA KPConv path materializes gathered
neighbor features [B, Nq, K, Cin] (273 MB bf16 at the wide MPRM level)
and its backward scatters into [B, Ns, Cin] — measured as the dominant
cost of the fused train step once the radius search is banded (gathers
~12 ms + scatters ~27 ms of a 94 ms step at reference geometry). The
second-generation kernel (git history) replaced the gather with per-slot
one-hot MXU products but still paid one [T, 2W] matmul per neighbor slot
(K of them) — slower than XLA's native gathers at real shapes.

This kernel never gathers. With supports spatially sorted (voxel-linear
order — ops/subsample emits it, data/level0.assemble_level0 applies it
to level 0), all neighbors of a 128-query tile live in a two-block
window of the support table selected via scalar-prefetched block
indices. Per tile it rebuilds the *banded influence matrix* directly
from geometry and turns the whole conv into banded MXU matmuls:

    M[t, j]   = sum_k (nb[t, k] == j + start)      # membership, K passes
    rel_d     = s_band[d] - q[t, d]                # [T, 2W] per axis, VPU
    d2        = sum_d rel_d^2
    per kernel point p:
      d2p     = d2 - 2 sum_d rel_d * kp[p, d] + |kp_p|^2
      A_p     = influence(d2p) * M                 # [T, 2W]
      out    += (A_p @ x_band) @ W_p               # MXU, no gather

    backward: dX_band += A_p^T @ (g @ W_p^T)       # MXU, no scatter
              dW_p    += (A_p @ x_band)^T @ g

Membership comes from the *actual neighbor lists*, so the semantics are
exactly the XLA path's (including the calibrated K-truncation of
crowded neighborhoods and shadow rows >= Ns) — not a radius test.
Neighbors outside the window are dropped exactly like shadows and
counted into the per-sphere `oob` output (0 with sorted inputs and an
adequate band; see ops/pallas/radius_pallas.auto_band).

The band is processed one W-row half at a time (never concatenated), so
peak VMEM stays within budget even at the widest shipped shapes
(Cin 512, W 1536). The backward runs as two kernels (dX without x,
dW without W) for the same reason.

Precision: membership, geometry, influence and all accumulation are
f32; matmul INPUTS are bf16 on hardware. This matches the XLA conv
path under either compute_dtype setting — the platform compiles with
--xla_allow_excess_precision, which executes default-precision f32
matmuls at bf16 granularity anyway (measured: XLA-vs-Pallas logits
agree to ~5e-3, the platform's bf16 matmul noise floor).

Reference op chain: models/blocks.py:238-374 (rigid sum aggregation).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TILE = 128
DEFAULT_BAND = 512

# v5e has 128 MB of VMEM; the default 16 MB *scoped* limit rejects the
# double-buffered output slabs of the widest convs. Raise it (leaving
# headroom for Mosaic's own scratch).
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _membership_half(nb, half_start, band, t):
    """[T, band] multiplicity of each half-window column in the neighbor
    lists (built per half to halve peak VMEM; same total VPU work).
    bf16 storage: values are small integers, exactly representable."""
    k_width = nb.shape[1]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (t, band), 1)
    m = jnp.zeros((t, band), jnp.bfloat16)
    for k in range(k_width):
        rel = nb[:, k:k + 1] - half_start            # [T, 1]
        m += (col_ids == rel).astype(jnp.bfloat16)
    return m


def _hi_half_needed(nb, start_row, n_support, band):
    """Scalar: does any valid neighbor of this tile fall in the upper
    band half [start+W, start+2W)? (Out-of-band rows don't matter — they
    are dropped either way and counted by _oob_count.)"""
    valid_max = jnp.max(jnp.where(nb < n_support, nb, -1))
    return valid_max - start_row >= band


def _oob_count(nb, start_row, n_support, width):
    """[T, 1] count of valid neighbors outside the window (scalar-cheap:
    no [T, width] tensors involved)."""
    k_width = nb.shape[1]
    oob = jnp.zeros((nb.shape[0], 1), jnp.float32)
    for k in range(k_width):
        idx = nb[:, k:k + 1]
        rel = idx - start_row
        oob += ((idx < n_support)
                & ((rel < 0) | (rel >= width))).astype(jnp.float32)
    return oob


def _influence_from_d2(d2p, kp_extent: float, mode: str):
    if mode == "constant":
        return jnp.ones_like(d2p)
    if mode == "linear":
        return jnp.clip(1.0 - jnp.sqrt(jnp.maximum(d2p, 0.0)) / kp_extent,
                        0.0, None)
    if mode == "gaussian":
        sigma = kp_extent * 0.3
        return jnp.exp(-jnp.maximum(d2p, 0.0) / (2 * sigma ** 2 + 1e-9))
    raise ValueError(f"Unknown influence mode: {mode}")


def _half_geometry(q, s_half, keep_rel=True):
    """rel_d [T, W] per axis (optional) and d2 [T, W] for one band half
    (VPU f32). keep_rel=False trades VPU recompute for ~2.4 MB of VMEM
    at the widest shapes."""
    if keep_rel:
        rel = [s_half[:, d:d + 1].T - q[:, d:d + 1] for d in range(3)]
        d2 = rel[0] * rel[0] + rel[1] * rel[1] + rel[2] * rel[2]
        return rel, d2
    d2 = None
    for d in range(3):
        tmp = s_half[:, d:d + 1].T - q[:, d:d + 1]
        d2 = tmp * tmp if d2 is None else d2 + tmp * tmp
    return None, d2


def _banded_a(rel, d2, m_half, kp_ref, p, kp_extent, influence,
              q=None, s_half=None):
    """Influence matrix A_p for one (kernel point, band half). With
    rel=None the per-axis differences are recomputed from (q, s_half)."""
    kx = kp_ref[p, 0]
    ky = kp_ref[p, 1]
    kz = kp_ref[p, 2]
    if rel is not None:
        c = rel[0] * kx + rel[1] * ky + rel[2] * kz
    else:
        c = ((s_half[:, 0:1].T - q[:, 0:1]) * kx
             + (s_half[:, 1:2].T - q[:, 1:2]) * ky
             + (s_half[:, 2:3].T - q[:, 2:3]) * kz)
    d2p = d2 - 2.0 * c + (kx * kx + ky * ky + kz * kz)
    return _influence_from_d2(d2p, kp_extent, influence) * m_half


def _fwd_kernel(starts_ref, q_ref, nb_ref, s_lo_ref, s_hi_ref,
                x_lo_ref, x_hi_ref, kp_ref, w_ref, out_ref, oob_ref,
                *, kp_extent: float, influence: str, n_support: int,
                mxu_dtype, band: int):
    t = q_ref.shape[0]
    kp = w_ref.shape[0]
    cout = out_ref.shape[1]
    i = pl.program_id(0)
    start_row = starts_ref[i] * band

    q = q_ref[:]
    nb = nb_ref[:]
    oob_ref[:] = _oob_count(nb, start_row, n_support, 2 * band)

    def half_contrib(s_ref, x_ref, half_start):
        rel, d2 = _half_geometry(q, s_ref[:])
        m_half = _membership_half(nb, half_start, band, t)
        x_half = x_ref[:].astype(mxu_dtype)
        acc = jnp.zeros((t, cout), jnp.float32)
        for p in range(kp):
            a = _banded_a(rel, d2, m_half, kp_ref, p, kp_extent,
                          influence).astype(mxu_dtype)
            y = jnp.dot(a, x_half, preferred_element_type=jnp.float32)
            acc += jnp.dot(y.astype(mxu_dtype), w_ref[p],
                           preferred_element_type=jnp.float32)
        return acc

    out_ref[:] = half_contrib(s_lo_ref, x_lo_ref, start_row)

    # Second half only when some neighbor actually lands there: a skipped
    # half's membership would be all-zero, so skipping is exact. With
    # auto-sized bands most spans fit one W block, halving the work.
    @pl.when(_hi_half_needed(nb, start_row, n_support, band))
    def _hi():
        out_ref[:] += half_contrib(s_hi_ref, x_hi_ref, start_row + band)


def _bwd_kernel(starts_ref, q_ref, nb_ref, s_lo_ref, s_hi_ref,
                x_lo_ref, x_hi_ref, kp_ref, w_ref, g_ref,
                dx_ref, dw_ref,
                *, kp_extent: float, influence: str, n_support: int,
                mxu_dtype, band: int, n_tiles: int):
    """Fused backward: one A_p build serves both dX and dW.

    Resident state (dX slab + full dW + feature bands) exceeds the
    default 16 MB scoped-VMEM limit at the widest shapes; the raised
    `_COMPILER_PARAMS` limit (v5e has 128 MB) makes the single-pass
    layout — which halves the geometry/membership recompute versus
    separate dX and dW kernels — the cheaper choice.
    """
    t = q_ref.shape[0]
    kp = w_ref.shape[0]
    i = pl.program_id(0)
    start_row = starts_ref[i] * band

    @pl.when(i % n_tiles == 0)
    def _init_dx():
        dx_ref[:] = jnp.zeros_like(dx_ref)

    @pl.when(i == 0)
    def _init_dw():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    q = q_ref[:]
    g = g_ref[:]
    gm = g.astype(mxu_dtype)
    nb = nb_ref[:]

    def half_grads(s_ref, x_ref, half_start):
        rel, d2 = _half_geometry(q, s_ref[:])
        m_half = _membership_half(nb, half_start, band, t)
        x_half = x_ref[:].astype(mxu_dtype)
        sl = pl.ds(half_start, band)
        for p in range(kp):
            a = _banded_a(rel, d2, m_half, kp_ref, p, kp_extent,
                          influence).astype(mxu_dtype)
            dr = jnp.dot(gm, w_ref[p].T,
                         preferred_element_type=jnp.float32)   # [T, Cin]
            dx_ref[sl, :] += jnp.dot(a.T, dr.astype(mxu_dtype),
                                     preferred_element_type=jnp.float32)
            y = jnp.dot(a, x_half, preferred_element_type=jnp.float32)
            dw_ref[p] += jnp.dot(y.T.astype(mxu_dtype), gm,
                                 preferred_element_type=jnp.float32)

    half_grads(s_lo_ref, x_lo_ref, start_row)

    @pl.when(_hi_half_needed(nb, start_row, n_support, band))
    def _hi():
        half_grads(s_hi_ref, x_hi_ref, start_row + band)


def _prep(q_pts, s_pts, neighb_inds, x, band, tile):
    """Pad to tile/band multiples; per-tile band-block starts."""
    b, nq = q_pts.shape[:2]
    ns, cin = x.shape[1:]

    pad_q = (-nq) % tile
    n_tiles = (nq + pad_q) // tile
    ns_pad = max(2 * band, ((ns + band - 1) // band) * band)
    n_blocks = ns_pad // band

    nb = jnp.minimum(neighb_inds.astype(jnp.int32), ns)
    nb = jnp.pad(nb, ((0, 0), (0, pad_q), (0, 0)), constant_values=ns)
    q_pad = jnp.pad(q_pts, ((0, 0), (0, pad_q), (0, 0)))
    s_pad = jnp.pad(s_pts, ((0, 0), (0, ns_pad - ns), (0, 0)),
                    constant_values=1e6)
    x_pad = jnp.pad(x, ((0, 0), (0, ns_pad - ns), (0, 0)))

    big = jnp.int32(2 * ns_pad)
    masked = jnp.where(nb < ns, nb, big)                      # [B, Nq', K]
    tile_min = jnp.min(masked.reshape(b, n_tiles, -1), axis=2)
    starts = jnp.clip(tile_min // band, 0, n_blocks - 2)
    starts = jnp.where(tile_min >= big, 0, starts).astype(jnp.int32)

    q2 = q_pad.reshape(b * (nq + pad_q), 3)
    nb2 = nb.reshape(b * (nq + pad_q), -1)
    s2 = s_pad.reshape(b * ns_pad, 3)
    x2 = x_pad.reshape(b * ns_pad, cin)
    starts2 = starts.reshape(-1)
    return q2, nb2, s2, x2, starts2, n_tiles, ns_pad, n_blocks, pad_q


def _geom_specs(tile, k_width, band, n_tiles, n_blocks):
    """BlockSpecs for (q, nb, s_lo, s_hi): shared by all three kernels."""
    def band_lo(i, st):
        return ((i // n_tiles) * n_blocks + st[i], 0)

    def band_hi(i, st):
        return ((i // n_tiles) * n_blocks + st[i] + 1, 0)

    return [
        pl.BlockSpec((tile, 3), lambda i, st: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, k_width), lambda i, st: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((band, 3), band_lo, memory_space=pltpu.VMEM),
        pl.BlockSpec((band, 3), band_hi, memory_space=pltpu.VMEM),
    ], band_lo, band_hi


def _kp_spec(kp):
    # Kernel points ride SMEM: the kernel reads them as scalars.
    return pl.BlockSpec(memory_space=pltpu.SMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10))
def kpconv_banded_pallas(q_pts, s_pts, neighb_inds, x, kernel_points,
                         weights, kp_extent: float, influence: str,
                         band: int, tile: int, interpret: bool):
    """Gatherless banded rigid KPConv over a dense sphere batch.

    :param q_pts: [B, Nq, 3]; s_pts: [B, Ns, 3] (spatially sorted for
        narrow bands; correct regardless when oob == 0)
    :param neighb_inds: [B, Nq, K] (>= Ns = shadow)
    :param x: [B, Ns, Cin]; kernel_points [Kp, 3]; weights [Kp, Cin, Cout]
    :return: (out [B, Nq, Cout] f32, oob [B] f32 — count of neighbors
        dropped because they fell outside their tile's band; 0 means the
        result is exactly the rigid KPConv of ops.kpconv)
    """
    out, oob, _ = _fwd_impl(q_pts, s_pts, neighb_inds, x, kernel_points,
                            weights, kp_extent, influence, band, tile,
                            interpret)
    return out, oob


def _fwd_impl(q_pts, s_pts, neighb_inds, x, kernel_points, weights,
              kp_extent, influence, band, tile, interpret):
    b, nq = q_pts.shape[:2]
    ns, cin = x.shape[1:]
    kp, _, cout = weights.shape
    k_width = neighb_inds.shape[2]
    kernel_points = kernel_points.astype(jnp.float32)
    mxu_dtype = jnp.float32 if interpret else jnp.bfloat16

    q2, nb2, s2, x2, starts, n_tiles, ns_pad, n_blocks, pad_q = _prep(
        q_pts, s_pts, neighb_inds, x, band, tile)
    # Features ride HBM->VMEM in the MXU dtype: halves the band blocks'
    # footprint (the widest shapes otherwise exceed the 16 MB budget)
    x2 = x2.astype(mxu_dtype)
    w3d = weights.astype(mxu_dtype)

    geom, band_lo, band_hi = _geom_specs(tile, k_width, band, n_tiles,
                                         n_blocks)
    kernel = functools.partial(
        _fwd_kernel, kp_extent=kp_extent, influence=influence,
        n_support=ns, mxu_dtype=mxu_dtype, band=band)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b * n_tiles,),
        in_specs=geom + [
            pl.BlockSpec((band, cin), band_lo, memory_space=pltpu.VMEM),
            pl.BlockSpec((band, cin), band_hi, memory_space=pltpu.VMEM),
            _kp_spec(kp),
            pl.BlockSpec((kp, cin, cout), lambda i, st: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile, cout), lambda i, st: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i, st: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    out, oob = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b * (nq + pad_q), cout), jnp.float32),
            jax.ShapeDtypeStruct((b * (nq + pad_q), 1), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(starts, q2, nb2, s2, s2, x2, x2, kernel_points, w3d)
    out = out.reshape(b, nq + pad_q, cout)[:, :nq]
    oob = jnp.sum(oob.reshape(b, -1)[:, :nq], axis=1)
    res = (q_pts, s_pts, neighb_inds, x, kernel_points, weights)
    return out, oob, res


def _fwd_rule(q_pts, s_pts, neighb_inds, x, kernel_points, weights,
              kp_extent, influence, band, tile, interpret):
    out, oob, res = _fwd_impl(q_pts, s_pts, neighb_inds, x, kernel_points,
                              weights, kp_extent, influence, band, tile,
                              interpret)
    return (out, oob), res


def _bwd_rule(kp_extent, influence, band, tile, interpret, res, g):
    g_out, _g_oob = g
    q_pts, s_pts, neighb_inds, x, kernel_points, weights = res
    b, nq = q_pts.shape[:2]
    ns, cin = x.shape[1:]
    kp, _, cout = weights.shape
    k_width = neighb_inds.shape[2]
    mxu_dtype = jnp.float32 if interpret else jnp.bfloat16

    q2, nb2, s2, x2, starts, n_tiles, ns_pad, n_blocks, pad_q = _prep(
        q_pts, s_pts, neighb_inds, x, band, tile)
    x2 = x2.astype(mxu_dtype)
    g_pad = jnp.pad(g_out, ((0, 0), (0, pad_q), (0, 0)))
    g2 = g_pad.reshape(b * (nq + pad_q), cout)
    w3d = weights.astype(mxu_dtype)

    geom, band_lo, band_hi = _geom_specs(tile, k_width, band, n_tiles,
                                         n_blocks)
    g_spec = pl.BlockSpec((tile, cout), lambda i, st: (i, 0),
                          memory_space=pltpu.VMEM)

    bwd_kernel = functools.partial(
        _bwd_kernel, kp_extent=kp_extent, influence=influence,
        n_support=ns, mxu_dtype=mxu_dtype, band=band, n_tiles=n_tiles)
    dx, dw = pl.pallas_call(
        bwd_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b * n_tiles,),
            in_specs=geom + [
                pl.BlockSpec((band, cin), band_lo,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((band, cin), band_hi,
                             memory_space=pltpu.VMEM),
                _kp_spec(kp),
                pl.BlockSpec((kp, cin, cout), lambda i, st: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                g_spec,
            ],
            out_specs=[
                pl.BlockSpec((ns_pad, cin),
                             lambda i, st: (i // n_tiles, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((kp, cin, cout), lambda i, st: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b * ns_pad, cin), jnp.float32),
            jax.ShapeDtypeStruct((kp, cin, cout), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(starts, q2, nb2, s2, s2, x2, x2, kernel_points, w3d, g2)
    dx = dx.reshape(b, ns_pad, cin)[:, :ns]

    zeros_q = jnp.zeros_like(q_pts)
    zeros_s = jnp.zeros_like(s_pts)
    zeros_nb = np.zeros(neighb_inds.shape, dtype=jax.dtypes.float0)
    zeros_kp = jnp.zeros_like(kernel_points)
    return zeros_q, zeros_s, zeros_nb, dx, zeros_kp, dw


kpconv_banded_pallas.defvjp(_fwd_rule, _bwd_rule)


def kpconv_banded(q_pts, s_pts, neighb_inds, x, kernel_points, weights,
                  kp_extent: float, influence: str = "linear",
                  band: int = DEFAULT_BAND, tile: int = DEFAULT_TILE,
                  interpret: bool = False):
    """Convenience wrapper: clamps the band for small support clouds so
    tiny test problems stay fully covered (oob == 0 by construction).
    band <= 0 selects the default width."""
    ns = x.shape[1]
    half = ((ns + 255) // 256) * 128          # ceil(ns/2) to 128 multiple
    if band <= 0:
        band = DEFAULT_BAND
    band = int(min(band, max(128, half)))
    return kpconv_banded_pallas(q_pts, s_pts, neighb_inds, x,
                                kernel_points, weights, float(kp_extent),
                                influence, band, tile, interpret)
