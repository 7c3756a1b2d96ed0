"""Gatherless banded rigid KPConv — Pallas TPU kernel with custom VJP.

Fourth-generation kernel. The XLA KPConv path materializes gathered
neighbor features [B, Nq, K, Cin] (273 MB bf16 at the wide MPRM level)
and its backward scatters into [B, Ns, Cin] — measured as the dominant
cost of the fused train step once the radius search is banded. Earlier
generations replaced the gather with one-hot MXU products (slower than
XLA) and then with a two-block banded influence rebuild (2-2.8x over XLA
at reference shapes) — see git history.

This generation keeps the gatherless formulation and tightens the window:
with supports spatially sorted (voxel-linear order — ops/subsample emits
it, data/level0.assemble_level0 applies it to level 0), all neighbors of
a 128-query tile live in a contiguous index span. The support window is
`n_win` 128-row blocks selected via scalar-prefetched block indices with
the start quantized at 128 rows, so the fetched window is span+256 rows —
the previous two-W-block scheme wasted ~2x (start quantized at W forces a
2W window for spans <= W+1). Per tile and per 128-row block j:

    M_j[t, q]  = sum_k (nb[t, k] == q + start_j)    # membership, K passes
    cross      = -2 (qp . s_j)[t, q]                # 3 VPU outer products
    per kernel point p (separable expansion — see _tile_geometry):
      D_p      = a_p[t] + b_p[q] + cross           # = |s_q - qp_t - kp_p|^2
      A_pj     = M_j * max(1 - sqrt(D_p)/ext, 0)    # linear influence
      y_p     += A_pj @ x_j                         # MXU, no gather
    (block j skipped exactly when no neighbor lands in it)
    out        = sum_p y_p @ W_p                    # MXU

    backward (same blocks): dX_j += A_pj^T @ (g @ W_p^T)   # no scatter
                            dW_p += y_p^T @ g

Membership comes from the *actual neighbor lists*, so the semantics are
exactly the XLA path's (including the calibrated K-truncation of crowded
neighborhoods and shadow rows >= Ns) — not a radius test. Neighbors
outside the window are dropped exactly like shadows and counted into the
per-sphere `oob` output (0 with sorted inputs and an adequate window;
see ops/pallas/radius_pallas.auto_band). The `band` parameter keeps its
half-window meaning W: the window guarantees coverage of spans <= W+1,
identical to the two-block scheme, so callers and tests are unchanged.

Per-kernel-point sub-windows (pblk_skip, round 4): the kernels are
VPU-bound on the per-(p, block) influence rebuild, and measured column
occupancy (scripts/probe_kp_occupancy.py) shows each kernel point's
ACTIVE columns (membership AND influence > 0) cover only a ~60-67%
contiguous sub-span of the occupied blocks — the offset ball of kernel
point p only intersects part of the tile's sorted support span. A cheap
XLA precompute (evaluating influence only at the real neighbor pairs —
K*P ops/row vs the kernel's Q*P) derives an exact per-(tile, p) active
block range [lo, hi), shipped as a second scalar-prefetch operand; the
kernel wraps each (p, block) influence build + matmul in
`pl.when(lo <= j < hi)`. Skipping is exact: outside the range A_p is
all-zero by construction (for 'linear', distance-inactive pairs; for
'constant'/'gaussian', membership-zero pairs — the range is then
membership-derived). A 1e-3 relative extent margin in the precompute
absorbs the separable expansion's f32 cancellation error at the
influence boundary.

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

from weasal_tpu.ops.pallas.common import (
    COMPILER_PARAMS as _COMPILER_PARAMS, DEFAULT_BAND, DEFAULT_TILE,
    QUANTUM, n_win as _n_win)


def _membership_block(nb, block_start, t):
    """[T, QUANTUM] multiplicity of each block column in the neighbor
    lists. bf16: values are small integers, exactly representable."""
    k_width = nb.shape[1]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (t, QUANTUM), 1)
    m = jnp.zeros((t, QUANTUM), jnp.bfloat16)
    for k in range(k_width):
        rel = nb[:, k:k + 1] - block_start           # [T, 1]
        m += (col_ids == rel).astype(jnp.bfloat16)
    return m


def _block_needed(nb, block_start, n_support):
    """Scalar: does any valid neighbor land in block [start, start+Q)?
    Skipping a memberless block is exact (its A would be all-zero)."""
    rel = nb - block_start
    return jnp.any((nb < n_support) & (rel >= 0) & (rel < QUANTUM))


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


def _pblk_ranges(q2, nb2, s2, starts2, kernel_points, kp_extent: float,
                 influence: str, n_support: int, ns_pad: int, n_win: int):
    """Exact per-(tile, kernel point) active block sub-range, packed.

    For every 128-query tile and kernel point p, the window blocks j
    whose columns can contribute a nonzero A_p entry form a contiguous
    range [lo_p, hi_p) (measured: scripts/probe_kp_occupancy.py — active
    blocks are contiguous in the sorted support order, p50 span 60-67% of
    the occupied blocks). Activity is evaluated only at the real neighbor
    pairs (K*P ops per row — ~3% of the in-kernel Q*P rebuild this
    gates): a pair activates p iff it is a valid (non-shadow) neighbor
    and, for 'linear' influence, lies within kp_extent of kernel point p
    (with a 1e-3 relative margin absorbing the kernel's separable-
    expansion cancellation error at the boundary). For 'constant' and
    'gaussian' the influence factor is nonzero wherever membership is,
    so the range is membership-derived (p-independent).

    Returns int32 [G, P] with lo*256 + hi; an empty range packs to
    n_win*256 + 0, which no block index satisfies.
    """
    k_width = nb2.shape[1]
    p = kernel_points.shape[0]
    b = s2.shape[0] // ns_pad
    g = starts2.shape[0]
    n_tiles = g // b
    tile_rows = nb2.shape[0] // g
    nb3 = nb2.reshape(b, n_tiles * tile_rows, k_width)
    valid = nb3 < n_support                              # [B, NQ', K]
    idx_cap = jnp.minimum(nb3, ns_pad - 1)
    if influence == "linear":
        # One flat fused row gather of support coords (3 channels only —
        # the feature gather this kernel exists to avoid is Cin-wide).
        offs = (jnp.arange(b, dtype=jnp.int32) * ns_pad)[:, None, None]
        sg = jnp.take(s2, (idx_cap + offs).reshape(-1), axis=0)
        sg = sg.reshape(b, n_tiles * tile_rows, k_width, 3)
        q3 = q2.reshape(b, n_tiles * tile_rows, 3)
        rel = sg - q3[:, :, None, :]                     # [B, NQ', K, 3]
        diffs = rel[:, :, :, None, :] - kernel_points[None, None, None]
        d2 = jnp.sum(diffs * diffs, axis=-1)             # [B, NQ', K, P]
        ext = kp_extent * (1.0 + 1e-3)
        act = valid[..., None] & (d2 < ext * ext)
    else:
        act = jnp.broadcast_to(valid[..., None], valid.shape + (p,))
    # Window-relative block of each neighbor; out-of-window neighbors
    # (dropped + counted by the kernel) clip into the range, which can
    # only widen it — conservative, never incorrect.
    relb = (idx_cap // QUANTUM).reshape(b, n_tiles, tile_rows, k_width)
    relb = relb - starts2.reshape(b, n_tiles)[:, :, None, None]
    relb = jnp.clip(relb, 0, n_win - 1)[..., None]       # [..., K, 1]
    act_r = act.reshape(b, n_tiles, tile_rows, k_width, p)
    lo = jnp.min(jnp.where(act_r, relb, n_win), axis=(2, 3))
    hi = jnp.max(jnp.where(act_r, relb + 1, 0), axis=(2, 3))
    return (lo * 256 + hi).astype(jnp.int32).reshape(g, p)


def _pblk_bounds(ranges_ref, i, kp):
    """Unpack the tile's per-p block ranges into scalar (lo, hi) lists."""
    los, his = [], []
    for p in range(kp):
        rg = ranges_ref[i, p]
        los.append(rg // 256)
        his.append(rg % 256)
    return los, his


def _tile_geometry(q, kp_ref, kp):
    """Per-tile terms of the separable distance expansion.

    The kernels are VPU-throughput-bound on the influence rebuild (the
    MXU and HBM are <2% utilized; measured conv self-time matches the
    [T, Q]-op count at ~1 vector op/cycle). The per-kernel-point dot
    rel . kp with rel = s - q is separable, so

        |s_q - qp_t - kp_p|^2 = a_p[t] + b_p[q] - 2 (qp . s)[t, q]
          a_p[t] = |qp_t|^2 + 2 qp_t.kp_p + |kp_p|^2      (col, [T, 1])
          b_p[q] = |s_q|^2  - 2 s_q.kp_p                  (row, [1, Q])

    replaces the per-p per-axis rebuild (5 [T,Q] ops) with rank-1
    row/col corrections (2 [T,Q] ops) around one cross term shared by
    all kernel points. All f32 on the VPU: exact outer products, no
    MXU bf16-granularity trap; the expansion's cancellation error is
    O(|coord|^2 * eps_f32) ~ 1e-4 m^2 at 18 m spheres, far below the
    kp_extent^2 influence scale and the hardware bf16 noise floor.

    Returns (qm2 [T, 3] = -2*qp, qa: per kernel point [T, 1] = a_p).
    """
    qx, qy, qz = q[:, 0:1], q[:, 1:2], q[:, 2:3]
    qn = qx * qx + qy * qy + qz * qz
    qa = []
    for p in range(kp):
        kx = kp_ref[p, 0]
        ky = kp_ref[p, 1]
        kz = kp_ref[p, 2]
        qa.append(qn + 2.0 * (qx * kx + qy * ky + qz * kz)
                  + (kx * kx + ky * ky + kz * kz))
    return -2.0 * q, qa


def _block_base(qm2, s_block):
    """Shared per-block terms: cross = -2 (qp . s) [T, Q] via three VPU
    outer products (f32-exact), support rows [1, Q] and |s|^2 [1, Q]."""
    srow = [s_block[:, d:d + 1].T for d in range(3)]
    sn = srow[0] * srow[0] + srow[1] * srow[1] + srow[2] * srow[2]
    cross = (qm2[:, 0:1] * srow[0] + qm2[:, 1:2] * srow[1]
             + qm2[:, 2:3] * srow[2])
    return cross, srow, sn


def _block_a_sep(cross, srow, sn, qa_p, kp_ref, p, m32, m32e,
                 kp_extent: float, influence: str):
    """Membership-weighted influence A_p for one (kernel point, block).

    Algebraically identical to the XLA path's clip(1 - sqrt(D)/ext) * m
    (ops/kpconv.py) — the 1/ext factor is folded into the membership
    matrix (``m32e = m32 / ext``, built once per block) so the linear
    branch costs one VPU [T, Q] op less per kernel point:
    m * relu(1 - sqrt(D)/ext) == (m/ext) * relu(ext - sqrt(D))."""
    if influence == "constant":
        return m32
    kx = kp_ref[p, 0]
    ky = kp_ref[p, 1]
    kz = kp_ref[p, 2]
    b_p = sn - 2.0 * (srow[0] * kx + srow[1] * ky + srow[2] * kz)
    d2p = jnp.maximum(cross + b_p + qa_p, 0.0)
    if influence == "linear":
        return m32e * jnp.maximum(kp_extent - jnp.sqrt(d2p), 0.0)
    if influence == "gaussian":
        sigma = kp_extent * 0.3
        return m32 * jnp.exp(-d2p / (2 * sigma ** 2 + 1e-9))
    raise ValueError(f"Unknown influence mode: {influence}")


def _fwd_kernel(starts_ref, ranges_ref, q_ref, nb_ref, *refs,
                kp_extent: float, influence: str, n_support: int,
                mxu_dtype, n_win: int, pblk_skip: bool):
    s_refs = refs[:n_win]
    x_refs = refs[n_win:2 * n_win]
    kp_ref, w_ref, out_ref, oob_ref, y_ref = refs[2 * n_win:]
    t = q_ref.shape[0]
    kp = w_ref.shape[0]
    i = pl.program_id(0)
    start_row = starts_ref[i] * QUANTUM

    q = q_ref[:]
    nb = nb_ref[:]
    oob_ref[:] = _oob_count(nb, start_row, n_support, n_win * QUANTUM)
    y_ref[:] = jnp.zeros_like(y_ref)
    qm2, qa = _tile_geometry(q, kp_ref, kp)
    if pblk_skip:
        los, his = _pblk_bounds(ranges_ref, i, kp)

    for j in range(n_win):
        block_start = start_row + j * QUANTUM

        @pl.when(_block_needed(nb, block_start, n_support))
        def _do_block(j=j, block_start=block_start):
            cross, srow, sn = _block_base(qm2, s_refs[j][:])
            m32 = _membership_block(nb, block_start, t).astype(jnp.float32)
            m32e = m32 * (1.0 / kp_extent)
            x_j = x_refs[j][:].astype(mxu_dtype)
            for p in range(kp):
                def _apply(p=p):
                    a = _block_a_sep(cross, srow, sn, qa[p], kp_ref, p,
                                     m32, m32e, kp_extent,
                                     influence).astype(mxu_dtype)
                    y_ref[p] += jnp.dot(a, x_j,
                                        preferred_element_type=jnp.float32)
                if pblk_skip:
                    pl.when((j >= los[p]) & (j < his[p]))(_apply)
                else:
                    _apply()

    acc = None
    for p in range(kp):
        z = jnp.dot(y_ref[p].astype(mxu_dtype), w_ref[p],
                    preferred_element_type=jnp.float32)
        acc = z if acc is None else acc + z
    out_ref[:] = acc


def _bwd_kernel(starts_ref, ranges_ref, q_ref, nb_ref, *refs,
                kp_extent: float, influence: str, n_support: int,
                mxu_dtype, n_win: int, n_tiles: int, pblk_skip: bool):
    """Fused backward: one A build per (block, kernel point) serves both
    dX (accumulated into the per-sphere slab — no scatter) and dW."""
    s_refs = refs[:n_win]
    x_refs = refs[n_win:2 * n_win]
    kp_ref, w_ref, g_ref, dx_ref, dw_ref, y_ref = refs[2 * n_win:]
    t = q_ref.shape[0]
    kp = w_ref.shape[0]
    i = pl.program_id(0)
    start_row = starts_ref[i] * QUANTUM

    @pl.when(i % n_tiles == 0)
    def _init_dx():
        dx_ref[:] = jnp.zeros_like(dx_ref)

    @pl.when(i == 0)
    def _init_dw():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    q = q_ref[:]
    nb = nb_ref[:]
    gm = g_ref[:].astype(mxu_dtype)
    y_ref[:] = jnp.zeros_like(y_ref)
    qm2, qa = _tile_geometry(q, kp_ref, kp)
    if pblk_skip:
        los, his = _pblk_bounds(ranges_ref, i, kp)

    # dr_p = g @ W_p^T is block-independent: compute once per tile
    dr = [jnp.dot(gm, w_ref[p].T, preferred_element_type=jnp.float32)
          .astype(mxu_dtype) for p in range(kp)]

    for j in range(n_win):
        block_start = start_row + j * QUANTUM

        @pl.when(_block_needed(nb, block_start, n_support))
        def _do_block(j=j, block_start=block_start):
            cross, srow, sn = _block_base(qm2, s_refs[j][:])
            m32 = _membership_block(nb, block_start, t).astype(jnp.float32)
            m32e = m32 * (1.0 / kp_extent)
            x_j = x_refs[j][:].astype(mxu_dtype)
            sl = pl.ds(block_start, QUANTUM)
            for p in range(kp):
                def _apply(p=p):
                    a = _block_a_sep(cross, srow, sn, qa[p], kp_ref, p,
                                     m32, m32e, kp_extent,
                                     influence).astype(mxu_dtype)
                    dx_ref[sl, :] += jnp.dot(
                        a.T, dr[p], preferred_element_type=jnp.float32)
                    y_ref[p] += jnp.dot(a, x_j,
                                        preferred_element_type=jnp.float32)
                if pblk_skip:
                    pl.when((j >= los[p]) & (j < his[p]))(_apply)
                else:
                    _apply()

    for p in range(kp):
        dw_ref[p] += jnp.dot(y_ref[p].T.astype(mxu_dtype), gm,
                             preferred_element_type=jnp.float32)


def _prep(q_pts, s_pts, neighb_inds, x, n_win, tile):
    """Pad to tile/QUANTUM multiples; per-tile window block starts."""
    b, nq = q_pts.shape[:2]
    ns, cin = x.shape[1:]

    pad_q = (-nq) % tile
    n_tiles = (nq + pad_q) // tile
    ns_pad = max(n_win * QUANTUM,
                 ((ns + QUANTUM - 1) // QUANTUM) * QUANTUM)
    n_blocks = ns_pad // QUANTUM

    nb = jnp.minimum(neighb_inds.astype(jnp.int32), ns)
    nb = jnp.pad(nb, ((0, 0), (0, pad_q), (0, 0)), constant_values=ns)
    q_pad = jnp.pad(q_pts, ((0, 0), (0, pad_q), (0, 0)))
    s_pad = jnp.pad(s_pts, ((0, 0), (0, ns_pad - ns), (0, 0)),
                    constant_values=1e6)
    x_pad = jnp.pad(x, ((0, 0), (0, ns_pad - ns), (0, 0)))

    big = jnp.int32(2 * ns_pad)
    masked = jnp.where(nb < ns, nb, big)                      # [B, Nq', K]
    tile_min = jnp.min(masked.reshape(b, n_tiles, -1), axis=2)
    starts = jnp.clip(tile_min // QUANTUM, 0, n_blocks - n_win)
    starts = jnp.where(tile_min >= big, 0, starts).astype(jnp.int32)

    q2 = q_pad.reshape(b * (nq + pad_q), 3)
    nb2 = nb.reshape(b * (nq + pad_q), -1)
    s2 = s_pad.reshape(b * ns_pad, 3)
    x2 = x_pad.reshape(b * ns_pad, cin)
    starts2 = starts.reshape(-1)
    return q2, nb2, s2, x2, starts2, n_tiles, ns_pad, n_blocks, pad_q


def _window_specs(tile, k_width, cin, n_win, n_tiles, n_blocks):
    """BlockSpecs for (q, nb, s_0..s_{n-1}, x_0..x_{n-1}). Index maps
    receive both scalar-prefetch refs (window starts, per-p ranges)."""
    def block_map(j):
        return lambda i, st, rg: ((i // n_tiles) * n_blocks + st[i] + j, 0)

    specs = [
        pl.BlockSpec((tile, 3), lambda i, st, rg: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, k_width), lambda i, st, rg: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    specs += [pl.BlockSpec((QUANTUM, 3), block_map(j),
                           memory_space=pltpu.VMEM) for j in range(n_win)]
    specs += [pl.BlockSpec((QUANTUM, cin), block_map(j),
                           memory_space=pltpu.VMEM) for j in range(n_win)]
    return specs


def _kp_spec(kp):
    # Kernel points ride SMEM: the kernel reads them as scalars.
    return pl.BlockSpec(memory_space=pltpu.SMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11))
def kpconv_banded_pallas(q_pts, s_pts, neighb_inds, x, kernel_points,
                         weights, kp_extent: float, influence: str,
                         band: int, tile: int, interpret: bool,
                         pblk_skip: bool):
    """Gatherless banded rigid KPConv over a dense sphere batch.

    :param q_pts: [B, Nq, 3]; s_pts: [B, Ns, 3] (spatially sorted for
        narrow windows; correct regardless when oob == 0)
    :param neighb_inds: [B, Nq, K] (>= Ns = shadow)
    :param x: [B, Ns, Cin]; kernel_points [Kp, 3]; weights [Kp, Cin, Cout]
    :param band: half-window W — neighbor spans <= W+1 are always covered
    :return: (out [B, Nq, Cout] f32, oob [B] f32 — count of neighbors
        dropped because they fell outside their tile's window; 0 means
        the result is exactly the rigid KPConv of ops.kpconv)
    """
    out, oob, _ = _fwd_impl(q_pts, s_pts, neighb_inds, x, kernel_points,
                            weights, kp_extent, influence, band, tile,
                            interpret, pblk_skip)
    return out, oob


def _fwd_impl(q_pts, s_pts, neighb_inds, x, kernel_points, weights,
              kp_extent, influence, band, tile, interpret, pblk_skip):
    b, nq = q_pts.shape[:2]
    ns, cin = x.shape[1:]
    kp, _, cout = weights.shape
    k_width = neighb_inds.shape[2]
    n_win = _n_win(band)
    kernel_points = kernel_points.astype(jnp.float32)
    mxu_dtype = jnp.float32 if interpret else jnp.bfloat16

    q2, nb2, s2, x2, starts, n_tiles, ns_pad, n_blocks, pad_q = _prep(
        q_pts, s_pts, neighb_inds, x, n_win, tile)
    if pblk_skip:
        ranges = _pblk_ranges(q2, nb2, s2, starts, kernel_points,
                              kp_extent, influence, ns, ns_pad, n_win)
    else:
        ranges = jnp.zeros((1, 1), jnp.int32)   # unread by the kernel
    # Features ride HBM->VMEM in the MXU dtype (halves block footprint)
    x2 = x2.astype(mxu_dtype)
    w3d = weights.astype(mxu_dtype)

    kernel = functools.partial(
        _fwd_kernel, kp_extent=kp_extent, influence=influence,
        n_support=ns, mxu_dtype=mxu_dtype, n_win=n_win,
        pblk_skip=pblk_skip)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b * n_tiles,),
        in_specs=_window_specs(tile, k_width, cin, n_win, n_tiles,
                               n_blocks) + [
            _kp_spec(kp),
            pl.BlockSpec((kp, cin, cout), lambda i, st, rg: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile, cout), lambda i, st, rg: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i, st, rg: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((kp, tile, cin), jnp.float32)],
    )
    sx = [s2] * n_win + [x2] * n_win
    out, oob = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b * (nq + pad_q), cout), jnp.float32),
            jax.ShapeDtypeStruct((b * (nq + pad_q), 1), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(starts, ranges, q2, nb2, *sx, kernel_points, w3d)
    out = out.reshape(b, nq + pad_q, cout)[:, :nq]
    oob = jnp.sum(oob.reshape(b, -1)[:, :nq], axis=1)
    res = (q_pts, s_pts, neighb_inds, x, kernel_points, weights)
    return out, oob, res


def _fwd_rule(q_pts, s_pts, neighb_inds, x, kernel_points, weights,
              kp_extent, influence, band, tile, interpret, pblk_skip):
    out, oob, res = _fwd_impl(q_pts, s_pts, neighb_inds, x, kernel_points,
                              weights, kp_extent, influence, band, tile,
                              interpret, pblk_skip)
    return (out, oob), res


def _bwd_rule(kp_extent, influence, band, tile, interpret, pblk_skip,
              res, g):
    g_out, _g_oob = g
    q_pts, s_pts, neighb_inds, x, kernel_points, weights = res
    b, nq = q_pts.shape[:2]
    ns, cin = x.shape[1:]
    kp, _, cout = weights.shape
    k_width = neighb_inds.shape[2]
    n_win = _n_win(band)
    mxu_dtype = jnp.float32 if interpret else jnp.bfloat16

    q2, nb2, s2, x2, starts, n_tiles, ns_pad, n_blocks, pad_q = _prep(
        q_pts, s_pts, neighb_inds, x, n_win, tile)
    if pblk_skip:
        ranges = _pblk_ranges(q2, nb2, s2, starts, kernel_points,
                              kp_extent, influence, ns, ns_pad, n_win)
    else:
        ranges = jnp.zeros((1, 1), jnp.int32)   # unread by the kernel
    x2 = x2.astype(mxu_dtype)
    g_pad = jnp.pad(g_out, ((0, 0), (0, pad_q), (0, 0)))
    g2 = g_pad.reshape(b * (nq + pad_q), cout)
    w3d = weights.astype(mxu_dtype)

    kernel = functools.partial(
        _bwd_kernel, kp_extent=kp_extent, influence=influence,
        n_support=ns, mxu_dtype=mxu_dtype, n_win=n_win, n_tiles=n_tiles,
        pblk_skip=pblk_skip)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b * n_tiles,),
        in_specs=_window_specs(tile, k_width, cin, n_win, n_tiles,
                               n_blocks) + [
            _kp_spec(kp),
            pl.BlockSpec((kp, cin, cout), lambda i, st, rg: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, cout), lambda i, st, rg: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((ns_pad, cin),
                         lambda i, st, rg: (i // n_tiles, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, cin, cout), lambda i, st, rg: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((kp, tile, cin), jnp.float32)],
    )
    sx = [s2] * n_win + [x2] * n_win
    dx, dw = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b * ns_pad, cin), jnp.float32),
            jax.ShapeDtypeStruct((kp, cin, cout), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(starts, ranges, q2, nb2, *sx, kernel_points, w3d, g2)
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
                  interpret: bool = False, pblk_skip: bool = False):
    """Convenience wrapper: clamps the band for small support clouds so
    tiny test problems stay fully covered (oob == 0 by construction).
    band <= 0 selects the default width. pblk_skip gates the exact
    per-(tile, kernel point) block-range skip (semantics-neutral; off
    reproduces the round-3 kernel for A/B)."""
    ns = x.shape[1]
    if band <= 0:
        band = DEFAULT_BAND
    # Full coverage when the window would reach the whole (padded) cloud
    band = int(min(band, ((ns + QUANTUM - 1) // QUANTUM) * QUANTUM))
    band = max(band, QUANTUM)
    return kpconv_banded_pallas(q_pts, s_pts, neighb_inds, x,
                                kernel_points, weights, float(kp_extent),
                                influence, band, tile, interpret,
                                bool(pblk_skip))
