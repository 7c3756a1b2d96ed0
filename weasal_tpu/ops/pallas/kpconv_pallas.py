"""Fused rigid KPConv as a Pallas TPU kernel with custom VJP.

Replaces the XLA gather -> influence -> aggregate -> GEMM chain
(weasal_tpu/ops/kpconv.py, the hot op) with one kernel per query tile.

Why: XLA lowers the neighbor gathers to slow row-wise dynamic slices and the
backward to scatter-adds (~100x below HBM speed on TPU). This kernel instead
materializes each neighbor slot k as a one-hot [T, Ns] matrix and uses the
MXU for both directions:

    forward:  x_k      = onehot_k @ X          (gather as matmul)
              weighted += infl_k ⊗ x_k         (VPU outer product)
              out      = weighted @ W          (one [T, Kp*Cin] GEMM)
    backward: dW  += weighted^T @ g
              dx_k  = einsum('tp,tpc->tc', infl_k, g @ W^T)
              dX   += onehot_k^T @ dx_k        (scatter as matmul)

so there are no gathers or scatters at all — every data movement is a
matmul, which is the fastest primitive on the hardware. Support features and
points stay resident in VMEM across the query-tile grid.

Semantics are identical to ops.kpconv (rigid path): shadow neighbors
(index == Ns) contribute nothing (their one-hot row is all zero and their
influence is masked), rows are arbitrary-order tolerant, influence modes
'constant' | 'linear' | 'gaussian', aggregation 'sum'.

Status (round 1): numerics verified on v5e hardware against a numpy oracle
(both this kernel and the XLA path agree to bf16 tolerance when inputs are
jit arguments). Throughput currently trails the XLA path by ~1.5-2x because
the per-slot one-hot rebuild dominates (each [T, Ns] comparison is VPU
work); the planned fix is spatially-banded support windows (voxel-sorted
points => neighbor indices of a query tile live in a narrow band, shrinking
Ns per one-hot by ~5-10x). Until then the XLA path stays the default
(config.use_pallas_kpconv=False). Backward at Cin>=256 can exceed the 16MB
scoped-VMEM budget.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TILE = 128


def _influence(d2, kp_extent: float, mode: str):
    d2 = jnp.maximum(d2, 0.0)   # matmul distance form can go tiny-negative
    if mode == "constant":
        return jnp.ones_like(d2)
    if mode == "linear":
        return jnp.clip(1.0 - jnp.sqrt(d2) / kp_extent, 0.0, None)
    if mode == "gaussian":
        sigma = kp_extent * 0.3
        return jnp.exp(-d2 / (2 * sigma ** 2 + 1e-9))
    raise ValueError(f"Unknown influence mode: {mode}")


def _fwd_kernel(q_ref, nb_ref, s_ref, x_ref, kp_ref, w_ref, out_ref,
                wacc_ref, *, kp_extent: float, influence: str,
                n_support: int, mxu_dtype, k_width: int):
    """Grid = (sphere-tile, neighbor-slot k).

    Each step gathers one neighbor slot for one query tile (one-hot MXU
    matmul), accumulates influence-weighted features into the persistent
    [Kp, T, Cin] scratch, and emits the output GEMM on the final slot.
    Scratch layout keeps all per-kernel-point work in 2-D slices (Mosaic
    cannot lower 3D<->2D shape casts over unaligned minor dims), and the
    neighbor slot lives on the grid because dynamic lane indexing must be
    128-aligned.
    """
    t = q_ref.shape[0]
    kp = kp_ref.shape[0]
    cout = out_ref.shape[1]
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _zero():
        wacc_ref[:] = jnp.zeros_like(wacc_ref)

    q = q_ref[:]                                          # [T, 3]
    kp_pts = kp_ref[:]                                    # [Kp, 3]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (t, n_support), 1)
    # Split-precision support table: the MXU runs at bf16 granularity on
    # this platform even for f32 operands, but one-hot x bf16 products are
    # exact, so coords = gather(hi) + gather(lo) recovers full f32
    # coordinate precision (influence weights need it at meter scale).
    s_hi = s_ref[:].astype(jnp.bfloat16).astype(mxu_dtype)
    s_lo = (s_ref[:] - s_hi.astype(jnp.float32)).astype(mxu_dtype)
    table = jnp.concatenate(
        [s_hi, s_lo, x_ref[:].astype(mxu_dtype)], axis=1)

    idx = nb_ref[:, 0:1]                                  # [T, 1]
    valid = (idx < n_support).astype(jnp.float32)         # [T, 1]
    onehot = (col_ids == idx).astype(mxu_dtype)

    gathered = jnp.dot(onehot, table,
                       preferred_element_type=jnp.float32)      # [T,6+Cin]
    coords = gathered[:, :3] + gathered[:, 3:6]
    xk = gathered[:, 6:]

    rel = coords - q                                      # [T, 3]
    # Explicit per-axis distances (exact VPU math; the matmul form would
    # round at bf16)
    d2 = jnp.zeros((t, kp), jnp.float32)
    for d in range(3):
        diff = rel[:, d:d + 1] - kp_pts[:, d:d + 1].T
        d2 += diff * diff
    infl = _influence(d2, kp_extent, influence) * valid

    for p in range(kp):
        wacc_ref[p] += infl[:, p:p + 1] * xk

    @pl.when(k == k_width - 1)
    def _emit():
        acc = jnp.zeros((t, cout), jnp.float32)
        for p in range(kp):
            acc += jnp.dot(wacc_ref[p].astype(mxu_dtype), w_ref[p],
                           preferred_element_type=jnp.float32)
        out_ref[:] = acc


def _bwd_kernel(q_ref, nb_ref, s_ref, x_ref, kp_ref, w_ref, g_ref,
                dx_ref, dw_ref, wacc_ref, dr_ref, *, kp_extent: float,
                influence: str, n_support: int, mxu_dtype,
                n_tiles: int, k_width: int):
    """Backward over grid (sphere-tile, neighbor-slot): dX and dW come out
    as transposed matmuls (no scatters)."""
    t = q_ref.shape[0]
    kp = kp_ref.shape[0]
    cin = x_ref.shape[1]
    i = pl.program_id(0)
    k = pl.program_id(1)

    @pl.when((i % n_tiles == 0) & (k == 0))
    def _init_dx():
        dx_ref[:] = jnp.zeros_like(dx_ref)

    @pl.when((i == 0) & (k == 0))
    def _init_dw():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    q = q_ref[:]
    kp_pts = kp_ref[:]
    g = g_ref[:]                                          # [T, Cout]

    @pl.when(k == 0)
    def _precompute():
        # dR_p = g @ W_p^T, computed once per tile into persistent scratch
        for p in range(kp):
            wacc_ref[p] = jnp.zeros_like(wacc_ref[p])
            dr_ref[p] = jnp.dot(g.astype(mxu_dtype), w_ref[p].T,
                                preferred_element_type=jnp.float32)

    col_ids = jax.lax.broadcasted_iota(jnp.int32, (t, n_support), 1)
    s_hi = s_ref[:].astype(jnp.bfloat16).astype(mxu_dtype)
    s_lo = (s_ref[:] - s_hi.astype(jnp.float32)).astype(mxu_dtype)
    table = jnp.concatenate(
        [s_hi, s_lo, x_ref[:].astype(mxu_dtype)], axis=1)

    idx = nb_ref[:, 0:1]
    valid = (idx < n_support).astype(jnp.float32)
    onehot = (col_ids == idx).astype(mxu_dtype)

    gathered = jnp.dot(onehot, table,
                       preferred_element_type=jnp.float32)
    coords = gathered[:, :3] + gathered[:, 3:6]
    xk = gathered[:, 6:]

    rel = coords - q
    d2 = jnp.zeros((t, kp), jnp.float32)
    for d in range(3):
        diff = rel[:, d:d + 1] - kp_pts[:, d:d + 1].T
        d2 += diff * diff
    infl = _influence(d2, kp_extent, influence) * valid

    dxk = jnp.zeros((t, cin), jnp.float32)
    for p in range(kp):
        # Recompute weighted features for dW
        wacc_ref[p] += infl[:, p:p + 1] * xk
        # dx_k[t, c] = sum_p infl[t, p] * (g @ W_p^T)[t, c]
        dxk += infl[:, p:p + 1] * dr_ref[p]

    dx_ref[:] += jnp.dot(onehot.T, dxk.astype(mxu_dtype),
                         preferred_element_type=jnp.float32)

    @pl.when(k == k_width - 1)
    def _emit_dw():
        for p in range(kp):
            dw_ref[p] += jnp.dot(wacc_ref[p].T.astype(mxu_dtype),
                                 g.astype(mxu_dtype),
                                 preferred_element_type=jnp.float32)


def _pad_rows(a, multiple):
    pad = (-a.shape[0]) % multiple
    if pad:
        a = jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
    return a, pad


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(6, 7, 8, 9))
def kpconv_rigid_pallas(q_pts, s_pts, neighb_inds, x, kernel_points,
                        weights, kp_extent: float, influence: str,
                        tile: int, interpret: bool):
    """Fused rigid KPConv over a dense sphere batch.

    :param q_pts: [B, Nq, 3]; s_pts: [B, Ns, 3]
    :param neighb_inds: [B, Nq, K] (Ns = shadow)
    :param x: [B, Ns, Cin]; kernel_points: [Kp, 3]; weights: [Kp,Cin,Cout]
    :return: [B, Nq, Cout] float32
    """
    out, _ = _fwd_impl(q_pts, s_pts, neighb_inds, x, kernel_points,
                       weights, kp_extent, influence, tile, interpret)
    return out


def _fwd_impl(q_pts, s_pts, neighb_inds, x, kernel_points, weights,
              kp_extent, influence, tile, interpret):
    b, nq = q_pts.shape[:2]
    ns, cin = x.shape[1:]
    kp, _, cout = weights.shape
    kernel_points = kernel_points.astype(jnp.float32)
    mxu_dtype = jnp.float32 if interpret else jnp.bfloat16

    # Shadow-safe neighbor clamp: anything >= Ns acts as shadow
    nb = jnp.minimum(neighb_inds.astype(jnp.int32), ns)

    pad = (-nq) % tile
    q_pad = jnp.pad(q_pts, ((0, 0), (0, pad), (0, 0)))
    nb_pad = jnp.pad(nb, ((0, 0), (0, pad), (0, 0)),
                     constant_values=ns)
    n_tiles = (nq + pad) // tile

    w3d = weights.astype(mxu_dtype)

    # Flat 2-D layout: spheres stacked on the row axis; the grid is
    # (B * n_tiles, K) and support blocks select their sphere's slab via
    # the index map (Pallas squeezed-batch BlockSpecs mis-lower on this
    # platform, so everything stays 2-D). Neighbors go k-major with a
    # single lane so each grid step loads exactly one slot column.
    q2 = q_pad.reshape(b * (nq + pad), 3)
    nbt = jnp.transpose(nb_pad, (2, 0, 1)).reshape(-1, 1)
    s2 = s_pts.reshape(b * ns, 3)
    x2 = x.reshape(b * ns, cin)
    row_blocks = b * n_tiles

    k_width = nb_pad.shape[2]
    kernel = functools.partial(
        _fwd_kernel, kp_extent=kp_extent, influence=influence,
        n_support=ns, mxu_dtype=mxu_dtype, k_width=k_width)
    out = pl.pallas_call(
        kernel,
        grid=(b * n_tiles, k_width),
        in_specs=[
            pl.BlockSpec((tile, 3), lambda i, k: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1),
                         lambda i, k, rb=row_blocks: (k * rb + i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ns, 3), lambda i, k: (i // n_tiles, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ns, cin), lambda i, k: (i // n_tiles, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, 3), lambda i, k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, cin, cout), lambda i, k: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, cout), lambda i, k: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * (nq + pad), cout),
                                       jnp.float32),
        scratch_shapes=[pltpu.VMEM((kp, tile, cin), jnp.float32)],
        interpret=interpret,
    )(q2, nbt, s2, x2, kernel_points, w3d)
    out = out.reshape(b, nq + pad, cout)
    return out[:, :nq], (q_pad, nb_pad, s_pts, x, kernel_points, weights,
                         nq)


def _fwd_rule(q_pts, s_pts, neighb_inds, x, kernel_points, weights,
              kp_extent, influence, tile, interpret):
    out, res = _fwd_impl(q_pts, s_pts, neighb_inds, x, kernel_points,
                         weights, kp_extent, influence, tile, interpret)
    return out, res


def _bwd_rule(kp_extent, influence, tile, interpret, res, g):
    q_pad, nb_pad, s_pts, x, kernel_points, weights, nq = res
    b = q_pad.shape[0]
    ns, cin = x.shape[1:]
    kp, _, cout = weights.shape
    mxu_dtype = jnp.float32 if interpret else jnp.bfloat16

    pad = q_pad.shape[1] - nq
    g_pad = jnp.pad(g, ((0, 0), (0, pad), (0, 0)))
    n_tiles = q_pad.shape[1] // tile
    w3d = weights.astype(mxu_dtype)

    q2 = q_pad.reshape(-1, 3)
    nbt = jnp.transpose(nb_pad, (2, 0, 1)).reshape(-1, 1)
    s2 = s_pts.reshape(b * ns, 3)
    x2 = x.reshape(b * ns, cin)
    g2 = g_pad.reshape(-1, cout)
    row_blocks = b * n_tiles

    k_width = nb_pad.shape[2]
    kernel = functools.partial(
        _bwd_kernel, kp_extent=kp_extent, influence=influence,
        n_support=ns, mxu_dtype=mxu_dtype, n_tiles=n_tiles,
        k_width=k_width)
    dx, dw = pl.pallas_call(
        kernel,
        grid=(b * n_tiles, k_width),
        in_specs=[
            pl.BlockSpec((tile, 3), lambda i, k: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1),
                         lambda i, k, rb=row_blocks: (k * rb + i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ns, 3), lambda i, k: (i // n_tiles, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ns, cin), lambda i, k: (i // n_tiles, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, 3), lambda i, k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, cin, cout), lambda i, k: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, cout), lambda i, k: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((ns, cin), lambda i, k: (i // n_tiles, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, cin, cout), lambda i, k: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * ns, cin), jnp.float32),
            jax.ShapeDtypeStruct((kp, cin, cout), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((kp, tile, cin), jnp.float32),
                        pltpu.VMEM((kp, tile, cin), jnp.float32)],
        interpret=interpret,
    )(q2, nbt, s2, x2, kernel_points, w3d, g2)
    dx = dx.reshape(b, ns, cin)

    dweights = dw
    zeros_q = jnp.zeros((b, nq, 3), jnp.float32)
    zeros_s = jnp.zeros_like(s_pts)
    # Integer input: symbolic-zero cotangent (float0)
    import numpy as np
    zeros_nb = np.zeros((b, nq, nb_pad.shape[2]), dtype=jax.dtypes.float0)
    zeros_kp = jnp.zeros_like(kernel_points)
    return zeros_q, zeros_s, zeros_nb, dx, zeros_kp, dweights


kpconv_rigid_pallas.defvjp(_fwd_rule, _bwd_rule)


def kpconv_batched_pallas(q_pts, s_pts, neighb_inds, x, kernel_points,
                          weights, kp_extent: float,
                          influence: str = "linear",
                          tile: int = DEFAULT_TILE,
                          interpret: bool = False):
    """Batched fused KPConv: the sphere axis is a grid dimension (the
    kernel's accumulation logic depends on grid positions, so the batch is
    folded into the grid rather than vmapped)."""
    return kpconv_rigid_pallas(q_pts, s_pts, neighb_inds, x, kernel_points,
                               weights, float(kp_extent), influence, tile,
                               interpret)
