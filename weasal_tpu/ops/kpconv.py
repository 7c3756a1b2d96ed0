"""KPConv: kernel point convolution as fused batched einsums.

The hot op of the framework. Reference math (models/blocks.py:238-374):
for each query point, gather its neighbors, compute their offsets to K kernel
points, turn distances into influence weights (constant / linear / gaussian),
aggregate neighbor features per kernel point, then contract with the
[K, Cin, Cout] weight tensor.

TPU mapping: the whole chain is three dense contractions over static shapes —

    d2      = |neighbors - kernel_points|^2            # [B,Nq,K,Kp] (VPU)
    infl    = influence(d2)                            # [B,Nq,Kp,K] (VPU)
    agg     = einsum('bqpk,bqkc->bqpc', infl, nx)      # MXU
    out     = reshape(agg) @ reshape(W)                # [B*Nq, Kp*Cin] @
                                                       # [Kp*Cin, Cout] (MXU)

The final matmul is a single large GEMM, which is where almost all FLOPs go;
folding the Kp axis into the contraction dimension keeps the MXU busy with a
(Kp*Cin)-deep contraction instead of Kp small ones.

Shadow semantics: supports gain an appended far-away row (index Ns) and
features a zero row, so shadow neighbors contribute zero — identical to the
reference. Deformable kernels additionally mask neighbors outside every
deformed kernel point's extent (reference's topk re-pruning is a memory
optimization only; with static shapes masking is free).

The gatherless banded Pallas kernel (weasal_tpu.ops.pallas.kpconv_banded)
handles rigid sum-aggregation convs on TPU; this module is the XLA
reference path (deformable / closest-aggregation / CPU) and the source of
truth for semantics.
"""

from __future__ import annotations

import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

SHADOW_COORD = 1e6


class KPConvParams(NamedTuple):
    """Static hyper-parameters of one KPConv op."""
    kp_extent: float
    influence: str = "linear"        # 'constant' | 'linear' | 'gaussian'
    aggregation: str = "sum"         # 'sum' | 'closest'
    deformable: bool = False
    modulated: bool = False
    compute_dtype: str = "float32"   # 'float32' | 'bfloat16' (MXU inputs)
    use_pallas: bool = False         # fused Pallas kernel (rigid sum only)
    pallas_interpret: bool = False   # interpreter mode (CPU testing)
    pallas_band: int = 0             # banded kernel half-window W (0=auto)
    pallas_pblk_skip: bool = False   # exact per-kernel-point block skip
                                     # (opt-in: measured 1.6x SLOWER at
                                     # bench shapes, scripts/ab_pblk_skip.py)
    radius: float = 0.0              # conv radius (m) for auto banding
    in_radius: float = 0.0           # sphere radius (m) for auto banding
    sort_margin: float = 0.0         # spatial-sort slack (level voxel, m)


def pallas_eligible(params: "KPConvParams", cin: int, cout: int) -> bool:
    """Whether the gatherless banded Pallas kernel handles this op.

    Rigid sum-aggregation convs up to the widest shipped shapes
    (Cin/Cout 512; VMEM-sized two-pass backward). Deformable and
    closest-aggregation convs stay on the XLA path.
    """
    return (params.use_pallas and not params.deformable
            and params.aggregation == "sum"
            and cin <= 512 and cout <= 512)


def _pallas_band(params: "KPConvParams", nq: int, ns: int) -> int:
    """Resolve the band half-window: explicit config wins, else sized
    from the conv geometry (see radius_pallas.auto_band), else default."""
    if params.pallas_band > 0:
        return params.pallas_band
    if params.radius > 0 and params.in_radius > 0:
        from weasal_tpu.ops.pallas.radius_pallas import auto_band
        # sort_margin = the support level's voxel size (only support-side
        # key disorder matters). Level 0 is sorted at extent/256
        # (~2.2*in_radius/256), which can exceed dl0 for deep configs.
        margin = max(params.sort_margin, 2.5 * params.in_radius / 256.0)
        return auto_band(params.radius, margin, nq, ns, params.in_radius)
    return 0


def gather_neighbors(values: jnp.ndarray,
                     inds: jnp.ndarray,
                     pad_value: float) -> jnp.ndarray:
    """Gather [B, Ns, D] rows by [B, Nq, K] sphere-local indices.

    Index Ns (the shadow) selects an appended constant `pad_value` row.

    Implemented as ONE flat row gather with per-sphere index offsets: the
    batched take_along_axis form lowers to a per-sphere dynamic-slice
    loop on TPU (measured ms-scale per op at reference geometry), while
    the flat gather lowers to a single fused gather.
    """
    b, ns, d = values.shape
    pad_row = jnp.full((b, 1, d), pad_value, dtype=values.dtype)
    padded = jnp.concatenate([values, pad_row], axis=1)     # [B, Ns+1, D]
    flat = padded.reshape(b * (ns + 1), d)
    offs = (jnp.arange(b, dtype=jnp.int32) * (ns + 1))[:, None, None]
    idx = inds.astype(jnp.int32) + offs                     # [B, Nq, K]
    out = jnp.take(flat, idx.reshape(-1), axis=0)
    return out.reshape(b, inds.shape[1], inds.shape[2], d)


def influence_weights(sq_distances: jnp.ndarray,
                      kp_extent: float,
                      influence: str) -> jnp.ndarray:
    """Per-(neighbor, kernel point) influence from squared distances.

    [B, Nq, K, Kp] -> [B, Nq, Kp, K] (transposed for the aggregation matmul).
    """
    if influence == "constant":
        w = jnp.ones_like(sq_distances)
    elif influence == "linear":
        w = jnp.clip(1.0 - jnp.sqrt(sq_distances) / kp_extent, min=0.0)
    elif influence == "gaussian":
        sigma = kp_extent * 0.3
        w = jnp.exp(-sq_distances / (2 * sigma ** 2 + 1e-9))
    else:
        raise ValueError(f"Unknown KP influence: {influence}")
    return jnp.swapaxes(w, -1, -2)


def kpconv(q_pts: jnp.ndarray,
           s_pts: jnp.ndarray,
           neighb_inds: jnp.ndarray,
           x: jnp.ndarray,
           kernel_points: jnp.ndarray,
           weights: jnp.ndarray,
           params: KPConvParams,
           offsets: Optional[jnp.ndarray] = None,
           modulations: Optional[jnp.ndarray] = None,
           return_oob: bool = False,
           ):
    """Rigid or deformable KPConv over a dense sphere batch.

    :param q_pts: [B, Nq, 3] query points
    :param s_pts: [B, Ns, 3] support points
    :param neighb_inds: [B, Nq, K] sphere-local support indices (Ns = shadow)
    :param x: [B, Ns, Cin] support features
    :param kernel_points: [Kp, 3]
    :param weights: [Kp, Cin, Cout]
    :param offsets: [B, Nq, Kp, 3] deformable kernel offsets (if deformable)
    :param modulations: [B, Nq, Kp] in (0, 2) (if modulated)
    :param return_oob: also return the banded kernel's out-of-band
        neighbor count [B] (0.0 when the XLA path ran)
    :return: (out [B, Nq, Cout], min_sq_dist [B, Nq, Kp] or None[, oob])
        min_sq_dist feeds the deformable fitting regularizer.
    """
    kp = kernel_points.shape[0]

    if pallas_eligible(params, x.shape[-1], weights.shape[-1]):
        from weasal_tpu.ops.pallas.kpconv_banded import kpconv_banded
        out, oob = kpconv_banded(
            q_pts, s_pts, neighb_inds, x, kernel_points, weights,
            kp_extent=params.kp_extent, influence=params.influence,
            band=_pallas_band(params, q_pts.shape[1], x.shape[1]),
            interpret=params.pallas_interpret,
            pblk_skip=params.pallas_pblk_skip)
        if return_oob:
            return out, None, oob
        return out, None

    # Neighbor coordinates relative to their query ([B, Nq, K, 3]);
    # shadow index selects the far-away row -> huge distances -> zero weight.
    neighbors = gather_neighbors(s_pts, neighb_inds, SHADOW_COORD)
    neighbors = neighbors - q_pts[:, :, None, :]

    if params.deformable:
        if offsets is None:
            raise ValueError("deformable KPConv requires offsets")
        deformed = kernel_points[None, None] + offsets      # [B, Nq, Kp, 3]
        diffs = neighbors[:, :, :, None, :] - deformed[:, :, None, :, :]
    else:
        diffs = neighbors[:, :, :, None, :] - kernel_points[None, None, None]
    sq_distances = jnp.sum(diffs * diffs, axis=-1)          # [B, Nq, K, Kp]

    min_sq = None
    if params.deformable:
        min_sq = jnp.min(sq_distances, axis=2)              # [B, Nq, Kp]

    all_weights = influence_weights(
        sq_distances, params.kp_extent, params.influence)   # [B, Nq, Kp, K]

    if params.aggregation == "closest":
        closest = jnp.argmin(sq_distances, axis=-1)         # [B, Nq, K]
        onehot = jax.nn.one_hot(closest, kp, dtype=all_weights.dtype)
        all_weights = all_weights * jnp.swapaxes(onehot, -1, -2)
    elif params.aggregation != "sum":
        raise ValueError(f"Unknown aggregation mode: {params.aggregation}")

    if params.deformable:
        # Mask neighbors outside every deformed kernel's extent; the
        # reference drops them via topk re-indexing (blocks.py:300-325),
        # which matters for 'constant' influence.
        in_range = jnp.any(sq_distances < params.kp_extent ** 2, axis=-1)
        all_weights = all_weights * in_range[:, :, None, :]

    # Shadow features are an appended zero row
    neighb_x = gather_neighbors(x, neighb_inds, 0.0)        # [B, Nq, K, Cin]

    # MXU inputs optionally in bfloat16 with float32 accumulation: the two
    # contractions carry ~all FLOPs of the network. Without the bf16 flag,
    # inputs keep their dtype (so float64 tests stay float64).
    use_bf16 = params.compute_dtype == "bfloat16"

    def mxu(a):
        return a.astype(jnp.bfloat16) if use_bf16 else a

    acc_dtype = (jnp.float32 if use_bf16 or x.dtype != jnp.float64
                 else jnp.float64)
    weighted = jnp.einsum("bqpk,bqkc->bqpc",
                          mxu(all_weights), mxu(neighb_x),
                          preferred_element_type=acc_dtype)

    if params.deformable and params.modulated:
        if modulations is None:
            raise ValueError("modulated KPConv requires modulations")
        weighted = weighted * modulations[..., None]

    # One big GEMM: [B*Nq, Kp*Cin] @ [Kp*Cin, Cout]
    b, nq = weighted.shape[:2]
    cin, cout = weights.shape[1:]
    out = jnp.dot(mxu(weighted.reshape(b * nq, kp * cin)),
                  mxu(weights.reshape(kp * cin, cout)),
                  preferred_element_type=acc_dtype)
    out = out.reshape(b, nq, cout)
    if return_oob:
        return out, min_sq, jnp.zeros((b,), jnp.float32)
    return out, min_sq


# ----------------------------------------------------------------------------
# Pooling / upsampling on the dense layout
# ----------------------------------------------------------------------------

def max_pool(x: jnp.ndarray, inds: jnp.ndarray,
             route: str = None) -> jnp.ndarray:
    """Max over each pooling neighborhood; shadow rows contribute zero.

    (The zero shadow row matches the reference, models/blocks.py:95-111:
    pooled maxima are clamped at >= 0.)

    route='dense' (default): the plain jnp.max formulation. Its VJP
    broadcasts the output over all K neighbor slots, rebuilds the
    [B, Nq, K, C] comparison mask and scatters K*C-deep — ~3.3 ms of the
    Vaihingen bench step across the two strided-shortcut pools (round-5
    trace mining), ~10x off its own memory roofline — but the best
    MEASURED pure-XLA formulation on this hardware.
    route='argmax': value-identical flat per-(query, channel) re-gather
    at the winning neighbor, making the backward a Q*C-element flat
    scatter-add (ties route to the first winner, torch semantics). On
    paper 17x less scatter work; MEASURED ON TPU it is 2x WORSE end to
    end (step 44.7 -> 93.3 ms, elementwise 6.5 -> 55.9 ms,
    full_run/perf/maxpool_route.jsonl): XLA lowers element-granularity
    1D gathers/scatters to serialized element loops, while the dense
    route's K-deep scatter at least moves full [*, C] rows. Kept as the
    measured counter-example.

    The MEASURED-BEST backward on TPU is neither: the banded Pallas VJP
    kernel (ops/pallas/maxpool_banded.py, step 44.7 -> 43.3 ms after
    its block-outer restructure), which models/blocks._masked_max_pool
    selects whenever the Pallas conv path is active. This op keeps the
    pure-XLA routes for non-sorted callers, oracles and A/B runs.
    """
    if route is None:
        route = os.environ.get("WEASAL_MAXPOOL", "dense")
    pooled = gather_neighbors(x, inds, 0.0)                 # [B, Nq, K, C]
    if route == "dense":
        return jnp.max(pooled, axis=2)
    b, ns, c = x.shape
    nq = inds.shape[1]
    k_star = jax.lax.stop_gradient(
        jnp.argmax(pooled, axis=2).astype(jnp.int32))       # [B, Nq, C]
    # winning SUPPORT row per (query, channel); shadow (== ns) selects the
    # appended zero pad row, preserving the >= 0 clamp
    s_star = jnp.take_along_axis(
        inds.astype(jnp.int32)[..., None], k_star[:, :, None, :],
        axis=2)[:, :, 0, :]                                 # [B, Nq, C]
    pad_row = jnp.zeros((b, 1, c), dtype=x.dtype)
    padded = jnp.concatenate([x, pad_row], axis=1)          # [B, Ns+1, C]
    flat = padded.reshape(b * (ns + 1) * c)
    offs = (jnp.arange(b, dtype=jnp.int32) * (ns + 1))[:, None, None]
    flat_idx = ((s_star + offs) * c
                + jnp.arange(c, dtype=jnp.int32)[None, None, :])
    out = jnp.take(flat, flat_idx.reshape(-1), axis=0)
    return out.reshape(b, nq, c)


def closest_pool(x: jnp.ndarray, inds: jnp.ndarray) -> jnp.ndarray:
    """Pool features of the nearest support (column 0 of sorted rows)."""
    nearest = gather_neighbors(x, inds[:, :, :1], 0.0)      # [B, Nq, 1, C]
    return nearest[:, :, 0, :]


def global_average(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Masked mean over the point axis: [B, N, C] -> [B, C]."""
    m = mask.astype(x.dtype)[..., None]
    return jnp.sum(x * m, axis=1) / jnp.maximum(
        jnp.sum(m, axis=1), 1.0)
