"""Network blocks (flax) on the dense sphere-batch layout.

Port surface of the reference's models/blocks.py, re-designed for TPU:

- every tensor is [B, N_l, C] with a [B, N_l] validity mask; the reference's
  per-cloud Python loops (global average, MPRM attention,
  models/blocks.py:114-134,758-1012) become batched masked matmuls,
- BatchNorm normalizes over real points only (padded rows must not pollute
  batch statistics; the reference's BN sees only real points),
- the KPConv module owns its trainable [Kp, Cin, Cout] weights and a frozen
  kernel-point disposition (collection 'constants'), with deformable offsets
  predicted by an inner rigid KPConv exactly like the reference
  (models/blocks.py:193-202,244-267).

Blocks take (x, batch, train) where batch is a PyramidBatch; each block reads
its level's tensors by `layer_ind` (strided blocks convolve from level l onto
level l+1 via `pools`, reference models/blocks.py:552-561).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from weasal_tpu.kernels.kernel_points import load_kernels
from weasal_tpu.ops import kpconv as ops
from weasal_tpu.ops.kpconv import KPConvParams
from weasal_tpu.utils.platform import resolve_pallas_flag

LEAKY_SLOPE = 0.1


def leaky_relu(x):
    return nn.leaky_relu(x, negative_slope=LEAKY_SLOPE)


def _kp_weight_init(key, shape, dtype=jnp.float32):
    """Torch kaiming_uniform(a=sqrt(5)) on a [Kp, Cin, Cout] tensor.

    Torch computes fan_in = size(1) * prod(size(2:)) = Cin * Cout for this
    shape, giving bound = 1/sqrt(Cin*Cout) (models/blocks.py:217-218).
    """
    fan_in = shape[1] * shape[2]
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _linear_init(key, shape, dtype=jnp.float32):
    """Torch nn.Linear default init: kaiming_uniform(a=sqrt(5)), fan_in."""
    fan_in = shape[0]
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over all real points of the batch (padded rows excluded).

    Falls back to a learned bias when use_bn is False, like the reference's
    BatchNormBlock (models/blocks.py:430-465). `momentum` follows the torch
    convention: running = (1 - momentum) * running + momentum * batch.

    Reference discrepancy (deliberate): the reference's
    BatchNormBlock.forward is a **no-op for 2-D inputs**
    (models/blocks.py:453-456 `if len(x.shape) < 3: x = x`) and its stacked
    layout is always 2-D, so the shipped reference never actually
    normalizes — its BN weights/stats remain at init (1/0/0/1). This module
    normalizes for real; fed those init-valued running stats at eval time it
    reduces to the identity up to eps, so reference-checkpoint interop still
    matches (tests/test_reference_parity.py).
    """
    use_bn: bool
    momentum: float = 0.02
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray],
                 train: bool) -> jnp.ndarray:
        features = x.shape[-1]
        if not self.use_bn:
            bias = self.param("bias", nn.initializers.zeros, (features,))
            return x + bias

        scale = self.param("scale", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((features,)))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((features,)))

        if train:
            if mask is None:
                m = jnp.ones(x.shape[:-1], x.dtype)[..., None]
            else:
                m = mask.astype(x.dtype)[..., None]
            count = jnp.maximum(jnp.sum(m), 1.0)
            mean = jnp.sum(x * m, axis=tuple(range(x.ndim - 1))) / count
            var = jnp.sum(((x - mean) ** 2) * m,
                          axis=tuple(range(x.ndim - 1))) / count
            if not self.is_initializing():
                ra_mean.value = ((1 - self.momentum) * ra_mean.value
                                 + self.momentum * mean)
                # Torch stores the unbiased variance in the running stats
                unbiased = var * count / jnp.maximum(count - 1.0, 1.0)
                ra_var.value = ((1 - self.momentum) * ra_var.value
                                + self.momentum * unbiased)
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = jax.lax.rsqrt(var + self.eps) * scale
        return (x - mean) * inv + bias


class UnaryBlock(nn.Module):
    """Linear (no bias) + BN + LeakyReLU (reference models/blocks.py:473-507)."""
    out_dim: int
    use_bn: bool
    bn_momentum: float
    no_relu: bool = False

    @nn.compact
    def __call__(self, x, mask, train: bool):
        w = self.param("mlp", _linear_init, (x.shape[-1], self.out_dim))
        x = x @ w
        x = MaskedBatchNorm(self.use_bn, self.bn_momentum,
                            name="batch_norm")(x, mask, train)
        if not self.no_relu:
            x = leaky_relu(x)
        return x


class KPConv(nn.Module):
    """Kernel point convolution module (reference models/blocks.py:144-374).

    The kernel disposition is loaded once at init into the 'constants'
    collection with a per-module random pose (rotation + jitter) drawn from
    `pose_seed`, mirroring the reference where every KPConv instance loads
    its own randomized disposition.
    """
    kernel_size: int
    p_dim: int
    in_channels: int
    out_channels: int
    kp_extent: float
    radius: float
    fixed_kernel_points: str = "center"
    influence: str = "linear"
    aggregation: str = "sum"
    deformable: bool = False
    modulated: bool = False
    pose_seed: int = 0
    compute_dtype: str = "float32"
    use_pallas: bool = False
    pallas_interpret: bool = False
    pallas_band: int = 0             # 0 = auto from conv geometry
    pallas_pblk_skip: bool = False   # exact per-kernel-point block skip
    in_radius: float = 0.0           # sphere radius (m) for auto banding
    sort_margin: float = 0.0         # level voxel size (m), sort slack
    band_slot: int = -1              # this conv's slot in the per-edge
    band_slots: int = 0              # kpconv drop vector [2L-1]; 0 = scalar

    def _init_kernel_points(self):
        kp = load_kernels(self.radius, self.kernel_size, self.p_dim,
                          self.fixed_kernel_points,
                          rng=np.random.default_rng(self.pose_seed))
        return jnp.asarray(kp)

    @nn.compact
    def __call__(self, q_pts, s_pts, neighb_inds, x):
        weights = self.param(
            "weights", _kp_weight_init,
            (self.kernel_size, self.in_channels, self.out_channels))
        kernel_points = self.variable(
            "constants", "kernel_points", self._init_kernel_points).value

        offsets = None
        modulations = None
        if self.deformable:
            offset_dim = (self.p_dim + int(self.modulated)) * self.kernel_size
            offset_feats = KPConv(
                self.kernel_size, self.p_dim, self.in_channels, offset_dim,
                self.kp_extent, self.radius,
                fixed_kernel_points=self.fixed_kernel_points,
                influence=self.influence, aggregation=self.aggregation,
                pose_seed=self.pose_seed + 1,
                compute_dtype=self.compute_dtype,
                name="offset_conv")(q_pts, s_pts, neighb_inds, x)
            offset_bias = self.param("offset_bias", nn.initializers.zeros,
                                     (offset_dim,))
            offset_feats = offset_feats + offset_bias
            b, nq = offset_feats.shape[:2]
            if self.modulated:
                raw = offset_feats[..., :self.p_dim * self.kernel_size]
                offsets = raw.reshape(b, nq, self.kernel_size, self.p_dim)
                modulations = 2 * jax.nn.sigmoid(
                    offset_feats[..., self.p_dim * self.kernel_size:])
            else:
                offsets = offset_feats.reshape(
                    b, nq, self.kernel_size, self.p_dim)
            offsets = offsets * self.kp_extent

        params = KPConvParams(
            kp_extent=self.kp_extent, influence=self.influence,
            aggregation=self.aggregation, deformable=self.deformable,
            modulated=self.modulated, compute_dtype=self.compute_dtype,
            use_pallas=self.use_pallas,
            pallas_interpret=self.pallas_interpret,
            pallas_band=self.pallas_band,
            pallas_pblk_skip=self.pallas_pblk_skip,
            radius=self.radius, in_radius=self.in_radius,
            sort_margin=self.sort_margin)
        out, min_sq, oob = ops.kpconv(
            q_pts, s_pts, neighb_inds, x, kernel_points, weights, params,
            offsets=offsets, modulations=modulations, return_oob=True)
        if ops.pallas_eligible(params, x.shape[-1], self.out_channels):
            # Out-of-band neighbor drops (should be 0 with spatially
            # sorted inputs); readable via mutable=['telemetry']. With a
            # band_slot the count lands in that slot of a per-edge vector
            # so the trainer can widen exactly the undersized band
            # (self-tuning, ops/pyramid.drop_vector_layout).
            count = jnp.sum(oob)
            if self.band_slots > 0 and self.band_slot >= 0:
                slots = self.band_slots
                value = jnp.zeros(slots, jnp.float32).at[
                    self.band_slot].set(count)
                init_fn = lambda: jnp.zeros(slots, jnp.float32)  # noqa: E731
            else:
                value = count
                init_fn = lambda: jnp.zeros((), jnp.float32)     # noqa: E731
            self.sow("telemetry", "pallas_oob", value,
                     init_fn=init_fn,
                     reduce_fn=lambda a, b: a + b)
        if self.deformable:
            # Stash regularizer inputs (read via mutable 'deform'
            # collection). q_valid excludes padded query rows (all-shadow
            # neighbor lists) so the regularizer means run over real
            # points only, like the reference's ragged stacking
            # (architectures.py:24-57).
            self.sow("deform", "min_sq", min_sq / self.kp_extent ** 2)
            self.sow("deform", "deformed_kp",
                     (kernel_points[None, None] + offsets) / self.kp_extent)
            self.sow("deform", "q_valid",
                     jnp.any(neighb_inds < s_pts.shape[-2],
                             axis=-1).astype(jnp.float32))
        return out


def _conv_inputs(block_name: str, layer_ind: int, batch):
    """Select query/support/neighbor tensors for a (possibly strided) conv."""
    if "strided" in block_name:
        q_pts = batch.points[layer_ind + 1]
        s_pts = batch.points[layer_ind]
        neighb = batch.pools[layer_ind]
        out_mask = batch.masks[layer_ind + 1]
    else:
        q_pts = batch.points[layer_ind]
        s_pts = batch.points[layer_ind]
        neighb = batch.neighbors[layer_ind]
        out_mask = batch.masks[layer_ind]
    return q_pts, s_pts, neighb, out_mask


class _ConvBlockBase(nn.Module):
    """Shared fields of conv-carrying blocks."""
    block_name: str
    in_dim: int
    out_dim: int
    radius: float
    layer_ind: int
    config: Any


def _make_kpconv(parent_cfg, block_name, in_dim, out_dim, radius, layer_ind,
                 path=(), name="KPConv"):
    import zlib
    cfg = parent_cfg
    current_extent = radius * cfg.KP_extent / cfg.conv_radius
    # Band half-window: explicit config override wins; else the plan's
    # measured per-edge band (trainer/tester set cfg.pallas_band_table from
    # ShapePlan.bands); else 0 = ops.kpconv analytic auto-band fallback.
    band = int(getattr(cfg, "pallas_band", 0))
    table = getattr(cfg, "pallas_band_table", None)
    if not band and table:
        edge = "pool" if "strided" in block_name else "conv"
        row = table.get(edge, ())
        if layer_ind < len(row):
            band = int(row[layer_ind])
    # Deterministic per-op pose seed (each KPConv gets its own randomized
    # kernel disposition, like the reference's per-instance load_kernels).
    # The flax module path disambiguates convs with identical signatures
    # (e.g. an attention block's simple1/simple2) — without it they would
    # share one "random" pose.
    seed = zlib.crc32(
        ("/".join(path) + "|"
         + f"{block_name}|{in_dim}|{out_dim}|{radius:.6f}|{layer_ind}"
         ).encode())
    return KPConv(
        cfg.num_kernel_points, cfg.in_points_dim, in_dim, out_dim,
        current_extent, radius,
        fixed_kernel_points=cfg.fixed_kernel_points,
        influence=cfg.KP_influence, aggregation=cfg.aggregation_mode,
        deformable="deform" in block_name, modulated=cfg.modulated,
        pose_seed=seed & 0x7FFFFFFF,
        compute_dtype=getattr(cfg, "compute_dtype", "float32"),
        use_pallas=resolve_pallas_flag(
            getattr(cfg, "use_pallas_kpconv", False),
            auto_requires=bool(getattr(cfg, "device_pyramid", False))),
        pallas_interpret=bool(getattr(cfg, "pallas_interpret", False)),
        pallas_band=band,
        pallas_pblk_skip=bool(getattr(cfg, "pallas_pblk_skip", False)),
        in_radius=float(getattr(cfg, "in_radius", 0.0)),
        sort_margin=radius / cfg.conv_radius,
        band_slot=(cfg.num_layers + layer_ind
                   if "strided" in block_name else layer_ind),
        band_slots=2 * cfg.num_layers - 1,
        name=name)


class SimpleBlock(_ConvBlockBase):
    """KPConv(out_dim // 2) + BN + LeakyReLU (models/blocks.py:510-564)."""

    @nn.compact
    def __call__(self, x, batch, train: bool):
        cfg = self.config
        q_pts, s_pts, neighb, out_mask = _conv_inputs(
            self.block_name, self.layer_ind, batch)
        x = _make_kpconv(cfg, self.block_name, self.in_dim,
                         self.out_dim // 2, self.radius, self.layer_ind,
                         path=self.path)(q_pts, s_pts, neighb, x)
        x = MaskedBatchNorm(cfg.use_batch_norm, cfg.batch_norm_momentum,
                            name="batch_norm")(x, out_mask, train)
        return leaky_relu(x)


class SimpleBlock2(_ConvBlockBase):
    """SimpleBlock variant with full out_dim (models/blocks.py:567-622)."""

    @nn.compact
    def __call__(self, x, batch, train: bool):
        cfg = self.config
        q_pts, s_pts, neighb, out_mask = _conv_inputs(
            self.block_name, self.layer_ind, batch)
        x = _make_kpconv(cfg, self.block_name, self.in_dim, self.out_dim,
                         self.radius, self.layer_ind,
                         path=self.path)(q_pts, s_pts, neighb, x)
        x = MaskedBatchNorm(cfg.use_batch_norm, cfg.batch_norm_momentum,
                            name="batch_norm")(x, out_mask, train)
        return leaky_relu(x)


def _masked_max_pool(cfg, x, inds, layer_ind):
    """Neighborhood max-pool with the banded Pallas backward when the
    Pallas conv path is active (same sorted-support precondition, same
    measured pool-edge band windows); the dense jnp.max route otherwise.
    WEASAL_MAXPOOL=dense|argmax|banded overrides for A/B runs."""
    import os
    route = os.environ.get("WEASAL_MAXPOOL", "")
    use_banded = resolve_pallas_flag(
        getattr(cfg, "use_pallas_kpconv", False),
        auto_requires=bool(getattr(cfg, "device_pyramid", False)))
    if route in ("dense", "argmax"):
        return ops.max_pool(x, inds, route=route)
    if not (use_banded or route == "banded"):
        return ops.max_pool(x, inds)
    band = int(getattr(cfg, "pallas_band", 0))
    table = getattr(cfg, "pallas_band_table", None)
    if not band and table:
        row = table.get("pool", ())
        if layer_ind < len(row):
            band = int(row[layer_ind])
    from weasal_tpu.ops.pallas.maxpool_banded import max_pool_banded
    return max_pool_banded(
        x, inds, band, 128, bool(getattr(cfg, "pallas_interpret", False)))


class ResnetBottleneckBlock(_ConvBlockBase):
    """unary -> KPConv -> unary with (max-pooled) shortcut
    (models/blocks.py:624-709)."""

    @nn.compact
    def __call__(self, features, batch, train: bool):
        cfg = self.config
        q_pts, s_pts, neighb, out_mask = _conv_inputs(
            self.block_name, self.layer_ind, batch)
        in_mask = batch.masks[self.layer_ind]

        if self.in_dim != self.out_dim // 4:
            x = UnaryBlock(self.out_dim // 4, cfg.use_batch_norm,
                           cfg.batch_norm_momentum,
                           name="unary1")(features, in_mask, train)
        else:
            x = features

        x = _make_kpconv(cfg, self.block_name, self.out_dim // 4,
                         self.out_dim // 4, self.radius, self.layer_ind,
                         path=self.path)(q_pts, s_pts, neighb, x)
        x = MaskedBatchNorm(cfg.use_batch_norm, cfg.batch_norm_momentum,
                            name="batch_norm_conv")(x, out_mask, train)
        x = leaky_relu(x)

        x = UnaryBlock(self.out_dim, cfg.use_batch_norm,
                       cfg.batch_norm_momentum, no_relu=True,
                       name="unary2")(x, out_mask, train)

        if "strided" in self.block_name:
            shortcut = _masked_max_pool(cfg, features, neighb,
                                        self.layer_ind)
        else:
            shortcut = features
        if self.in_dim != self.out_dim:
            shortcut = UnaryBlock(self.out_dim, cfg.use_batch_norm,
                                  cfg.batch_norm_momentum, no_relu=True,
                                  name="unary_shortcut")(shortcut, out_mask,
                                                         train)
        return leaky_relu(x + shortcut)


class NearestUpsampleBlock(nn.Module):
    """Closest-neighbor upsampling (models/blocks.py:725-741)."""
    layer_ind: int

    def __call__(self, x, batch, train: bool):
        return ops.closest_pool(x, batch.upsamples[self.layer_ind - 1])


class MaxPoolBlock(nn.Module):
    layer_ind: int
    config: Any = None

    def __call__(self, x, batch, train: bool):
        return _masked_max_pool(self.config, x,
                                batch.pools[self.layer_ind + 1],
                                self.layer_ind)


class GlobalAverageBlock(nn.Module):
    """Per-sphere masked mean at the last level (models/blocks.py:712-722)."""

    def __call__(self, x, batch, train: bool):
        return ops.global_average(x, batch.masks[-1])


# ----------------------------------------------------------------------------
# MPRM attention blocks (reference models/blocks.py:758-1012); the per-cloud
# loops become batched masked matmuls over [B, N, ...] tensors.
# ----------------------------------------------------------------------------

def _zero_padded(x, mask):
    return x * mask.astype(x.dtype)[..., None]


class SpatialAttention(_ConvBlockBase):
    """Point-to-point self-attention per sphere; returns (merged, xn).

    xn is the attention output normalized by the sphere's real point count
    (feeds the point-attention path, models/blocks.py:796-821).
    """

    @nn.compact
    def __call__(self, features, batch, train: bool):
        cfg = self.config
        mask = batch.masks[self.layer_ind]

        features = SimpleBlock2(self.block_name, self.in_dim, self.out_dim,
                                self.radius, self.layer_ind, cfg,
                                name="simple1")(features, batch, train)
        x1 = UnaryBlock(self.out_dim // 8, cfg.use_batch_norm,
                        cfg.batch_norm_momentum,
                        name="unary1")(features, mask, train)
        x2 = UnaryBlock(self.out_dim // 8, cfg.use_batch_norm,
                        cfg.batch_norm_momentum,
                        name="unary2")(features, mask, train)
        x3 = UnaryBlock(self.out_dim, cfg.use_batch_norm,
                        cfg.batch_norm_momentum,
                        name="unary3")(features, mask, train)
        gamma = self.param("gamma", nn.initializers.zeros, (1,))

        energy = jnp.einsum("bnc,bmc->bnm", x1, x2,
                            preferred_element_type=jnp.float32)
        energy = jnp.where(mask[:, None, :], energy, -jnp.inf)
        att_w = jax.nn.softmax(energy, axis=-1)
        # Rows of padded queries are uniform over valid keys; they are
        # masked out by downstream consumers.
        att = jnp.einsum("bnm,bmc->bnc", att_w, x3,
                         preferred_element_type=jnp.float32)
        counts = jnp.maximum(jnp.sum(mask, axis=1), 1).astype(att.dtype)
        xn = att / counts[:, None, None]

        merged = gamma * att + features
        merged = SimpleBlock2(self.block_name, self.in_dim, self.out_dim,
                              self.radius, self.layer_ind, cfg,
                              name="simple2")(merged, batch, train)
        return merged, xn


class ChannelAttention(_ConvBlockBase):
    """C x C channel attention per sphere (models/blocks.py:824-882)."""

    @nn.compact
    def __call__(self, features, batch, train: bool):
        cfg = self.config
        mask = batch.masks[self.layer_ind]

        features = SimpleBlock2(self.block_name, self.in_dim,
                                self.out_dim // 8, self.radius,
                                self.layer_ind, cfg,
                                name="simple1")(features, batch, train)
        x1 = UnaryBlock(self.out_dim // 8, cfg.use_batch_norm,
                        cfg.batch_norm_momentum,
                        name="unary1")(features, mask, train)
        x2 = UnaryBlock(self.out_dim // 8, cfg.use_batch_norm,
                        cfg.batch_norm_momentum,
                        name="unary2")(features, mask, train)
        gamma = self.param("gamma", nn.initializers.zeros, (1,))

        # Padded rows must not contribute to the point-summed energy
        q = _zero_padded(x1, mask)
        k = _zero_padded(x2, mask)
        energy = jnp.einsum("bnc,bnd->bcd", q, k,
                            preferred_element_type=jnp.float32)
        energy_new = jnp.max(energy, axis=-1, keepdims=True) - energy
        att_w = jax.nn.softmax(energy_new, axis=-1)
        att = jnp.einsum("bnc,bcd->bnd", features, att_w,
                         preferred_element_type=jnp.float32)

        merged = gamma * att + features
        merged = SimpleBlock2(self.block_name, self.out_dim // 8,
                              self.out_dim, self.radius, self.layer_ind, cfg,
                              name="simple2")(merged, batch, train)
        return merged


class ElevationAttention(_ConvBlockBase):
    """Attention keyed on (reduced height, absolute height)
    (models/blocks.py:957-1012)."""

    @nn.compact
    def __call__(self, features, h, batch, train: bool):
        cfg = self.config
        mask = batch.masks[self.layer_ind]

        # Per-sphere absolute height = reduced height + sphere center z
        o_z = batch.center_pts[:, 2][:, None, None]
        ele_f = jnp.concatenate([h, h + o_z], axis=-1)       # [B, N, 2]

        q = UnaryBlock(self.out_dim, cfg.use_batch_norm,
                       cfg.batch_norm_momentum,
                       name="unary1")(ele_f, mask, train)
        k = UnaryBlock(self.out_dim, cfg.use_batch_norm,
                       cfg.batch_norm_momentum,
                       name="unary2")(ele_f, mask, train)
        gamma = self.param("gamma", nn.initializers.zeros, (1,))

        q = _zero_padded(q, mask)
        k = _zero_padded(k, mask)
        energy = jnp.einsum("bnc,bnd->bcd", q, k,
                            preferred_element_type=jnp.float32)
        att_w = jax.nn.softmax(energy, axis=-1)
        att = jnp.einsum("bnc,bcd->bnd", features, att_w,
                         preferred_element_type=jnp.float32)

        merged = gamma * att + features
        merged = SimpleBlock2(self.block_name, self.out_dim, self.out_dim,
                              self.radius, self.layer_ind, cfg,
                              name="simple2")(merged, batch, train)
        return merged


class MultiPathAttention(_ConvBlockBase):
    """MPRM 4-path head: no/point/spatial/channel attention, each projected
    to class logits (models/blocks.py:885-927). Returns (sa_u, ca_u, no_u,
    pa_u) per-point class maps."""

    @nn.compact
    def __call__(self, features, batch, train: bool):
        cfg = self.config
        mask = batch.masks[self.layer_ind]
        fdim = cfg.num_classes

        sa, sa_xn = SpatialAttention(self.block_name, self.in_dim,
                                     self.out_dim, self.radius,
                                     self.layer_ind, cfg,
                                     name="sa_f")(features, batch, train)
        ca = ChannelAttention(self.block_name, self.in_dim, self.out_dim,
                              self.radius, self.layer_ind, cfg,
                              name="ca_f")(features, batch, train)
        pa = jnp.concatenate([features, sa_xn], axis=-1)
        pa = SimpleBlock2(self.block_name, self.in_dim + self.out_dim,
                          self.out_dim, self.radius, self.layer_ind, cfg,
                          name="simple1")(pa, batch, train)

        sa_u = UnaryBlock(fdim, cfg.use_batch_norm, cfg.batch_norm_momentum,
                          name="sa_unary")(sa, mask, train)
        ca_u = UnaryBlock(fdim, cfg.use_batch_norm, cfg.batch_norm_momentum,
                          name="ca_unary")(ca, mask, train)
        no_u = UnaryBlock(fdim, cfg.use_batch_norm, cfg.batch_norm_momentum,
                          name="no_unary")(features, mask, train)
        pa_u = UnaryBlock(fdim, cfg.use_batch_norm, cfg.batch_norm_momentum,
                          name="pa_unary")(pa, mask, train)
        return sa_u, ca_u, no_u, pa_u


def block_decider(block_name: str, radius: float, in_dim: int, out_dim: int,
                  layer_ind: int, config, name: Optional[str] = None):
    """Map an architecture-DSL block name to its module
    (reference models/blocks.py:387-427)."""
    if block_name == "unary":
        return UnaryBlock(out_dim, config.use_batch_norm,
                          config.batch_norm_momentum, name=name)
    if block_name in ("simple", "simple_deformable", "simple_invariant",
                      "simple_equivariant", "simple_strided",
                      "simple_deformable_strided", "simple_invariant_strided",
                      "simple_equivariant_strided"):
        return SimpleBlock(block_name, in_dim, out_dim, radius, layer_ind,
                           config, name=name)
    if block_name in ("resnetb", "resnetb_invariant", "resnetb_equivariant",
                      "resnetb_deformable", "resnetb_strided",
                      "resnetb_deformable_strided",
                      "resnetb_equivariant_strided",
                      "resnetb_invariant_strided"):
        return ResnetBottleneckBlock(block_name, in_dim, out_dim, radius,
                                     layer_ind, config, name=name)
    if block_name in ("max_pool", "max_pool_wide"):
        return MaxPoolBlock(layer_ind, config, name=name)
    if block_name == "global_average":
        return GlobalAverageBlock(name=name)
    if block_name == "nearest_upsample":
        return NearestUpsampleBlock(layer_ind, name=name)
    raise ValueError(f"Unknown block name in architecture: {block_name}")
