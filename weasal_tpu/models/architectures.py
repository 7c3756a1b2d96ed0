"""Network architectures assembled from the config's architecture DSL.

Same assembly rules as the reference (models/architectures.py:192-807): walk
the block-name list, double feature dim and radius at every strided block,
record encoder skip dims, build the decoder with skip concats after each
upsample. Three networks:

- KPFCNN: encoder-decoder U-Net for point segmentation,
- KPFCNN_mprm: weak-label multi-path classifier — encoder + elevation
  attention + MPRM 4-path heads, per-path global average logits, shared
  2-step nearest-upsample decoder, elementwise-max fusion,
- KPCNN: plain classifier head (parity; unused by the shipped pipeline).

All forwards take a PyramidBatch and a `train` flag; losses live in
weasal_tpu.models.losses as pure functions.
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from weasal_tpu.models.blocks import (
    ElevationAttention, MultiPathAttention, NearestUpsampleBlock,
    UnaryBlock, block_decider)
from weasal_tpu.ops.kpconv import global_average


def _split_channels(x, widths):
    """Split [..., sum(widths)] back into per-path channel slices."""
    off = 0
    for w in widths:
        yield x[..., off:off + w]
        off += w


def valid_label_mapper(lbl_values: Sequence[int],
                       ign_lbls: Sequence[int]) -> np.ndarray:
    """Lookup table raw-label-index -> class index in [0, C), or -1 if ignored.

    Mirrors the reference's loss-side remap loop
    (models/architectures.py:362-365). Input labels are the dataset's
    label-to-idx values (e.g. 0..8, plus 10 for 'Ignore' in the PL stage);
    -1 padding stays -1 via the caller.
    """
    valid = np.sort([c for c in lbl_values if c not in set(ign_lbls)])
    table = -np.ones(int(max(lbl_values)) + 1, dtype=np.int32)
    for i, c in enumerate(valid):
        table[c] = i
    return table


def _encoder_plan(config):
    """Walk the architecture list; return per-block build info + final dims."""
    layer = 0
    r = config.first_subsampling_dl * config.conv_radius
    in_dim = config.in_features_dim
    out_dim = config.first_features_dim

    blocks = []          # (name, radius, in_dim, out_dim, layer)
    skip_blocks = []     # encoder block indices where a skip is recorded
    skip_dims = []
    for block_i, block in enumerate(config.architecture):
        if ("equivariant" in block) and out_dim % 3 != 0:
            raise ValueError("Equivariant block with dim not multiple of 3")
        if any(tmp in block for tmp in
               ("pool", "strided", "upsample", "global", "attention")):
            skip_blocks.append(block_i)
            skip_dims.append(in_dim)
        if "attention" in block or "upsample" in block:
            break
        blocks.append((block, r, in_dim, out_dim, layer))
        in_dim = out_dim // 2 if "simple" in block else out_dim
        if "pool" in block or "strided" in block:
            layer += 1
            r *= 2
            out_dim *= 2
    return blocks, skip_blocks, skip_dims, in_dim, out_dim, layer, r


def _decoder_plan(config, skip_dims, layer, r, out_dim):
    """Build info for decoder blocks + skip-concat block indices."""
    start_i = 0
    for block_i, block in enumerate(config.architecture):
        if "upsample" in block:
            start_i = block_i
            break

    in_dim = out_dim
    blocks = []
    concats = []
    for block_i, block in enumerate(config.architecture[start_i:]):
        if block_i > 0 and "upsample" in config.architecture[
                start_i + block_i - 1]:
            in_dim += skip_dims[layer]
            concats.append(block_i)
        blocks.append((block, r, in_dim, out_dim, layer))
        in_dim = out_dim
        if "upsample" in block:
            layer -= 1
            r *= 0.5
            out_dim = out_dim // 2
    return blocks, concats


class KPFCNN(nn.Module):
    """Encoder-decoder segmentation network
    (reference models/architectures.py:192-352)."""
    config: Any
    lbl_values: Tuple[int, ...]
    ign_lbls: Tuple[int, ...]

    def setup(self):
        cfg = self.config
        self.C = len(self.lbl_values) - len(self.ign_lbls)
        (enc, skip_blocks, skip_dims, in_dim, out_dim, layer, r) = \
            _encoder_plan(cfg)
        self.encoder_skips = skip_blocks
        self.encoder_blocks = [
            block_decider(b, rr, di, do, li, cfg)
            for (b, rr, di, do, li) in enc]
        dec, concats = _decoder_plan(cfg, skip_dims, layer, r, out_dim)
        self.decoder_concats = concats
        self.decoder_blocks = [
            block_decider(b, rr, di, do, li, cfg)
            for (b, rr, di, do, li) in dec]
        self.head_mlp = UnaryBlock(cfg.first_features_dim, False, 0.0)
        self.head_softmax = UnaryBlock(self.C, False, 0.0)
        self.dropout_rate = float(getattr(cfg, "dropout", 0) or 0)
        if self.dropout_rate:
            self.droplayer = nn.Dropout(rate=self.dropout_rate)

    def __call__(self, batch, train: bool = True):
        x = batch.features
        mask0 = batch.masks[0]

        skip_x: List[jnp.ndarray] = []
        for block_i, block in enumerate(self.encoder_blocks):
            if block_i in self.encoder_skips:
                skip_x.append(x)
            x = block(x, batch, train)

        # Track the current level's mask through the decoder for unary BN
        level = len(batch.points) - 1
        for block_i, block in enumerate(self.decoder_blocks):
            if block_i in self.decoder_concats:
                x = jnp.concatenate([x, skip_x.pop()], axis=-1)
            if isinstance(block, UnaryBlock):
                x = block(x, batch.masks[level], train)
            else:
                x = block(x, batch, train)
                level -= 1

        if self.dropout_rate:
            x = self.droplayer(x, deterministic=not train)

        x = self.head_mlp(x, mask0, train)
        return self.head_softmax(x, mask0, train)


class KPFCNN_mprm(nn.Module):
    """Weak-label multi-path region mining network
    (reference models/architectures.py:507-707)."""
    config: Any
    lbl_values: Tuple[int, ...]
    ign_lbls: Tuple[int, ...]

    def setup(self):
        cfg = self.config
        self.C = len(self.lbl_values) - len(self.ign_lbls)
        (enc, skip_blocks, skip_dims, in_dim, out_dim, layer, r) = \
            _encoder_plan(cfg)
        self.encoder_skips = skip_blocks
        self.encoder_blocks = [
            block_decider(b, rr, di, do, li, cfg)
            for (b, rr, di, do, li) in enc]
        self.att_layer = layer
        self.multi_att = MultiPathAttention(
            "attention", out_dim, out_dim, r, layer, cfg)
        self.ele_head = ElevationAttention(
            "ele_attention", 2, out_dim, r, layer, cfg)

        dec, _ = _decoder_plan(cfg, skip_dims, layer, r, out_dim)
        # The mprm decoder applies blocks to 4 class-map streams without
        # skip concats (reference forward, architectures.py:693-697)
        self.decoder_blocks = [
            block_decider(b, rr, di, do, li, cfg)
            for (b, rr, di, do, li) in dec]
        self.decoder_levels = tuple(li for (_, _, _, _, li) in dec)

    def __call__(self, batch, train: bool = True):
        x = batch.features

        # Elevation feature: reduced height at the attention level
        ele_down = batch.points[self.att_layer][:, :, 2:3]

        for block in self.encoder_blocks:
            x = block(x, batch, train)
        x = self.ele_head(x, ele_down, batch, train)

        sa, ca, no, pa = self.multi_att(x, batch, train)

        att_mask = batch.masks[self.att_layer]
        cla_logits = [global_average(p, att_mask) for p in (no, pa, sa, ca)]

        paths = [no, pa, sa, ca]
        for block, level in zip(self.decoder_blocks, self.decoder_levels):
            if isinstance(block, UnaryBlock):
                # UnaryBlock takes (features, mask) — same dispatch as the
                # KPFCNN decoder; conv/upsample blocks take the batch.
                # Applied per path: the shared BN must see each path's own
                # batch statistics (reference protocol).
                paths = [block(p, batch.masks[level], train)
                         for p in paths]
            elif isinstance(block, NearestUpsampleBlock):
                # Pure parameterless gather: run the 4 class-map streams
                # as ONE channel-concatenated gather instead of 4 separate
                # [N, C] gathers (measured ~0.5 ms/step of small-gather
                # fusions at bench shapes, round-5 trace).
                widths = [p.shape[-1] for p in paths]
                fused = block(jnp.concatenate(paths, axis=-1), batch,
                              train)
                paths = list(_split_channels(fused, widths))
            else:
                paths = [block(p, batch, train) for p in paths]
        no, pa, sa, ca = paths

        x = jnp.maximum(jnp.maximum(no, pa), jnp.maximum(sa, ca))
        cam = paths
        return x, cla_logits, cam


class KPCNN(nn.Module):
    """Plain KPConv classifier (reference models/architectures.py:60-152)."""
    config: Any

    def setup(self):
        cfg = self.config
        enc, _, _, in_dim, out_dim, layer, r = _encoder_plan(cfg)
        self.block_ops = [
            block_decider(b, rr, di, do, li, cfg)
            for (b, rr, di, do, li) in enc]
        self.head_mlp = UnaryBlock(1024, False, 0.0)
        self.head_softmax = UnaryBlock(cfg.num_classes, False, 0.0)

    def __call__(self, batch, train: bool = True):
        x = batch.features
        for block in self.block_ops:
            x = block(x, batch, train)
        if x.ndim == 3:  # no global block in arch: average over points
            x = global_average(x, batch.masks[-1])
        x = self.head_mlp(x, None, train)
        return self.head_softmax(x, None, train)
