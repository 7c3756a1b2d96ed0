"""Measured banded-kernel windows (ShapePlan.bands).

Covers the tile-statistics math, the measure_bands integration (banded
interpret-mode pyramid must reproduce the exact XLA pyramid with zero
overflow under measured windows), and the nested search/kpconv schema.
"""

import numpy as np
import jax.numpy as jnp

from weasal_tpu.config import Config
from weasal_tpu.data.level0 import assemble_level0
from weasal_tpu.data.batching import ShapePlan
from weasal_tpu.ops.pyramid import (
    _tile_need_conv, _tile_need_search, _band_from_need, measure_bands,
    plan_bands_tuple, build_pyramid_device)


class TinyConfig(Config):
    num_classes = 5
    in_features_dim = 4
    first_features_dim = 16
    in_radius = 5.0
    first_subsampling_dl = 0.5
    conv_radius = 2.5
    architecture = ["simple", "resnetb", "resnetb_strided", "resnetb",
                    "resnetb_strided", "resnetb",
                    "nearest_upsample", "nearest_upsample"]
    device_pyramid = True


def surface_sphere(rng, r=5.0, n=1600):
    xy = rng.uniform(-r, r, size=(n, 2))
    keep = np.linalg.norm(xy, axis=1) < r
    xy = xy[keep]
    z = 0.3 * np.sin(xy[:, 0]) + rng.normal(0, 0.1, xy.shape[0])
    return np.column_stack([xy, z]).astype(np.float32)


# ----------------------------------------------------------------------
# Tile statistics (pure numpy, hand-checkable)
# ----------------------------------------------------------------------

class TestTileNeeds:

    def test_conv_need_single_tile(self):
        # One batch, one 128-query tile, neighbors in [130, 400]:
        # window starts at 130//128*128 = 128 -> need 400 - 128 + 1 = 273
        idx = np.full((1, 128, 2), 999, np.int32)     # ns=999 -> invalid
        idx[0, 0, 0] = 130
        idx[0, 5, 1] = 400
        assert _tile_need_conv(idx, ns=999) == 273

    def test_conv_need_ignores_shadow(self):
        idx = np.full((1, 128, 3), 7, np.int32)       # ns=7 -> all shadow
        assert _tile_need_conv(idx, ns=7) == 0

    def test_conv_need_worst_tile_wins(self):
        idx = np.full((1, 256, 1), 10_000, np.int32)
        idx[0, 0, 0] = 0      # tile 0: need 1
        idx[0, 200, 0] = 640  # tile 1: need 641 (min==max -> 640-512+1=129)
        idx[0, 255, 0] = 512
        assert _tile_need_conv(idx, ns=10_000) == 129

    def test_search_need_key_range(self):
        # Supports at keys 0..999 (one per row); 128 queries all at key
        # 500.0, radius 10, margin 0 -> lo=490, hi=510. below = 490,
        # aligned 384; until = 511 -> need 127.
        ks = np.arange(1000, dtype=np.float64)[None]
        kq = np.full((1, 128), 500.0)
        qm = np.ones((1, 128), bool)
        sm = np.ones((1, 1000), bool)
        assert _tile_need_search(kq, ks, qm, sm, 10.0, 0.0) == 511 - 384

    def test_band_from_need_headroom(self):
        assert _band_from_need(0) == 256
        assert _band_from_need(1) == 384
        # need 1520 -> W 1792 -> kernels cover 1920
        assert _band_from_need(1520) == 1792


# ----------------------------------------------------------------------
# Integration: measured windows reproduce the exact pyramid
# ----------------------------------------------------------------------

def _level0_batches(cfg, plan, n_batches=3, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n_batches):
        payloads = [dict(points=surface_sphere(rng),
                         features=np.zeros((1, 1), np.float32))
                    for _ in range(2)]
        for p in payloads:
            p["features"] = np.zeros((p["points"].shape[0], 1), np.float32)
        arrays = assemble_level0(payloads, plan, cfg.num_classes, rng)
        out.append((arrays["points0"], arrays["mask0"],
                    arrays["rotations"]))
    return out


def _tiny_plan():
    return ShapePlan(num_points=[1400, 384, 104],
                     conv_neighbors=[30, 34, 30],
                     pool_neighbors=[30, 34])


def test_measured_bands_schema_and_exactness():
    cfg = TinyConfig()
    plan = _tiny_plan()
    batches = _level0_batches(cfg, plan)
    bands = measure_bands(batches, cfg, plan)

    assert set(bands) == {"search", "kpconv"}
    assert [len(bands["search"][k]) for k in ("conv", "pool", "up")] \
        == [3, 2, 2]
    assert [len(bands["kpconv"][k]) for k in ("conv", "pool")] == [3, 2]
    for k, v in bands["search"].items():
        assert all(w >= 256 and w % 128 == 0 for w in v), (k, v)

    # Under the measured windows, the banded interpret-mode pyramid must
    # equal the exact XLA pyramid with zero overflow on the same batches.
    plan.bands = bands
    assert plan_bands_tuple(plan) is not None
    cfg_banded = TinyConfig()
    cfg_banded.use_pallas_search = True
    cfg_banded.pallas_interpret = True
    for pts0, m0, rot in batches:
        exact = build_pyramid_device(
            jnp.asarray(pts0), jnp.asarray(m0), cfg, plan,
            rotations=jnp.asarray(rot))
        banded = build_pyramid_device(
            jnp.asarray(pts0), jnp.asarray(m0), cfg_banded, plan,
            rotations=jnp.asarray(rot))
        assert float(jnp.sum(banded[5])) == 0.0, \
            "search overflow under measured band"
        # Neighbor SETS must agree except for exact distance ties at the
        # K-truncation boundary (per-axis VPU vs XLA matmul distances can
        # break ties differently — semantics verified in
        # tests/test_radius_banded.py); require near-total agreement here.
        for a, b in zip(list(exact[2]) + list(exact[3]),
                        list(banded[2]) + list(banded[3])):
            a = np.sort(np.asarray(a), axis=-1)
            b = np.sort(np.asarray(b), axis=-1)
            agree = float(np.mean(a == b))
            assert agree > 0.9999, agree
        for a, b in zip(exact[4], banded[4]):      # upsamples (1-NN)
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# ----------------------------------------------------------------------
# Per-edge drop attribution (self-tuning bands, VERDICT r2 #10)
# ----------------------------------------------------------------------

def test_drop_vector_layout_matches_band_slots():
    """The concatenated drop vector's labels line up with (a) the KPConv
    band_slot rule in models/blocks (_make_kpconv: conv at layer_ind,
    strided/pool at num_layers + layer_ind) and (b) the search-overflow
    slot rule in ops/pyramid.search_slot."""
    from weasal_tpu.ops.pyramid import drop_vector_layout, search_slot
    L = 3
    layout = drop_vector_layout(L)
    assert len(layout) == 5 * L - 3
    n_kp = 2 * L - 1
    for l in range(L):
        assert layout[l] == ("kpconv", "conv", l)
    for l in range(L - 1):
        assert layout[L + l] == ("kpconv", "pool", l)
    for edge, n in (("conv", L), ("pool", L - 1), ("up", L - 1)):
        for l in range(n):
            assert layout[n_kp + search_slot(edge, l, L)] == \
                ("search", edge, l)


def test_search_overflow_attributed_to_undersized_edge():
    """Shrinking ONE edge's window below its raw measured need makes the
    banded pyramid count overflow in exactly that edge's slot of the
    per-edge vector — the attribution the trainer's self-tuning widen
    relies on."""
    import pytest
    from weasal_tpu.ops.pallas.common import QUANTUM
    from weasal_tpu.ops.pyramid import search_slot

    cfg = TinyConfig()
    plan = _tiny_plan()
    batches = _level0_batches(cfg, plan)
    needs = measure_bands(batches, cfg, plan, headroom_fn=lambda n: n)
    plan.bands = {kind: {e: [_band_from_need(n) for n in row]
                         for e, row in d.items()}
                  for kind, d in needs.items()}
    # Level-0 conv search has the largest key-range window here; cut its
    # band so kernel coverage ((W/q + 1) blocks) misses the raw need
    need = needs["search"]["conv"][0]
    w = max(QUANTUM, (need // QUANTUM - 3) * QUANTUM)
    if (w // QUANTUM + 1) * QUANTUM >= need:
        pytest.skip(f"geometry too small to undersize (need {need})")
    plan.bands["search"]["conv"][0] = w

    cfgb = TinyConfig()
    cfgb.use_pallas_search = True
    cfgb.pallas_interpret = True
    L = plan.num_layers
    slot = search_slot("conv", 0, L)
    total = np.zeros(3 * L - 2)
    for pts0, m0, rot in batches:
        out = build_pyramid_device(jnp.asarray(pts0), jnp.asarray(m0),
                                   cfgb, plan, rotations=jnp.asarray(rot))
        total += np.asarray(out[5])
    assert total[slot] > 0, "undersized edge must count overflow"
    assert np.all(np.delete(total, slot) == 0), \
        "overflow must not leak into other edges' slots"


def test_plan_bands_json_roundtrip(tmp_path):
    plan = _tiny_plan()
    plan.bands = {"search": {"conv": [256, 384, 256], "pool": [256, 256],
                             "up": [384, 256]},
                  "kpconv": {"conv": [256, 256, 256], "pool": [256, 256]}}
    path = str(tmp_path / "plan.json")
    plan.save(path)
    loaded = ShapePlan.load(path)
    assert loaded.bands == plan.bands
    assert plan_bands_tuple(loaded) == ((256, 384, 256), (256, 256),
                                        (384, 256))


def test_plan_without_bands_falls_back():
    plan = _tiny_plan()
    assert plan_bands_tuple(plan) is None


def test_make_kpconv_band_table_lookup():
    from weasal_tpu.models.blocks import _make_kpconv

    cfg = TinyConfig()
    cfg.pallas_band_table = {"conv": [512, 640, 768], "pool": [896, 1024]}
    kp = _make_kpconv(cfg, "resnetb", 16, 32, 1.25, layer_ind=1)
    assert kp.pallas_band == 640               # conv edge, level 1
    kp = _make_kpconv(cfg, "resnetb_strided", 16, 32, 1.25, layer_ind=1)
    assert kp.pallas_band == 1024              # pool edge, level 1
    cfg.pallas_band = 333                      # explicit override wins
    kp = _make_kpconv(cfg, "resnetb", 16, 32, 1.25, layer_ind=0)
    assert kp.pallas_band == 333
    cfg.pallas_band = 0
    cfg.pallas_band_table = None               # fallback -> auto (0)
    kp = _make_kpconv(cfg, "resnetb", 16, 32, 1.25, layer_ind=0)
    assert kp.pallas_band == 0
