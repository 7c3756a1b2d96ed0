"""Size-bucketed shape plans (config.plan_bucket_percentile, VERDICT r3
#4): calibration derives a small-sphere bucket, the resident batch source
groups sampled spheres into size-homogeneous batches, the prefetcher keeps
scan packs homogeneous, and the trainer dispatches per-batch to the step
compiled at that bucket's budgets. Nothing is cropped — quality semantics
are identical to the single-plan path; only the padding differs."""

import os

import numpy as np
import pytest

from weasal_tpu.config import Config
from weasal_tpu.data.batching import ShapePlan, calibrate_shape_plan
from weasal_tpu.data.datasets import Vaihingen3DWLDataset
from weasal_tpu.data.resident import ResidentBatchSource
from weasal_tpu.data.synthetic import make_vaihingen_like_root
from weasal_tpu.train.trainer import ModelTrainer
from tests.test_datasets import SynthWLConfig


def test_calibrate_small_bucket():
    """Bimodal sphere sizes -> a small bucket whose budgets cover every
    sphere at or below the cut, per level, without proportional scaling."""
    cfg = Config()
    cfg.num_layers = 3
    cfg.in_radius = 6.0
    cfg.first_subsampling_dl = 0.3
    rng = np.random.default_rng(0)
    small = [rng.uniform(-3, 3, (n, 3)).astype(np.float32)
             for n in (300, 350, 400, 450, 500, 550, 600, 650)]
    large = [rng.uniform(-3, 3, (n, 3)).astype(np.float32)
             for n in (4000, 5000)]
    plan = calibrate_shape_plan(small + large, cfg, bucket_percentile=80.0)
    assert plan.small is not None
    cut = plan.small["cut"]
    sp = plan.small["num_points"]
    assert sp[0] > cut                       # every routed sphere fits
    assert sp[0] < plan.num_points[0]        # and the bucket is smaller
    assert all(s <= n for s, n in zip(sp, plan.num_points))

    sub = plan.derive_small()
    assert isinstance(sub, ShapePlan)
    assert sub.num_points == sp
    assert sub.conv_neighbors == plan.conv_neighbors
    assert sub.bands is plan.bands           # shared (self-tune widens both)

    # off by default / disabled when degenerate
    assert calibrate_shape_plan(small + large, cfg).small is None
    uniform = [rng.uniform(-3, 3, (500, 3)).astype(np.float32)
               for _ in range(10)]
    p_uni = calibrate_shape_plan(uniform, cfg, bucket_percentile=80.0)
    if p_uni.small is not None:              # allowed only if truly smaller
        assert p_uni.small["num_points"][0] < p_uni.num_points[0]


def test_prefetcher_packs_stay_homogeneous():
    """pack=K with a bucketed source: no pack mixes shapes/buckets."""
    from weasal_tpu.data.loader import BatchPrefetcher

    class FakeSource:
        """Emits batches tagged small/large in an interleaved pattern."""
        seq = ["small", "large", "small", "small", "large", "small",
               "large", "large", "small"]

        def __init__(self):
            self.i = 0

        def next_batch(self, rng, plan, num_spheres=None, augment=None):
            tag = self.seq[self.i % len(self.seq)]
            self.i += 1
            n = 8 if tag == "small" else 16
            batch = {"x": np.full((2, n), self.i, np.float32)}
            metas = [{"bucket": tag, "has_regions": True}]
            return batch, metas

    pf = BatchPrefetcher(FakeSource(), plan=None, num_batches=9,
                         rng=np.random.default_rng(0), to_device=False,
                         pack=2)
    packs = list(pf)
    assert packs                             # flushed tails included
    seen = {"small": 0, "large": 0}
    for stacked, metas_list in packs:
        tags = {m[0]["bucket"] for m in metas_list}
        assert len(tags) == 1                # homogeneous pack
        tag = tags.pop()
        n = 8 if tag == "small" else 16
        assert stacked["x"].shape == (2, 2, n)
        assert stacked["do_step"].shape == (2,)
        seen[tag] += int(stacked["do_step"].sum())
    assert seen == {"small": 5, "large": 4}  # every batch delivered once


@pytest.fixture(scope="module")
def bucket_setup(tmp_path_factory):
    wd = tmp_path_factory.mktemp("buckets")
    root = str(wd / "Vaihingen3D")
    # Two districts -> structurally varied sphere sizes
    make_vaihingen_like_root(root, extent=40.0, density=5.0, seed=21,
                             districts=2)
    cfg = SynthWLConfig()
    cfg.device_pyramid = True
    cfg.resident_clouds = True
    cfg.plan_bucket_percentile = 70.0
    cfg.max_epoch = 1
    cfg.epoch_steps = 6
    cfg.validation_size = 1
    cfg.saving = True
    cfg.saving_path = str(wd / "log")
    ds = Vaihingen3DWLDataset(cfg, split="training", data_root=root,
                              rng=np.random.default_rng(0))
    return cfg, ds, str(wd)


def test_bucketed_source_groups_spheres(bucket_setup):
    cfg, ds, _ = bucket_setup
    plan = ds.calibration()
    if plan.small is None:
        pytest.skip("synthetic root too uniform for a bucket at p70")
    src = ResidentBatchSource(ds, plan, bucketed=True)
    rng = np.random.default_rng(3)
    cut = plan.small["cut"]
    n_small = n_large = 0
    for _ in range(6):
        arrays, metas = src.next_batch(rng)
        tags = {m["bucket"] for m in metas}
        assert len(tags) == 1
        tag = tags.pop()
        n0 = arrays["flat_inds"].shape[1]
        if tag == "small":
            n_small += 1
            assert n0 == plan.small["num_points"][0]
            assert all(m["n_real"] <= cut for m in metas)
        else:
            n_large += 1
            assert n0 == plan.num_points[0]
    assert n_small + n_large == 6


def test_bucketed_training_runs_both_steps(bucket_setup):
    """One fused epoch with buckets on: trainer compiles both steps and
    the epoch trains to completion with finite loss."""
    cfg, ds, wd = bucket_setup
    trainer = ModelTrainer(cfg, ds, stage_dir="WeakLabel")
    if trainer.plan_small is None:
        pytest.skip("synthetic root too uniform for a bucket at p70")
    assert set(trainer._train_steps) == {"large", "small"}
    assert (trainer.plan_small.num_points[0]
            < trainer.plan.num_points[0])
    trainer.train(ds, None, al_iteration=0)
    assert trainer.epoch == cfg.max_epoch
    rows = open(os.path.join(cfg.saving_path,
                             "training_iteration0.txt")).readlines()[1:]
    assert len(rows) >= 4
    assert all(np.isfinite(float(r.split()[2])) for r in rows)
