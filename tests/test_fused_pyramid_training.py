"""Fused device-pyramid training: the whole step as one jitted program."""

import os

import numpy as np
import pytest

from weasal_tpu.data.datasets import Vaihingen3DWLDataset
from weasal_tpu.data.level0 import Level0BatchSource
from weasal_tpu.data.synthetic import make_vaihingen_like_root
from weasal_tpu.train.trainer import ModelTrainer
from tests.test_datasets import SynthWLConfig


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    wd = tmp_path_factory.mktemp("fused")
    root = str(wd / "Vaihingen3D")
    make_vaihingen_like_root(root, extent=30.0, density=5.0, seed=5)
    cfg = SynthWLConfig()
    cfg.device_pyramid = True
    cfg.max_epoch = 1
    cfg.epoch_steps = 2
    cfg.validation_size = 1
    cfg.saving = True
    cfg.saving_path = str(wd / "log")
    ds = Vaihingen3DWLDataset(cfg, split="training", data_root=root,
                              rng=np.random.default_rng(0))
    return cfg, ds


def test_level0_batch_shapes(setup):
    cfg, ds = setup
    plan = ds.calibration()
    src = Level0BatchSource(ds, plan)
    arrays, metas = src.next_batch(np.random.default_rng(0), plan)
    assert arrays["points0"].shape == (2, plan.num_points[0], 3)
    assert arrays["features"].shape[2] == 4
    assert arrays["rotations"].shape == (2, 3, 3)
    assert arrays["region_masks"].any()
    # Rotations are proper vertical-axis rotations
    R = arrays["rotations"][0]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
    np.testing.assert_allclose(R[2], [0, 0, 1], atol=1e-7)


def test_fused_training_runs(setup):
    cfg, ds = setup
    trainer = ModelTrainer(cfg, ds, stage_dir="WeakLabel")
    trainer.train(ds, None, al_iteration=0)
    log = os.path.join(cfg.saving_path, "training_iteration0.txt")
    rows = open(log).readlines()[1:]
    assert len(rows) >= 1
    losses = [float(r.split()[2]) for r in rows]
    assert all(np.isfinite(losses))
    assert os.path.exists(os.path.join(cfg.saving_path, "checkpoints",
                                       "current_chkp.tar"))


def test_fused_eval_paths(setup, tmp_path):
    """Validation and the voting tester run through the fused
    (device-pyramid) eval step when config.device_pyramid is on."""
    cfg, ds = setup
    from weasal_tpu.data.datasets import Vaihingen3DWLDataset
    from weasal_tpu.train.tester import ModelTester

    val_ds = Vaihingen3DWLDataset(cfg, split="validation",
                                  data_root=ds.path,
                                  rng=np.random.default_rng(1))
    trainer = ModelTrainer(cfg, ds, stage_dir="WeakLabel")
    miou = trainer.cloud_segmentation_validation(val_ds)
    assert np.isfinite(miou)

    chkp = os.path.join(cfg.saving_path, "checkpoints", "current_chkp.tar")
    if not os.path.exists(chkp):
        trainer.save_checkpoint(os.path.dirname(chkp))
    test_ds = Vaihingen3DWLDataset(cfg, split="test", test_on_train=True,
                                   data_root=ds.path,
                                   rng=np.random.default_rng(2))
    saved_saving = cfg.saving
    cfg.saving = False
    try:
        tester = ModelTester(cfg, test_ds, chkp)
        probs = tester.cloud_segmentation_test(test_ds, num_votes=0,
                                               test_on_train=True)
    finally:
        cfg.saving = saved_saving
    assert all(np.isfinite(p).all() for p in probs)
    assert any(p.any() for p in probs)


def test_vote_resume_matches_uninterrupted(setup, monkeypatch, tmp_path):
    """A vote interrupted mid-run and resumed from its checkpoint produces
    bit-identical probs to an uninterrupted vote.

    This is the recovery path for the two observed mid-vote killers on the
    TPU platform: wedged tunnel RPCs (stall watchdog) and the tunnel
    client's per-dispatch host memory leak (resumable.sh RSS guard) — both
    rerun test_models.py with --resume.
    """
    import weasal_tpu.data.loader as loader_mod
    from weasal_tpu.data.datasets import Vaihingen3DWLDataset
    from weasal_tpu.train.tester import ModelTester

    cfg, ds = setup
    chkp = os.path.join(cfg.saving_path, "checkpoints", "current_chkp.tar")
    assert os.path.exists(chkp)   # test_fused_training_runs ran first
    vote_chkp = os.path.join(cfg.saving_path, "vote_chkp_train.pkl")
    monkeypatch.chdir(tmp_path)               # tester artifacts -> tmp
    monkeypatch.setattr(cfg, "validation_size", 4)   # faster vote epochs

    def run(resume=False):
        test_ds = Vaihingen3DWLDataset(cfg, split="test", test_on_train=True,
                                       data_root=ds.path,
                                       rng=np.random.default_rng(2))
        tester = ModelTester(cfg, test_ds, chkp)
        return tester.cloud_segmentation_test(test_ds, num_votes=1,
                                              test_on_train=True,
                                              resume=resume)

    # Reference: uninterrupted run. Completion must clean up its checkpoint.
    ref_probs = run()
    assert not os.path.exists(vote_chkp)

    # Interrupted run: die at the start of the first epoch AFTER a vote
    # checkpoint exists (the per-epoch prefetcher build is the seam).
    class Interrupted(Exception):
        pass

    real_prefetcher = loader_mod.BatchPrefetcher

    def bombing_prefetcher(*a, **k):
        if os.path.exists(vote_chkp):
            raise Interrupted()
        return real_prefetcher(*a, **k)

    monkeypatch.setattr(loader_mod, "BatchPrefetcher", bombing_prefetcher)
    with pytest.raises(Interrupted):
        run()
    monkeypatch.setattr(loader_mod, "BatchPrefetcher", real_prefetcher)
    assert os.path.exists(vote_chkp)

    # Resume: restored potentials/rng/probs replay the remaining epochs
    # exactly as the uninterrupted run did.
    res_probs = run(resume=True)
    assert not os.path.exists(vote_chkp)
    for r, p in zip(ref_probs, res_probs):
        np.testing.assert_array_equal(r, p)
