"""Checkpoint save/restore/finetune semantics."""

import os

import numpy as np
import jax
import pytest

from weasal_tpu.data.synthetic import make_vaihingen_like_root
from weasal_tpu.data.datasets import Vaihingen3DWLDataset
from weasal_tpu.train.trainer import ModelTrainer
from tests.test_datasets import SynthWLConfig


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    wd = tmp_path_factory.mktemp("ckpt")
    root = str(wd / "Vaihingen3D")
    make_vaihingen_like_root(root, extent=30.0, density=5.0, seed=3)
    cfg = SynthWLConfig()
    cfg.max_epoch = 1
    cfg.epoch_steps = 2
    cfg.validation_size = 1
    cfg.saving = True
    cfg.saving_path = str(wd / "log")
    ds = Vaihingen3DWLDataset(cfg, split="training", data_root=root,
                              rng=np.random.default_rng(0))
    return cfg, ds, wd


def test_checkpoint_roundtrip_and_finetune(setup):
    cfg, ds, wd = setup
    trainer = ModelTrainer(cfg, ds, stage_dir="WeakLabel")
    trainer.train(ds, None, al_iteration=0)
    chkp = os.path.join(cfg.saving_path, "checkpoints", "current_chkp.tar")
    assert os.path.exists(chkp)
    assert trainer.epoch == 1

    # Full restore: epoch + optimizer state come back
    cfg2 = SynthWLConfig()
    cfg2.num_classes = cfg.num_classes
    cfg2.max_epoch = 1
    cfg2.epoch_steps = 2
    cfg2.validation_size = 1
    cfg2.saving = False
    restored = ModelTrainer(cfg2, ds, chkp_path=chkp)
    assert restored.epoch == 1
    a = jax.tree_util.tree_leaves(trainer.state.params)[0]
    b = jax.tree_util.tree_leaves(restored.state.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Momentum buffers restored too
    oa = jax.tree_util.tree_leaves(trainer.state.opt_state)[0]
    ob = jax.tree_util.tree_leaves(restored.state.opt_state)[0]
    np.testing.assert_array_equal(np.asarray(oa), np.asarray(ob))

    # Finetune: weights restored, epoch reset
    fine = ModelTrainer(cfg2, ds, chkp_path=chkp, finetune=True)
    assert fine.epoch == 0
    fa = jax.tree_util.tree_leaves(fine.state.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(fa))


def test_kill_file_stops_training(setup):
    cfg, ds, wd = setup
    cfg3 = SynthWLConfig()
    cfg3.num_classes = cfg.num_classes
    cfg3.max_epoch = 50          # would run long
    cfg3.epoch_steps = 2
    cfg3.validation_size = 1
    cfg3.saving = True
    cfg3.saving_path = str(wd / "log_kill")
    trainer = ModelTrainer(cfg3, ds, stage_dir="WeakLabel")

    # Delete the PID file from a side thread after a short delay
    import threading
    import time

    pid_file = os.path.join(cfg3.saving_path, "running_PID.txt")

    def killer():
        for _ in range(600):
            if os.path.exists(pid_file):
                os.remove(pid_file)
                return
            time.sleep(0.1)

    t = threading.Thread(target=killer)
    t.start()
    trainer.train(ds, None, al_iteration=0)
    t.join()
    # Stopped early thanks to the kill switch
    assert trainer.epoch < 50
