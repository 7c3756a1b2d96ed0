"""End-to-end pipeline smoke test on synthetic data (CPU).

Runs the full reference workflow at miniature scale:
  WL training -> voting test on the train split (pseudo-label generation)
  -> pseudo-label refinement -> PL training -> artifacts check.
"""

import os
import pickle

import numpy as np
import pytest

from weasal_tpu.config import Config
from weasal_tpu.data.datasets import (
    Vaihingen3DPLDataset, Vaihingen3DWLDataset)
from weasal_tpu.data.synthetic import make_vaihingen_like_root
from weasal_tpu.train.refinement import refine_pseudo_labels
from weasal_tpu.train.tester import ModelTester
from weasal_tpu.train.trainer import ModelTrainer


class E2EWLConfig(Config):
    dataset = "Vaihingen3DWL"
    num_classes = None
    in_features_dim = 4
    first_features_dim = 16
    num_kernel_points = 15
    in_radius = 7.0
    sub_radius = 2.5
    first_subsampling_dl = 0.45
    conv_radius = 2.5
    architecture = ["simple", "resnetb", "resnetb_strided", "resnetb",
                    "resnetb_strided", "resnetb",
                    "nearest_upsample", "nearest_upsample"]
    batch_num = 2
    max_epoch = 1
    epoch_steps = 3
    validation_size = 2
    checkpoint_gap = 10
    learning_rate = 0.01
    momentum = 0.98
    lr_decays = {i: 0.98 for i in range(1, 100)}
    grad_clip_norm = 1.0
    augment_rotation = "vertical"
    augment_noise = 0.01
    augment_symmetries = [True, True, False]
    augment_color = 0.7
    class_w = [1.0] * 9
    model_name = "KPFCNN_mprm"
    loss_type = "region_mprm_loss"
    anchor_method = "reduced"
    active_learning_iterations = 1
    initial_labels_per_file = 40
    subsample_method = "balanced"
    added_labels_per_epoch = 5
    subsample_labels = True
    saving = True
    saving_path = None


class E2EPLConfig(Config):
    dataset = "Vaihingen3DPL"
    num_classes = None
    in_features_dim = 4
    first_features_dim = 16
    num_kernel_points = 15
    in_radius = 7.0
    first_subsampling_dl = 0.45
    conv_radius = 2.5
    architecture = ["simple", "resnetb", "resnetb_strided", "resnetb",
                    "resnetb_strided", "resnetb",
                    "nearest_upsample", "unary", "nearest_upsample", "unary"]
    batch_num = 2
    max_epoch = 1
    epoch_steps = 2
    validation_size = 1
    checkpoint_gap = 10
    learning_rate = 0.01
    momentum = 0.98
    grad_clip_norm = 100.0
    augment_rotation = "vertical"
    augment_noise = 0.01
    augment_symmetries = [True, True, False]
    augment_color = 0.7
    dropout = 0.5
    contrast_start = 0
    contrast_thd = 20
    model_name = "KPFCNN"
    active_learning_iterations = 1
    added_labels_per_epoch = 20
    saving = True
    saving_path = None


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    wd = tmp_path_factory.mktemp("e2e")
    root = str(wd / "data" / "Vaihingen3D")
    make_vaihingen_like_root(root, extent=30.0, density=5.0, seed=7)
    cwd = os.getcwd()
    os.chdir(wd)
    yield wd
    os.chdir(cwd)


@pytest.mark.slow
def test_full_pipeline(workdir):
    data_root = "data/Vaihingen3D"

    # ---------------- Stage 1: WeakLabel training ----------------
    cfg = E2EWLConfig()
    train_ds = Vaihingen3DWLDataset(cfg, split="training",
                                    data_root=data_root,
                                    rng=np.random.default_rng(0))
    val_ds = Vaihingen3DWLDataset(cfg, split="validation",
                                  data_root=data_root,
                                  rng=np.random.default_rng(1))
    cfg.saving_path = "results/WeakLabel/Log_e2e"
    trainer = ModelTrainer(cfg, train_ds, stage_dir="WeakLabel")
    trainer.train(train_ds, val_ds, al_iteration=0)

    log_dir = cfg.saving_path
    assert os.path.exists(os.path.join(log_dir, "parameters.txt"))
    assert os.path.exists(os.path.join(log_dir,
                                       "training_iteration0.txt"))
    assert os.path.exists(os.path.join(log_dir, "val_IoUs.txt"))
    chkp = os.path.join(log_dir, "checkpoints", "current_chkp.tar")
    assert os.path.exists(chkp)
    with open(os.path.join(log_dir, "training_iteration0.txt")) as f:
        lines = f.readlines()
    assert lines[0].startswith("epochs steps out_loss")
    assert len(lines) > 1  # at least one training step logged

    # Reference Config must parse our parameters.txt (stage interop)
    import sys
    sys.path.insert(0, "/root/reference")
    try:
        from utils.config import Config as RefConfig
        ref_cfg = RefConfig()
        ref_cfg.load(log_dir)
        assert ref_cfg.dataset == "Vaihingen3DWL"
        assert ref_cfg.num_layers == 3
    finally:
        sys.path.pop(0)

    # ---------------- Stage 2: test on train (pseudo-label gen) ---------
    test_ds = Vaihingen3DWLDataset(cfg, split="test", test_on_train=True,
                                   data_root=data_root,
                                   rng=np.random.default_rng(2))
    tester = ModelTester(cfg, test_ds, chkp)
    tester.cloud_segmentation_test(test_ds, num_votes=0,
                                   test_on_train=True,
                                   stage_dir="WeakLabel")
    test_dir = os.path.join("test/WeakLabel", "Log_e2e")
    pred_ply = os.path.join(test_dir, "predictions",
                            "Vaihingen3D_Training.ply")
    assert os.path.exists(pred_ply)
    assert os.path.exists(os.path.join(test_dir, "probs",
                                       "Vaihingen3D_Training.ply"))
    assert os.path.exists(os.path.join(test_dir, "_pseudo.pickle"))

    # ---------------- Stage 2b: WL active-learning acquisition ----------
    sub_file = os.path.join(train_ds.tree_path,
                            "Vaihingen3D_Training_subsampled_anchors.pkl")
    with open(sub_file, "rb") as f:
        before = len(pickle.load(f))
    al_ds = Vaihingen3DWLDataset(cfg, split="test", test_on_train=True,
                                 data_root=data_root,
                                 rng=np.random.default_rng(3))
    al_tester = ModelTester(cfg, al_ds, chkp)
    al_tester.cloud_segmentation_test(al_ds, num_votes=0,
                                      active_learning=True,
                                      test_on_train=True)
    with open(sub_file, "rb") as f:
        after = len(pickle.load(f))
    assert after == before + cfg.added_labels_per_epoch

    # ---------------- Stage 3: refinement ----------------
    out_dir = refine_pseudo_labels("Log_e2e", threshold=20,
                                   data_root=data_root)
    pseudo_txt = os.path.join(
        out_dir, "Vaihingen3D_Training_t20_pseudo.txt")
    assert os.path.exists(pseudo_txt)
    pseudo = np.genfromtxt(pseudo_txt).astype(int)
    assert set(np.unique(pseudo)).issubset(set(range(9)) | {10})
    weight_file = os.path.join(out_dir, "Vaihingen3D_t20_weight.txt")
    assert os.path.exists(weight_file)

    # ---------------- Stage 4: PseudoLabel training ----------------
    pl_cfg = E2EPLConfig()
    pl_cfg.weak_label_log = "Log_e2e"
    pl_cfg.class_w = list(np.genfromtxt(weight_file, delimiter=" "))
    pl_train = Vaihingen3DPLDataset(pl_cfg, split="training",
                                    data_root=data_root,
                                    rng=np.random.default_rng(4))
    pl_cfg.saving_path = "results/PseudoLabel/Log_e2e_pl"
    pl_trainer = ModelTrainer(pl_cfg, pl_train, stage_dir="PseudoLabel")
    pl_trainer.train(pl_train, None, al_iteration=0)
    assert os.path.exists(os.path.join(
        pl_cfg.saving_path, "checkpoints", "current_chkp.tar"))
    with open(os.path.join(pl_cfg.saving_path,
                           "training_iteration0.txt")) as f:
        pl_lines = f.readlines()
    assert "ground truth labels" in pl_lines[0]
    assert len(pl_lines) > 1

    # ---------------- Stage 5: PL AL point acquisition ----------------
    pl_chkp = os.path.join(pl_cfg.saving_path, "checkpoints",
                           "current_chkp.tar")
    pl_test_ds = Vaihingen3DPLDataset(pl_cfg, split="test",
                                      test_on_train=True,
                                      data_root=data_root,
                                      rng=np.random.default_rng(5))
    pl_tester = ModelTester(pl_cfg, pl_test_ds, pl_chkp)
    pl_tester.cloud_segmentation_test(pl_test_ds, num_votes=0,
                                      active_learning=True,
                                      test_on_train=True,
                                      stage_dir="PseudoLabel")
    gt_file = os.path.join(pl_train.tree_path,
                           "Vaihingen3D_Training_al_groundTruth_IDs.pkl")
    with open(gt_file, "rb") as f:
        gt_ids = pickle.load(f)
    assert len(gt_ids) == pl_cfg.added_labels_per_epoch
