"""DALES dataset family: multi-tile input pipeline + fused training step.

Mirrors the reference's DALES twins (datasets/DALES_WeakLabel.py,
datasets/DALES_PseudoLabel.py): no color/intensity feature
(in_features_dim 3 = [ones, absolute height, reduced height]), tile-indexed
splits, same weak-label machinery as Vaihingen.
"""


import numpy as np
import pytest

from weasal_tpu.config import Config
from weasal_tpu.data.datasets import DALESWLDataset
from weasal_tpu.data.synthetic import make_dales_like_root


class TinyDALESWL(DALESWLDataset):
    """Three synthetic tiles: train / validation / test."""
    cloud_names = ["5080_54435", "5085_54320", "test_5080_54400"]
    all_splits = [0, 1, 2]
    validation_split = 1

    def _test_split(self, test_on_train):
        return [0, 1] if test_on_train else [2]


class SynthDALESConfig(Config):
    dataset = "DALESWL"
    num_classes = None
    in_features_dim = 3
    first_features_dim = 16
    num_kernel_points = 15
    in_radius = 8.0
    sub_radius = 3.0
    first_subsampling_dl = 0.4
    conv_radius = 2.5
    architecture = ["simple", "resnetb", "resnetb_strided", "resnetb",
                    "resnetb_strided", "resnetb",
                    "nearest_upsample", "nearest_upsample"]
    batch_num = 2
    epoch_steps = 2
    validation_size = 1
    max_epoch = 1
    augment_rotation = "vertical"
    augment_scale_min = 0.9
    augment_scale_max = 1.1
    augment_noise = 0.01
    augment_symmetries = [True, True, False]
    augment_color = 0.7
    model_name = "KPFCNN_mprm"
    loss_type = "region_mprm_loss"
    anchor_method = "reduced"
    active_learning_iterations = 0
    subsample_labels = False
    initial_labels_per_file = 30
    subsample_method = "balanced"
    added_labels_per_epoch = 10
    device_pyramid = True
    saving = False


@pytest.fixture(scope="module")
def dales_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("dales") / "DALES")
    make_dales_like_root(root, extent=40.0, density=5.0, seed=3)
    return root


@pytest.fixture(scope="module")
def dales_ds(dales_root):
    cfg = SynthDALESConfig()
    return TinyDALESWL(cfg, split="training", data_root=dales_root,
                       rng=np.random.default_rng(0))


def test_dales_pipeline_shapes(dales_ds):
    """Feature layout = [ones, absolute z, reduced z] (no color),
    reference DALES_WeakLabel.py:529-536."""
    assert dales_ds.num_clouds == 1      # one training tile
    p = dales_ds.sample_sphere(np.random.default_rng(0), augment=False)
    f = p["features"]
    assert f.shape[1] == 3
    np.testing.assert_allclose(f[:, 0], 1.0)
    # absolute height = reduced height + center z
    np.testing.assert_allclose(f[:, 1] - f[:, 2], p["center"][2],
                               atol=1e-4)
    assert p["regions"]                  # weak sub-cloud labels exist


def test_dales_fused_training_step(dales_root, dales_ds):
    """One fused (device-pyramid) weak-label training epoch on DALES."""
    from weasal_tpu.train.trainer import ModelTrainer
    cfg = dales_ds.config
    trainer = ModelTrainer(cfg, dales_ds, stage_dir="WeakLabel")
    val_ds = TinyDALESWL(cfg, split="validation", data_root=dales_root,
                         rng=np.random.default_rng(1))
    trainer.train(dales_ds, val_ds, al_iteration=0)
    assert trainer.epoch == cfg.max_epoch


def test_dales_root_discovery(tmp_path):
    """A root WITHOUT the reference's 40 hardcoded tile names is discovered
    from its ply files: sorted test_* tiles form the test split, the
    lexically last remaining tile is the validation cloud, the rest train
    (_DALESBase.__init__; structure mirrors DALES_WeakLabel.py:64-130)."""
    root = str(tmp_path / "DALES")
    make_dales_like_root(root, extent=40.0, density=4.0, seed=7,
                         train_tiles=4, test_tiles=2)
    cfg = SynthDALESConfig()

    tr = DALESWLDataset(cfg, split="training", data_root=root,
                        rng=np.random.default_rng(0))
    assert tr.cloud_names_split == ["tile_00", "tile_01", "tile_02"]
    va = DALESWLDataset(cfg, split="validation", data_root=root,
                        load_data=False)
    assert [tr.cloud_names[i] for i in range(len(tr.cloud_names))
            if va._in_split(i)] == ["tile_03"]
    te = DALESWLDataset(cfg, split="test", data_root=root, load_data=False)
    assert [te.cloud_names[i] for i in range(len(te.cloud_names))
            if te._in_split(i)] == ["test_tile_00", "test_tile_01"]
    tt = DALESWLDataset(cfg, split="test", test_on_train=True,
                        data_root=root, load_data=False)
    assert [tt.cloud_names[i] for i in range(len(tt.cloud_names))
            if tt._in_split(i)] == ["tile_00", "tile_01", "tile_02"]
    # per-cloud anchor ledgers: one per training cloud
    assert len(tr.anchors) == 3 or tr.num_clouds == 3
