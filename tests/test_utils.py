"""Tests for PLY I/O, metrics, and the config round-trip."""

import numpy as np
import pytest

from weasal_tpu.utils.ply import read_ply, write_ply
from weasal_tpu.utils.metrics import (
    fast_confusion, IoU_from_confusions, metrics_from_confusions)
from weasal_tpu.config import Config


def test_ply_roundtrip_binary(tmp_path):
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    intensity = rng.integers(0, 255, size=100).astype(np.uint8)
    labels = rng.integers(0, 9, size=100).astype(np.int32)

    path = str(tmp_path / "cloud.ply")
    write_ply(path, [pts, intensity, labels],
              ["x", "y", "z", "intensity", "class"])
    data = read_ply(path)

    assert data.dtype.names == ("x", "y", "z", "intensity", "class")
    np.testing.assert_allclose(
        np.vstack((data["x"], data["y"], data["z"])).T, pts)
    np.testing.assert_array_equal(data["intensity"], intensity)
    np.testing.assert_array_equal(data["class"], labels)


def test_ply_roundtrip_ascii(tmp_path):
    pts = np.arange(12, dtype=np.float32).reshape(4, 3)
    path = str(tmp_path / "a.ply")
    write_ply(path, pts, ["x", "y", "z"], as_ascii=True)
    data = read_ply(path)
    np.testing.assert_allclose(
        np.vstack((data["x"], data["y"], data["z"])).T, pts)


def test_ply_reads_reference_disposition():
    # The checked-in kernel disposition must parse (written by the reference's
    # own writer; binary little-endian, 3 float properties).
    import os
    path = os.path.join(os.path.dirname(__file__), "..",
                        "weasal_tpu", "kernels", "dispositions",
                        "k_015_center_3D.ply")
    if not os.path.exists(path):
        pytest.skip("disposition asset not present yet")
    data = read_ply(path)
    pts = np.vstack((data["x"], data["y"], data["z"])).T
    assert pts.shape == (15, 3)
    # Center point is fixed at the origin
    assert np.linalg.norm(pts[0]) < 1e-6


def test_fast_confusion_contiguous():
    true = np.array([0, 0, 1, 2, 2, 2], dtype=np.int32)
    pred = np.array([0, 1, 1, 2, 2, 0], dtype=np.int32)
    C = fast_confusion(true, pred, np.arange(3, dtype=np.int32))
    expected = np.array([[1, 1, 0], [0, 1, 0], [1, 0, 2]])
    np.testing.assert_array_equal(C, expected)


def test_fast_confusion_non_contiguous():
    # Label set {0..8, 10} like the PseudoLabel datasets
    labels = np.array([0, 5, 10], dtype=np.int32)
    true = np.array([0, 5, 10, 10], dtype=np.int32)
    pred = np.array([0, 10, 10, 5], dtype=np.int32)
    C = fast_confusion(true, pred, labels)
    expected = np.array([[1, 0, 0], [0, 0, 1], [0, 1, 1]])
    np.testing.assert_array_equal(C, expected)


def test_iou_from_confusions_absent_class():
    # One class absent from ground truth gets the mIoU substituted
    C = np.array([[5, 0, 0], [0, 5, 5], [0, 0, 0]], dtype=np.float64)
    IoU = IoU_from_confusions(C)
    # class0: 5/5 = 1.0 ; class1: 5/10 = 0.5 ; class2 absent -> (1+0.5)/2
    np.testing.assert_allclose(IoU[:2], [1.0, 0.5], atol=1e-5)
    np.testing.assert_allclose(IoU[2], 0.75, atol=1e-4)


def test_metrics_orientation():
    # 10 true zeros, model predicts 5 of them as class1 and all of class1 right
    C = np.array([[5, 5], [0, 10]], dtype=np.float64)
    PRE, REC, F1, IoU, ACC = metrics_from_confusions(C)
    np.testing.assert_allclose(PRE, [5 / 5, 10 / 15], atol=1e-5)
    np.testing.assert_allclose(REC, [5 / 10, 10 / 10], atol=1e-5)
    np.testing.assert_allclose(ACC, 15 / 20, atol=1e-5)


class _DemoConfig(Config):
    dataset = "Vaihingen3DWL"
    architecture = ["simple", "resnetb", "resnetb_strided", "resnetb",
                    "resnetb_strided", "resnetb",
                    "nearest_upsample", "nearest_upsample"]
    num_classes = 9
    in_features_dim = 4
    first_subsampling_dl = 0.24
    in_radius = 18.0
    lr_decays = {i: 0.98 for i in range(1, 5)}
    class_w = [1.0] * 9
    sub_radius = 5.0
    model_name = "KPFCNN_mprm"
    loss_type = "region_mprm_loss"
    anchor_method = "reduced"
    active_learning_iterations = 2
    initial_labels_per_file = 60
    subsample_method = "balanced"
    added_labels_per_epoch = 20
    subsample_labels = True
    dropout = 0.5


def test_config_derived_fields():
    cfg = _DemoConfig()
    assert cfg.num_layers == 3
    assert cfg.deform_layers == [False, False, False]


def test_config_roundtrip(tmp_path):
    cfg = _DemoConfig()
    cfg.saving_path = str(tmp_path)
    cfg.save()

    loaded = Config()
    loaded.load(str(tmp_path))
    assert loaded.dataset == "Vaihingen3DWL"
    assert loaded.architecture == _DemoConfig.architecture
    assert loaded.num_layers == 3
    assert loaded.num_classes == 9
    assert loaded.in_features_dim == 4
    assert abs(loaded.first_subsampling_dl - 0.24) < 1e-9
    assert abs(loaded.in_radius - 18.0) < 1e-9
    assert loaded.lr_decays == {i: pytest.approx(0.98) for i in range(1, 5)}
    assert loaded.model_name == "KPFCNN_mprm"
    assert loaded.loss_type == "region_mprm_loss"
    assert loaded.anchor_method == "reduced"
    assert loaded.active_learning_iterations == 2
    assert loaded.subsample_labels is True
    assert loaded.initial_labels_per_file == 60
    assert loaded.subsample_method == "balanced"
    assert loaded.added_labels_per_epoch == 20
    assert abs(loaded.sub_radius - 5.0) < 1e-9
    assert abs(loaded.dropout - 0.5) < 1e-9
    assert len(loaded.class_w) == 9
