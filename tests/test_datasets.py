"""Data-layer tests on synthetic Vaihingen-like scenes.

Exercises the full host pipeline: raw ply -> prepare -> subsample caches ->
anchors -> potential sphere sampling -> shape-plan calibration -> dense
batch -> model forward.
"""

import os
import pickle

import numpy as np
import pytest

from weasal_tpu.config import Config
from weasal_tpu.data.anchors import (
    anchors_with_points, get_anchors, subsample_anchors, update_anchors,
    weak_label_masks)
from weasal_tpu.data.datasets import (
    Vaihingen3DPLDataset, Vaihingen3DWLDataset)
from weasal_tpu.data.synthetic import make_vaihingen_like_root


class SynthWLConfig(Config):
    dataset = "Vaihingen3DWL"
    num_classes = None
    in_features_dim = 4
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
    epoch_steps = 4
    validation_size = 2
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


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("vaih") / "Vaihingen3D")
    make_vaihingen_like_root(root, extent=40.0, density=6.0, seed=1)
    return root


@pytest.fixture(scope="module")
def wl_dataset(synth_root):
    cfg = SynthWLConfig()
    return Vaihingen3DWLDataset(cfg, split="training", data_root=synth_root,
                                rng=np.random.default_rng(0))


class TestAnchors:

    def test_anchor_grid_and_labels(self):
        rng = np.random.default_rng(0)
        pts = rng.uniform(0, 10, size=(500, 3)).astype(np.float32)
        labels = rng.integers(0, 4, 500)
        from sklearn.neighbors import KDTree
        tree = KDTree(pts)
        anchors = get_anchors(pts, 2.0, method="full")
        a, atree, adict, albs = anchors_with_points(tree, anchors, labels,
                                                    2.0, 4)
        assert a.shape[0] == len(adict) == len(albs)
        # Every kept anchor has points and a valid multi-hot label
        for i in adict:
            inds = adict[i][0][0]
            assert inds.size > 0
            expect = np.zeros(4)
            expect[np.unique(labels[inds])] = 1
            np.testing.assert_array_equal(albs[i], expect)

    def test_update_anchors_creates_intersections(self):
        # Two overlapping anchors with different labels -> AND anchor
        pts = np.array([[0, 0, 0], [1, 0, 0], [2, 0, 0]], dtype=np.float32)
        labels = np.array([0, 1, 2])
        from sklearn.neighbors import KDTree
        tree = KDTree(pts)
        anchors = np.array([[0.4, 0, 0], [1.6, 0, 0]])
        a, atree, adict, albs = anchors_with_points(tree, anchors, labels,
                                                    1.1, 3)
        n_before = len(adict)
        a2, _, adict2, albs2 = update_anchors(tree, a, atree, adict, albs,
                                              1.0)
        assert len(adict2) == n_before + 1
        new_lb = albs2[n_before]
        np.testing.assert_array_equal(
            new_lb, albs[0] * albs[1])

    def test_subsample_methods(self):
        rng = np.random.default_rng(1)
        pts = rng.uniform(0, 20, size=(2000, 3)).astype(np.float32)
        labels = rng.integers(0, 5, 2000)
        from sklearn.neighbors import KDTree
        tree = KDTree(pts)
        anchors = get_anchors(pts, 3.0, method="full")
        a, atree, adict, albs = anchors_with_points(tree, anchors, labels,
                                                    3.0, 5)
        for method in ["regular", "random", "balanced"]:
            sub_a, _, sub_d, sub_l, inds = subsample_anchors(
                a, adict, albs, 10, method)
            assert sub_a.shape[0] == 10
            assert len(sub_d) == len(sub_l) == 10
            assert all(0 <= i < a.shape[0] for i in inds)

    def test_weak_label_masks(self):
        adict = {0: [[np.array([0, 1])], [None]],
                 1: [[np.array([1, 2])], [None]]}
        albs = {0: np.array([1, 1, 0]), 1: np.array([0, 1, 1])}
        masks = weak_label_masks(adict, albs, 4, 3)
        np.testing.assert_array_equal(masks[0], [1, 1, 0])
        np.testing.assert_array_equal(masks[1], [0, 1, 0])  # AND of both
        np.testing.assert_array_equal(masks[2], [0, 1, 1])
        np.testing.assert_array_equal(masks[3], [1, 1, 1])  # untouched


class TestWLDataset:

    def test_caches_created(self, wl_dataset, synth_root):
        tp = wl_dataset.tree_path
        assert os.path.exists(
            os.path.join(tp, "Vaihingen3D_Training_KDTree.pkl"))
        assert os.path.exists(
            os.path.join(tp, "Vaihingen3D_Training.ply"))
        assert os.path.exists(
            os.path.join(tp, "Vaihingen3D_Training_coarse_KDTree.pkl"))
        assert os.path.exists(
            os.path.join(tp, "Vaihingen3D_Training_anchors_reduced.pkl"))
        assert wl_dataset.num_clouds == 1
        assert wl_dataset.config.num_classes == 9

    def test_sphere_payload(self, wl_dataset):
        rng = np.random.default_rng(1)
        p = wl_dataset.sample_sphere(rng)
        assert p["points"].shape[0] == p["features"].shape[0] \
            == p["labels"].shape[0]
        assert p["features"].shape[1] == 4
        # Feature columns: ones, intensity in [0,1], abs height, red height
        np.testing.assert_allclose(p["features"][:, 0], 1.0)
        assert p["regions"] is not None and len(p["regions"]) > 0
        for inds, lb in p["regions"]:
            assert inds.max() < p["points"].shape[0]
            assert lb.shape == (9,)

    def test_potentials_advance(self, wl_dataset):
        rng = np.random.default_rng(2)
        before = wl_dataset.min_potential()
        for _ in range(5):
            wl_dataset.sample_sphere(rng)
        assert wl_dataset.min_potential() >= before

    def test_calibration_and_batch_forward(self, wl_dataset):
        import jax
        from weasal_tpu.models.architectures import KPFCNN_mprm
        from weasal_tpu.models import losses

        plan = wl_dataset.calibration(num_samples=6)
        assert plan.num_layers == 3
        assert plan.max_regions > 0

        rng = np.random.default_rng(3)
        batch, metas = wl_dataset.next_batch(rng, plan)
        assert batch.features.shape[0] == 2
        assert len(metas) == 2
        assert batch.features.shape[1] == plan.num_points[0]

        cfg = wl_dataset.config
        from weasal_tpu.models.init import jit_init
        model = KPFCNN_mprm(cfg, tuple(range(9)), ())
        variables = jit_init(model, jax.random.PRNGKey(0), batch)
        # jitted apply: eager flax apply is thousands of tiny CPU dispatches
        (logits, cla_logits, cam), _ = jax.jit(
            lambda v, b: model.apply(v, b, train=True,
                                     mutable=["batch_stats"]))(
            variables, batch)
        assert logits.shape == (2, plan.num_points[0], 9)
        loss = losses.region_mprm_loss(
            cam, batch.region_inds, batch.region_masks,
            batch.region_point_masks, batch.region_lb)
        assert np.isfinite(float(loss))

    def test_calibration_no_regions(self, wl_dataset, monkeypatch):
        """All calibration spheres missing the anchor set (regions=[]
        everywhere — e.g. tiny quick-preset radii on a large sparse-anchor
        tile) must yield a zero region budget, not crash on an empty
        quantile (region_counts=[0,...] is truthy while region_sizes=[])."""
        orig = wl_dataset._sample_calibration_clouds

        def no_regions(num_samples, rng):
            clouds, counts, _sizes = orig(num_samples, rng)
            return clouds, [0] * len(counts), []

        monkeypatch.setattr(wl_dataset, "_sample_calibration_clouds",
                            no_regions)
        plan = wl_dataset.calibration(num_samples=4, force_redo=True)
        assert plan.max_regions == 0 and plan.max_region_points == 0

    def test_calibration_cached(self, wl_dataset, synth_root):
        assert os.path.exists(os.path.join(synth_root, "shape_plans.json"))
        p1 = wl_dataset.calibration(num_samples=6)
        p2 = wl_dataset.calibration(num_samples=1)   # should hit cache
        assert p1 == p2


class TestPLDataset:

    def test_pseudo_label_training(self, synth_root, wl_dataset):
        # Fabricate a pseudo-label file from the WL dataset's labels
        cfg = SynthWLConfig()
        cfg.weak_label_log = "Log_test"
        cfg.contrast_thd = 20
        n = wl_dataset.input_labels[0].shape[0]
        rng = np.random.default_rng(0)
        pseudo = wl_dataset.input_labels[0].copy()
        pseudo[rng.random(n) < 0.3] = 10    # 30% uncertain
        out_dir = os.path.join(synth_root, "PseudoLabels", "Log_test")
        os.makedirs(out_dir, exist_ok=True)
        np.savetxt(os.path.join(
            out_dir, "Vaihingen3D_Training_t20_pseudo.txt"), pseudo,
            fmt="%i")

        ds = Vaihingen3DPLDataset(cfg, split="training",
                                  data_root=synth_root,
                                  rng=np.random.default_rng(1))
        assert ds.config.num_classes == 9          # 10 classes - 1 ignored
        assert 10 in ds.input_labels[0]
        # GT ledger file reset at al_iteration 0
        gt_file = os.path.join(
            ds.tree_path, "Vaihingen3D_Training_al_groundTruth_IDs.pkl")
        assert os.path.exists(gt_file)

        rng = np.random.default_rng(2)
        p = ds.sample_sphere(rng)
        # Pseudo 'no-label' 10 flows through label_to_idx as 10
        assert p["labels"].max() <= 10

    def test_gt_injection(self, synth_root):
        cfg = SynthWLConfig()
        cfg.weak_label_log = "Log_test"
        cfg.contrast_thd = 20
        # Write some GT ids into the ledger, then reload at al_iteration=1
        tree_path = os.path.join(synth_root, "input_0.400")
        gt_file = os.path.join(
            tree_path, "Vaihingen3D_Training_al_groundTruth_IDs.pkl")
        with open(gt_file, "wb") as f:
            pickle.dump(np.arange(50), f)
        ds = Vaihingen3DPLDataset(cfg, split="training",
                                  data_root=synth_root, al_iteration=1,
                                  rng=np.random.default_rng(1))
        # First 50 labels equal the ground truth (class field), not 10
        true = np.asarray(
            __import__("weasal_tpu.utils.ply", fromlist=["read_ply"]
                       ).read_ply(os.path.join(
                           tree_path, "Vaihingen3D_Training.ply"))["class"])
        np.testing.assert_array_equal(ds.input_labels[0][:50], true[:50])


class TestERFSplit:
    """'ERF' split: deterministic single-sphere sampling over the
    validation files (reference datasets/*_WeakLabel.py:293-298,386,398)."""

    def test_erf_deterministic_and_unlabeled(self, synth_root):
        cfg = SynthWLConfig()
        ds = Vaihingen3DWLDataset(cfg, split="ERF", data_root=synth_root,
                                  rng=np.random.default_rng(3))
        val = Vaihingen3DWLDataset(cfg, split="validation",
                                   data_root=synth_root,
                                   rng=np.random.default_rng(3))
        assert ds.cloud_names_split == val.cloud_names_split

        pots_before = [p.copy() for p in ds.potentials]
        p1 = ds.sample_sphere(np.random.default_rng(0), augment=False)
        p2 = ds.sample_sphere(np.random.default_rng(99), augment=False)
        # No potential updates and no center noise -> identical spheres
        for before, after in zip(pots_before, ds.potentials):
            np.testing.assert_array_equal(before, after)
        np.testing.assert_array_equal(p1["center"], p2["center"])
        np.testing.assert_array_equal(p1["input_inds"], p2["input_inds"])
        assert p1["labels"] is None and p1["cloud_lb"] is None


def test_composed_scene_districts():
    """Multi-district tiles: distinct styles, contiguous layout, all classes
    present per district (VERDICT r2 #2)."""
    from weasal_tpu.data.synthetic import composed_scene, district_style
    rng = np.random.default_rng(3)
    pts, inten, lbl = composed_scene(rng, districts=4, extent=40.0,
                                     density=6.0)
    assert pts.shape[0] == inten.shape[0] == lbl.shape[0]
    assert pts[:, 0].max() > 40.0 and pts[:, 1].max() > 40.0  # 2x2 grid
    for d in range(4):
        col = np.clip((pts[:, 0] // 40).astype(int), 0, 1)
        row = np.clip((pts[:, 1] // 40).astype(int), 0, 1)
        m = (col + 2 * row) == d
        assert m.sum() > 1000
        assert np.unique(lbl[m]).size == 9
    # styles are actually distinct draws
    s1 = district_style(np.random.default_rng(1))
    s2 = district_style(np.random.default_rng(2))
    assert s1["building_area"] != s2["building_area"]
