"""Cloud-segmentation datasets: preparation, caching, potential sampling,
and dense-batch generation.

Host-side data layer replacing the reference's torch Dataset/Sampler/
CustomBatch machinery (datasets/common.py, datasets/*_WeakLabel.py,
datasets/*_PseudoLabel.py) while keeping the on-disk artifact contract —
prepared plys per split, `input_{dl:.3f}/` caches (subsampled ply + KDTree
pickle + coarse potential tree + projection indices), anchor pickles and
active-learning ledgers — so pipeline stages interoperate and resume exactly
like the reference.

Differences by design (TPU batch model):
- spheres are sampled by the same minimum-potential rule
  (Vaihingen3D_WeakLabel.py:314-624) but assembled into dense fixed-shape
  PyramidBatches (see weasal_tpu/data/batching.py) with exactly
  `batch_num` spheres per step instead of a PID-tuned ragged point budget;
- the sampler is single-writer (the training loop's host thread), so the
  reference's cross-process shared-memory potentials + lock disappear.
"""

from __future__ import annotations

import json
import os
import pickle
import time
from os.path import exists, join
from typing import Dict, List, Optional, Tuple

import numpy as np
from sklearn.neighbors import KDTree

from weasal_tpu.data import anchors as anchor_ops
from weasal_tpu.data.batching import (
    ShapePlan, assemble_batch, build_sphere_pyramid, calibrate_shape_plan,
    payload_meta)
from weasal_tpu.kernels.kernel_points import create_3d_rotations
from weasal_tpu.ops.subsample import grid_subsample
from weasal_tpu.utils.ply import read_ply, write_ply


class CloudSegmentationDataset:
    """Base class: in-memory subsampled clouds + potential sphere sampler.

    Subclasses define the label nomenclature, file lists and feature
    assembly. `split` is one of 'training' | 'validation' | 'test' | 'ERF'
    ('ERF' = deterministic single-sphere sampling over the validation files
    for effective-receptive-field visualization: no center noise, no
    potential updates, no labels — reference datasets/*_WeakLabel.py:293,386).
    """

    # ---- subclass attributes -------------------------------------------
    name: str = ""
    label_to_names: Dict[int, str] = {}
    ignored_label_values: Tuple[int, ...] = ()
    train_dir = "Training"
    validation_dir = "Validation"
    test_dir = "Test"
    cloud_names: List[str] = []
    all_splits: List[int] = []
    validation_split: int = 1
    weak_labels = False          # WL datasets: anchors + regions
    pseudo_labels = False        # PL datasets: pseudo txt + GT ledger

    def __init__(self, config, split: str = "training",
                 use_potentials: bool = True, load_data: bool = True,
                 test_on_train: bool = False, al_iteration: int = 0,
                 data_root: Optional[str] = None,
                 rng: Optional[np.random.Generator] = None):
        self.config = config
        self.split = split
        self.use_potentials = use_potentials
        self.test_on_train = test_on_train
        self.al_iteration = al_iteration
        self.rng = rng or np.random.default_rng()

        self.path = data_root or join("data", self.name)
        self.num_classes = len(self.label_to_names)
        self.label_values = np.sort(
            [k for k in self.label_to_names]).astype(np.int32)
        self.label_names = [self.label_to_names[k] for k in self.label_values]
        self.ignored_labels = np.array(self.ignored_label_values,
                                       dtype=np.int32)
        self.label_to_idx = {l: i for i, l in enumerate(self.label_values)}
        if 10 in self.label_to_idx:
            # PL stage: uncertain pseudo label keeps raw value 10
            self.label_to_idx[10] = 10

        config.num_classes = self.num_classes - len(self.ignored_labels)
        config.dataset_task = "cloud_segmentation"

        self.test_split = self._test_split(test_on_train)
        if split == "training":
            self.epoch_n = config.epoch_steps * config.batch_num
        else:
            self.epoch_n = config.validation_size * config.batch_num

        if not load_data:
            return

        self.prepare_ply()
        self.files, self.cloud_names_split = self._select_files()
        self.input_trees: List[KDTree] = []
        self.input_colors: List[Optional[np.ndarray]] = []
        self.input_labels: List[np.ndarray] = []
        self.pot_trees: List[KDTree] = []
        self.test_proj: List[np.ndarray] = []
        self.validation_labels: List[np.ndarray] = []
        self.load_subsampled_clouds()
        self.num_clouds = len(self.input_trees)

        if self.weak_labels and split == "training":
            self._init_anchors()
        if self.use_potentials:
            self._init_potentials()

    # ------------------------------------------------------------------
    # File selection / preparation
    # ------------------------------------------------------------------

    def _test_split(self, test_on_train: bool):
        raise NotImplementedError

    def _split_dir(self) -> str:
        if self.split == "test":
            return join(self.path, self.test_dir)
        if self.split in ("validation", "ERF"):
            return join(self.path, self.validation_dir)
        return join(self.path, self.train_dir)

    def _in_split(self, i: int) -> bool:
        test_split = self.test_split
        in_test = (self.all_splits[i] in test_split
                   if isinstance(test_split, (list, tuple, set))
                   else self.all_splits[i] == test_split)
        if self.split == "test":
            return in_test
        if self.split in ("validation", "ERF"):
            return self.all_splits[i] == self.validation_split
        return self.all_splits[i] != self.validation_split and not in_test

    def _select_files(self):
        ply_dir = self._split_dir()
        files, names = [], []
        for i, f in enumerate(self.cloud_names):
            if self._in_split(i):
                files.append(join(ply_dir, f + ".ply"))
                names.append(f)
        return files, names

    def prepare_ply(self):
        raise NotImplementedError

    def _read_raw(self, path):
        """Return (points float64 [N,3], colors or None [N,1], labels [N])."""
        raise NotImplementedError

    def _sub_has_colors(self) -> bool:
        return True

    # ------------------------------------------------------------------
    # Subsampled cloud caches (reference load_subsampled_clouds,
    # Vaihingen3D_WeakLabel.py:687-865)
    # ------------------------------------------------------------------

    @property
    def tree_path(self) -> str:
        return join(self.path,
                    "input_{:.3f}".format(self.config.first_subsampling_dl))

    def load_subsampled_clouds(self):
        dl = self.config.first_subsampling_dl
        os.makedirs(self.tree_path, exist_ok=True)

        for i, file_path in enumerate(self.files):
            t0 = time.time()
            cloud_name = self.cloud_names_split[i]
            kdtree_file = join(self.tree_path, f"{cloud_name}_KDTree.pkl")
            sub_ply_file = join(self.tree_path, f"{cloud_name}.ply")

            if exists(kdtree_file):
                data = read_ply(sub_ply_file)
                sub_labels = data["class"].astype(np.int32)
                sub_colors = (data["intensity"].astype(np.float32)[:, None]
                              if self._sub_has_colors() else None)
                with open(kdtree_file, "rb") as f:
                    search_tree = pickle.load(f)
            else:
                data = read_ply(file_path)
                points = np.vstack((data["x"], data["y"],
                                    data["z"])).T.astype(np.float32)
                labels = data["class"].astype(np.int32)
                if self._sub_has_colors():
                    colors = data["intensity"].astype(
                        np.float32)[:, None]
                    sub_points, sub_colors, sub_labels = grid_subsample(
                        points, features=colors, labels=labels, dl=dl)
                    sub_colors = sub_colors / 255.0
                else:
                    sub_points, sub_labels = grid_subsample(
                        points, labels=labels, dl=dl)
                    sub_colors = None
                search_tree = KDTree(sub_points, leaf_size=10)
                with open(kdtree_file, "wb") as f:
                    pickle.dump(search_tree, f)
                fields = [sub_points]
                names = ["x", "y", "z"]
                if sub_colors is not None:
                    fields.append(sub_colors.astype(np.float32))
                    names.append("intensity")
                fields.append(sub_labels.astype(np.int32))
                names.append("class")
                write_ply(sub_ply_file, fields, names)
                data = read_ply(sub_ply_file)

            sub_labels = self._training_labels(cloud_name, data, sub_labels)

            self.input_trees.append(search_tree)
            self.input_colors.append(sub_colors)
            self.input_labels.append(sub_labels)
            n = sub_labels.shape[0]
            print(f"{cloud_name}: {n} subsampled points "
                  f"({time.time() - t0:.1f}s)")

        # Coarse potential trees (pot_dl = in_radius / 10,
        # reference Vaihingen3D_WeakLabel.py:782)
        if self.use_potentials:
            pot_dl = self.config.in_radius / 10
            for i, file_path in enumerate(self.files):
                cloud_name = self.cloud_names_split[i]
                coarse_file = join(self.tree_path,
                                   f"{cloud_name}_coarse_KDTree.pkl")
                if exists(coarse_file):
                    with open(coarse_file, "rb") as f:
                        pot_tree = pickle.load(f)
                else:
                    sub_points = np.asarray(self.input_trees[i].data,
                                            dtype=np.float32)
                    coarse = grid_subsample(sub_points, dl=pot_dl)
                    pot_tree = KDTree(coarse, leaf_size=10)
                    with open(coarse_file, "wb") as f:
                        pickle.dump(pot_tree, f)
                self.pot_trees.append(pot_tree)

        # Reprojection indices for full-cloud evaluation
        if self.split in ("validation", "test", "ERF"):
            for i, file_path in enumerate(self.files):
                cloud_name = self.cloud_names_split[i]
                proj_file = join(self.tree_path, f"{cloud_name}_proj.pkl")
                if exists(proj_file):
                    with open(proj_file, "rb") as f:
                        proj_inds, labels = pickle.load(f)
                else:
                    data = read_ply(file_path)
                    points = np.vstack((data["x"], data["y"],
                                        data["z"])).T.astype(np.float32)
                    labels = data["class"].astype(np.int32)
                    proj_inds = np.squeeze(self.input_trees[i].query(
                        points, return_distance=False)).astype(np.int32)
                    with open(proj_file, "wb") as f:
                        pickle.dump([proj_inds, labels], f)
                self.test_proj.append(proj_inds)
                self.validation_labels.append(labels)

    def _training_labels(self, cloud_name, sub_data, sub_labels):
        """Hook: PL datasets swap in refined pseudo labels for training."""
        return sub_labels

    def load_evaluation_points(self, file_path: str) -> np.ndarray:
        data = read_ply(file_path)
        return np.vstack((data["x"], data["y"], data["z"])).T

    # ------------------------------------------------------------------
    # Anchors (weak-label datasets)
    # ------------------------------------------------------------------

    def _init_anchors(self):
        cfg = self.config
        self.anchors, self.anchor_dicts = [], []
        self.anchor_trees, self.anchor_lbs = [], []
        for i, tree in enumerate(self.input_trees):
            cloud_name = self.cloud_names_split[i]
            anchors_file = join(
                self.tree_path,
                f"{cloud_name}_anchors_{cfg.anchor_method}.pkl")
            if exists(anchors_file):
                with open(anchors_file, "rb") as f:
                    anchor, anchor_tree, anchors_dict, anchor_lb = \
                        pickle.load(f)
            else:
                points = np.asarray(tree.data)
                anchor = anchor_ops.get_anchors(points, cfg.sub_radius,
                                                method=cfg.anchor_method)
                anchor, anchor_tree, anchors_dict, anchor_lb = \
                    anchor_ops.anchors_with_points(
                        tree, anchor, self.input_labels[i], cfg.sub_radius,
                        cfg.num_classes)
                if not cfg.subsample_labels:
                    anchor, anchor_tree, anchors_dict, anchor_lb = \
                        anchor_ops.update_anchors(
                            tree, anchor, anchor_tree, anchors_dict,
                            anchor_lb, cfg.sub_radius)
                with open(anchors_file, "wb") as f:
                    pickle.dump([anchor, anchor_tree, anchors_dict,
                                 anchor_lb], f)

            if cfg.subsample_labels:
                sub_file = join(self.tree_path,
                                f"{cloud_name}_subsampled_anchors.pkl")
                if not self.al_iteration:
                    (anchor, anchor_tree, anchors_dict, anchor_lb,
                     anchor_inds_sub) = anchor_ops.subsample_anchors(
                         anchor, anchors_dict, anchor_lb,
                         cfg.initial_labels_per_file, cfg.subsample_method)
                    anchor, anchor_tree, anchors_dict, anchor_lb = \
                        anchor_ops.update_anchors(
                            tree, anchor, anchor_tree, anchors_dict,
                            anchor_lb, cfg.sub_radius)
                    with open(sub_file, "wb") as f:
                        pickle.dump(anchor_inds_sub, f)
                else:
                    with open(sub_file, "rb") as f:
                        anchor_inds_sub = pickle.load(f)
                    anchor, anchor_tree, anchors_dict, anchor_lb = \
                        anchor_ops.select_anchors(anchor, anchors_dict,
                                                  anchor_lb, anchor_inds_sub)
                    anchor, anchor_tree, anchors_dict, anchor_lb = \
                        anchor_ops.update_anchors(
                            tree, anchor, anchor_tree, anchors_dict,
                            anchor_lb, cfg.sub_radius)

            self.anchors.append(anchor)
            self.anchor_dicts.append(anchors_dict)
            self.anchor_trees.append(anchor_tree)
            self.anchor_lbs.append(anchor_lb)

    # ------------------------------------------------------------------
    # Potential sampling (reference potential_item,
    # Vaihingen3D_WeakLabel.py:314-624; single-writer here)
    # ------------------------------------------------------------------

    def _init_potentials(self):
        self.potentials = [self.rng.random(t.data.shape[0]) * 1e-3
                           for t in self.pot_trees]
        self.min_potentials = [float(p.min()) for p in self.potentials]
        self.argmin_potentials = [int(p.argmin()) for p in self.potentials]

    def min_potential(self) -> float:
        return min(self.min_potentials)

    def _sample_center(self, rng) -> Tuple[int, int, np.ndarray]:
        cloud_ind = int(np.argmin(self.min_potentials))
        point_ind = self.argmin_potentials[cloud_ind]
        pot_points = np.asarray(self.pot_trees[cloud_ind].data, dtype=float)
        center = pot_points[point_ind].reshape(1, -1).copy()
        # ERF visualization wants a deterministic region: no center noise
        # and no potential update (reference Vaihingen3D_WeakLabel.py:386,398)
        if self.split == "ERF":
            return cloud_ind, point_ind, center
        center += rng.normal(scale=self.config.in_radius / 10,
                             size=center.shape)

        pot_inds, dists = self.pot_trees[cloud_ind].query_radius(
            center, r=self.config.in_radius, return_distance=True)
        d2s, pot_inds = np.square(dists[0]), pot_inds[0]
        tukeys = np.square(1 - d2s / np.square(self.config.in_radius))
        tukeys[d2s > np.square(self.config.in_radius)] = 0
        if self.split != "training":
            self.potentials[cloud_ind][pot_inds] += tukeys
        else:
            self.potentials[cloud_ind][point_ind] += 0.01
        min_ind = int(self.potentials[cloud_ind].argmin())
        self.min_potentials[cloud_ind] = float(
            self.potentials[cloud_ind][min_ind])
        self.argmin_potentials[cloud_ind] = min_ind
        return cloud_ind, point_ind, center

    def _sample_random_center(self, rng) -> Tuple[int, int, np.ndarray]:
        """Class-balanced random centers (PL use_potentials=False path,
        reference Vaihingen3D_PseudoLabel.py:516-643,958-1009)."""
        cloud_ind = int(rng.integers(self.num_clouds))
        labels = self.input_labels[cloud_ind]
        classes = [c for c in np.unique(labels)
                   if c not in self.ignored_labels]
        cls = classes[int(rng.integers(len(classes)))]
        cand = np.where(labels == cls)[0]
        point_ind = int(cand[rng.integers(cand.shape[0])])
        points = np.asarray(self.input_trees[cloud_ind].data, dtype=float)
        center = points[point_ind].reshape(1, -1).copy()
        center += rng.normal(scale=self.config.in_radius / 10,
                             size=center.shape)
        return cloud_ind, point_ind, center

    # ------------------------------------------------------------------
    # Augmentation (reference datasets/common.py:252-334)
    # ------------------------------------------------------------------

    def augmentation_params(self, rng, dim: int = 3):
        """Rotation + scale draws shared by the host transform and the
        resident-cloud path (which applies them on device)."""
        cfg = self.config
        R = np.eye(dim, dtype=np.float32)
        if dim == 3:
            if cfg.augment_rotation == "vertical":
                theta = rng.random() * 2 * np.pi
                c, s = np.cos(theta), np.sin(theta)
                R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]],
                             dtype=np.float32)
            elif cfg.augment_rotation == "all":
                theta = rng.random() * 2 * np.pi
                phi = (rng.random() - 0.5) * np.pi
                u = np.array([[np.cos(theta) * np.cos(phi),
                               np.sin(theta) * np.cos(phi), np.sin(phi)]])
                alpha = np.array([rng.random() * 2 * np.pi])
                R = create_3d_rotations(u, alpha)[0].astype(np.float32)

        min_s, max_s = cfg.augment_scale_min, cfg.augment_scale_max
        if cfg.augment_scale_anisotropic:
            scale = rng.random(dim) * (max_s - min_s) + min_s
        else:
            scale = np.full(dim, rng.random() * (max_s - min_s) + min_s)
        symmetries = np.array(cfg.augment_symmetries).astype(np.int32)
        symmetries = symmetries * rng.integers(2, size=dim)
        scale = (scale * (1 - symmetries * 2)).astype(np.float32)
        return scale, R

    def augmentation_transform(self, points, rng):
        cfg = self.config
        scale, R = self.augmentation_params(rng, points.shape[1])
        noise = (rng.standard_normal(points.shape)
                 * cfg.augment_noise).astype(np.float32)
        augmented = (points @ R) * scale + noise
        return augmented, scale, R

    # ------------------------------------------------------------------
    # Sphere -> payload -> batch
    # ------------------------------------------------------------------

    def _sphere_features(self, colors, aug_points, center) -> np.ndarray:
        raise NotImplementedError

    def _cloud_points_f32(self, cloud_ind: int) -> np.ndarray:
        """Per-cloud float32 point arrays, converted once (the KDTree
        stores float64; a fresh full-cloud copy per sphere draw was
        measurable on the single-core host)."""
        cache = getattr(self, "_pts_f32", None)
        if cache is None:
            cache = self._pts_f32 = {}
        if cloud_ind not in cache:
            cache[cloud_ind] = np.asarray(
                self.input_trees[cloud_ind].data, dtype=np.float32)
        return cache[cloud_ind]

    def _label_table(self) -> np.ndarray:
        """Vectorized label_to_idx lookup table (raw label -> train idx)."""
        table = getattr(self, "_lbl_table", None)
        if table is None:
            table = np.full(int(max(self.label_to_idx)) + 1, -1, np.int32)
            for raw, idx in self.label_to_idx.items():
                table[raw] = idx
            self._lbl_table = table
        return table

    def sample_sphere(self, rng, augment: bool = True,
                      max_points: int = 0, gather: bool = True) -> Dict:
        """Draw one input sphere; returns the payload dict for batching.

        `augment` is honored on EVERY split: the reference's
        `potential_item` augments unconditionally
        (Vaihingen3D_WeakLabel.py:478-482), so validation smoothing and
        test voting average over random rotations/scales/color drops.
        Callers choose the protocol (training loops pass True; parity
        oracles pass False).

        With ``gather=False`` (the resident-cloud fused path,
        weasal_tpu/data/resident.py) the per-point payload columns
        (points/features/labels) are skipped — the device gathers them
        from the resident arrays — and the payload instead carries the
        augmentation parameters (`rot`, `scale`, `color_keep`); sampling,
        potential updates, thinning and region resolution are identical.
        """
        cfg = self.config
        for _attempt in range(100 * max(cfg.batch_num, 1)):
            if self.use_potentials:
                cloud_ind, point_ind, center = self._sample_center(rng)
            else:
                cloud_ind, point_ind, center = \
                    self._sample_random_center(rng)
            input_inds = self.input_trees[cloud_ind].query_radius(
                center, r=cfg.in_radius)[0]
            if input_inds.shape[0] >= 2:
                break
        else:
            raise ValueError("This dataset only contains empty input spheres")

        regions = None
        if self.weak_labels and self.split == "training":
            regions = self._sphere_regions(cloud_ind, center, input_inds)

        if max_points and input_inds.shape[0] > max_points:
            keep = np.sort(rng.choice(input_inds.shape[0], size=max_points,
                                      replace=False))
            # Remap sphere-local region indices through the thinning
            if regions:
                remap = -np.ones(input_inds.shape[0], dtype=np.int64)
                remap[keep] = np.arange(max_points)
                new_regions = []
                for inds, lb in regions:
                    new = remap[inds]
                    new = new[new >= 0]
                    if new.size:
                        new_regions.append((new, lb))
                regions = new_regions
            input_inds = input_inds[keep]

        has_labels = not ((self.split in ("test",) and not self.test_on_train)
                          or self.split == "ERF")

        if not gather:
            # Resident-cloud path: device gathers points/labels/colors and
            # builds features (resident.assemble_level0_device); here only
            # the augmentation parameters and the cloud label are drawn.
            cloud_lb = None
            if has_labels:
                raw_present = np.unique(
                    self.input_labels[cloud_ind][input_inds])
                cloud_lb = np.zeros(cfg.num_classes, np.float32)
                for l in raw_present:
                    idx = self.label_to_idx[l]
                    if 0 <= idx < cfg.num_classes:
                        cloud_lb[idx] = 1
            if augment:
                scale, R = self.augmentation_params(rng)
            else:
                scale, R = np.ones(3, np.float32), np.eye(3, dtype=np.float32)
            color_keep = 1.0
            if (augment and self.input_colors[cloud_ind] is not None
                    and rng.random() > cfg.augment_color):
                color_keep = 0.0
            return dict(points=None, features=None, labels=None,
                        input_inds=input_inds, cloud_ind=cloud_ind,
                        center=center[0].astype(np.float32),
                        cloud_lb=cloud_lb, regions=regions, scale=scale,
                        rot=R, color_keep=color_keep)

        points = self._cloud_points_f32(cloud_ind)
        input_points = (points[input_inds] - center).astype(np.float32)
        colors = (self.input_colors[cloud_ind][input_inds]
                  if self.input_colors[cloud_ind] is not None else None)

        if not has_labels:
            labels = None
            cloud_lb = None
        else:
            raw = self.input_labels[cloud_ind][input_inds]
            labels = self._label_table()[np.asarray(raw, np.int64)]
            cloud_lb = np.zeros(cfg.num_classes, np.float32)
            present = np.unique(labels)
            cloud_lb[present[present < cfg.num_classes]] = 1

        if augment:
            aug_points, scale, R = self.augmentation_transform(
                input_points, rng)
        else:
            aug_points, scale, R = input_points, np.ones(3, np.float32), \
                np.eye(3, dtype=np.float32)

        if augment and colors is not None \
                and rng.random() > cfg.augment_color:
            colors = colors * 0

        features = self._sphere_features(colors, aug_points, center)

        return dict(points=aug_points, features=features,
                    labels=labels, input_inds=input_inds,
                    cloud_ind=cloud_ind, center=center[0].astype(np.float32),
                    cloud_lb=cloud_lb, regions=regions, scale=scale, rot=R)

    def _sphere_regions(self, cloud_ind, center, input_inds):
        """Anchors inside the sphere -> sphere-local member indices + labels
        (reference Vaihingen3D_WeakLabel.py:419-446)."""
        cfg = self.config
        tree = self.anchor_trees[cloud_ind]
        adict = self.anchor_dicts[cloud_ind]
        albs = self.anchor_lbs[cloud_ind]
        a_inds = tree.query_radius(
            center, r=cfg.in_radius - cfg.sub_radius - 0.01)[0]
        if len(a_inds) == 0:
            return []

        # One cloud-sized remap built per sphere (cached buffer) replaces a
        # per-region np.isin + searchsorted: regions then resolve in O(|r|).
        # Was ~40% of host batch time at reference geometry.
        n_cloud = self.input_labels[cloud_ind].shape[0]
        buf = getattr(self, "_region_remap", None)
        if buf is None or buf.shape[0] < n_cloud:
            buf = np.full(max(n_cloud, 1), -1, np.int64)
            self._region_remap = buf
        buf[input_inds] = np.arange(input_inds.shape[0])
        regions = []
        for aa in a_inds:
            idx_r = adict[aa][0][0]
            pos = buf[idx_r]
            pos = pos[pos >= 0]
            if pos.size == 0:
                continue
            regions.append((pos, albs[aa].astype(np.float32)))
        buf[input_inds] = -1                   # restore for the next sphere
        return regions

    def next_batch(self, rng, plan: ShapePlan,
                   num_spheres: Optional[int] = None,
                   augment: Optional[bool] = None):
        """Sample B spheres, build pyramids, assemble one PyramidBatch.

        Returns (batch, metas) where metas is a list of per-sphere dicts
        (cloud_ind, input_inds, center, n_real) used by validators/testers
        for full-cloud reprojection.
        """
        b = num_spheres or self.config.batch_num
        if augment is None:
            augment = self.split == "training"
        spheres, metas = [], []
        for _ in range(b):
            payload = self.sample_sphere(rng, augment=augment,
                                         max_points=plan.num_points[0])
            pyramid = build_sphere_pyramid(
                payload["points"], self.config, rng=rng,
                max_neighbors=plan.conv_neighbors,
                max_pool_neighbors=plan.pool_neighbors)
            spheres.append(dict(pyramid=pyramid,
                                features=payload["features"],
                                labels=payload["labels"],
                                center=payload["center"],
                                cloud_lb=payload["cloud_lb"],
                                regions=payload["regions"]))
            metas.append(payload_meta(payload, plan.num_points[0]))
        batch = assemble_batch(spheres, plan, self.config.num_classes,
                               rng=rng)
        return batch, metas

    # ------------------------------------------------------------------
    # Shape-plan calibration (replaces the reference's PID batch_limit +
    # neighborhood_limits, Vaihingen3D_WeakLabel.py:1036-1342)
    # ------------------------------------------------------------------

    def _plan_key(self) -> str:
        """Shape-plan cache key. Sampling mode is part of it: random-center
        (PL use_potentials=False) spheres sit on class-balanced points and
        have different size/neighbor distributions than potential-grid
        centers, so the percentile budgets must not be shared."""
        cfg = self.config
        mode = "potentials" if self.use_potentials else "random"
        key = "{}_{:.3f}_{:.3f}_{:d}_{:d}".format(
            mode, cfg.in_radius, cfg.first_subsampling_dl, cfg.batch_num,
            cfg.num_layers)
        pct = float(getattr(cfg, "plan_point_percentile", 100.0))
        if pct != 100.0:   # suffix only when non-default: old caches stay valid
            key += "_p{:g}".format(pct)
        bkt = float(getattr(cfg, "plan_bucket_percentile", 0.0))
        if bkt > 0.0:
            key += "_b{:g}".format(bkt)
        return key

    def save_plan(self, plan: ShapePlan) -> None:
        """Persist (an updated) plan under this config's cache key — used
        by the trainer's self-tuning band widening so restarts and the
        tester consume the widened windows."""
        plan_file = join(self.path, "shape_plans.json")
        plans = {}
        if exists(plan_file):
            with open(plan_file) as f:
                plans = json.load(f)
        plans[self._plan_key()] = json.loads(json.dumps(plan.__dict__))
        with open(plan_file, "w") as f:
            json.dump(plans, f, indent=2)

    def calibration(self, num_samples: int = 40, force_redo: bool = False,
                    untouched_ratio: float = 0.9,
                    verbose: bool = False) -> ShapePlan:
        cfg = self.config
        plan_file = join(self.path, "shape_plans.json")
        plans = {}
        if exists(plan_file):
            with open(plan_file) as f:
                plans = json.load(f)
        key = self._plan_key()
        if key in plans and not force_redo:
            plan = ShapePlan(**plans[key])
            if plan.bands is None and self._bands_wanted():
                # Upgrade a cached plan in place: measure the banded-kernel
                # windows from freshly sampled spheres
                rng = np.random.default_rng(0)
                clouds, _, _ = self._sample_calibration_clouds(
                    min(num_samples, 24), rng)
                plan.bands = self._measure_plan_bands(plan, clouds, rng)
                self.save_plan(plan)
            return plan

        t0 = time.time()
        rng = np.random.default_rng(0)
        clouds, region_counts, region_sizes = \
            self._sample_calibration_clouds(num_samples, rng)

        if region_sizes:
            # region_counts alone is not enough: spheres can report
            # regions=[] (counts all 0, a truthy list) when every
            # calibration sphere misses the anchor set — e.g. tiny
            # --preset quick radii on a large sparse-anchor tile — and
            # quantile() on the empty region_sizes would crash.
            r_budget = (int(np.quantile(region_counts, 0.98)) + 2,
                        int(np.quantile(region_sizes, 0.95)) + 1)
        else:
            r_budget = (0, 0)
        plan = calibrate_shape_plan(
            clouds, cfg, untouched_ratio=untouched_ratio,
            point_percentile=float(getattr(cfg, "plan_point_percentile",
                                           100.0)),
            region_budget=r_budget, rng=rng,
            bucket_percentile=float(getattr(cfg, "plan_bucket_percentile",
                                            0.0)))
        if self._bands_wanted():
            plan.bands = self._measure_plan_bands(plan, clouds, rng)
        self.save_plan(plan)
        if verbose:
            print(f"Calibrated shape plan in {time.time() - t0:.1f}s: "
                  f"{plan}")
        return plan

    def _sample_calibration_clouds(self, num_samples: int,
                                   rng: np.random.Generator):
        """Sample sphere point clouds for calibration without disturbing
        the potential-driven training order (potentials snapshot)."""
        clouds, region_counts, region_sizes = [], [], []
        pots = ([p.copy() for p in self.potentials]
                if self.use_potentials else None)
        for _ in range(num_samples):
            payload = self.sample_sphere(rng, augment=True)
            clouds.append(payload["points"])
            if payload["regions"] is not None:
                region_counts.append(len(payload["regions"]))
                region_sizes += [r[0].size for r in payload["regions"]]
        if pots is not None:
            self.potentials = pots
            self.min_potentials = [float(p.min()) for p in self.potentials]
            self.argmin_potentials = [int(p.argmin())
                                      for p in self.potentials]
        return clouds, region_counts, region_sizes

    def _bands_wanted(self) -> bool:
        """Measured bands are only meaningful for the fused device-pyramid
        path with banded Pallas kernels enabled (utils/platform)."""
        cfg = self.config
        if not getattr(cfg, "device_pyramid", False):
            return False
        from weasal_tpu.utils.platform import resolve_pallas_flag
        return (resolve_pallas_flag(getattr(cfg, "use_pallas_search", False))
                or resolve_pallas_flag(
                    getattr(cfg, "use_pallas_kpconv", False),
                    auto_requires=True))

    def _measure_plan_bands(self, plan: ShapePlan, clouds, rng):
        """Per-edge band half-windows from calibration spheres, in the
        exact level-0 order the fused path ships (assemble_level0 sort)."""
        from weasal_tpu.data.level0 import assemble_level0
        from weasal_tpu.ops.pyramid import measure_bands
        bsz = max(int(self.config.batch_num), 1)
        batches = []
        for i in range(0, len(clouds), bsz):
            group = clouds[i:i + bsz]
            if len(group) < bsz:
                break
            payloads = [dict(points=np.asarray(p, np.float32),
                             features=np.zeros((p.shape[0], 1), np.float32))
                        for p in group]
            arrays = assemble_level0(payloads, plan,
                                     self.config.num_classes, rng)
            batches.append((arrays["points0"], arrays["mask0"],
                            arrays["rotations"]))
        return measure_bands(batches, self.config, plan)


# ----------------------------------------------------------------------------
# Vaihingen3D
# ----------------------------------------------------------------------------

class _Vaihingen3DBase(CloudSegmentationDataset):
    label_to_names = {0: "Powerline", 1: "LowVegetation",
                      2: "ImperviousSurfaces", 3: "Car", 4: "Fence/Hedge",
                      5: "Roof", 6: "Facade", 7: "Shrub", 8: "Tree"}
    cloud_names = ["Vaihingen3D_Training", "Vaihingen3D_Training",
                   "Vaihingen3D_Testing"]
    all_splits = [0, 1, 2]
    validation_split = 1

    def _test_split(self, test_on_train):
        return 0 if test_on_train else 2

    def prepare_ply(self):
        """Offset-reduce raw clouds into per-split prepared plys
        (reference Vaihingen3D_WeakLabel.py:626-685)."""
        ply_dir = self._split_dir()
        os.makedirs(ply_dir, exist_ok=True)

        data = read_ply(join(self.path, self.cloud_names[0] + ".ply"))
        self.coord_offset = np.vstack((data["x"][0], data["y"][0],
                                       data["z"][0])).T

        if self.split == "test" and not self.test_on_train:
            to_prepare = [self.cloud_names[2]]
        else:
            to_prepare = [self.cloud_names[0]]
        for cloud_name in to_prepare:
            cloud_file = join(ply_dir, cloud_name + ".ply")
            if exists(cloud_file):
                continue
            data = read_ply(join(self.path, cloud_name + ".ply"))
            points = np.vstack((data["x"], data["y"], data["z"])).T
            points = (points - self.coord_offset).astype(np.float32)
            intensity = data["scalar_Intensity"].astype(np.uint8)
            classes = data["scalar_Classification"].astype(np.int32)
            write_ply(cloud_file, [points, intensity, classes],
                      ["x", "y", "z", "intensity", "class"])

    def _sphere_features(self, colors, aug_points, center):
        # [intensity, absolute height, reduced height] -> select by dim
        feats = np.hstack((
            colors if colors is not None
            else np.zeros((aug_points.shape[0], 1), np.float32),
            aug_points[:, 2:] + center[:, 2:].astype(np.float32),
            aug_points[:, 2:])).astype(np.float32)
        ones = np.ones((aug_points.shape[0], 1), np.float32)
        fdim = self.config.in_features_dim
        if fdim == 1:
            return ones
        if fdim == 2:
            return np.hstack((ones, feats[:, :1]))
        if fdim == 4:
            return np.hstack((ones, feats[:, :3]))
        raise ValueError("Vaihingen3D supports in_features_dim 1, 2 or 4")


class Vaihingen3DWLDataset(_Vaihingen3DBase):
    name = "Vaihingen3D"
    weak_labels = True


class Vaihingen3DPLDataset(_Vaihingen3DBase):
    name = "Vaihingen3D"
    pseudo_labels = True
    label_to_names = {**_Vaihingen3DBase.label_to_names, 10: "Ignore"}
    ignored_label_values = (10,)

    def _training_labels(self, cloud_name, sub_data, sub_labels):
        if self.split != "training":
            return sub_labels
        cfg = self.config
        pseudo_file = join(
            self.path, "PseudoLabels", cfg.weak_label_log,
            f"{cloud_name}_t{int(cfg.contrast_thd)}_pseudo.txt")
        labels = np.genfromtxt(pseudo_file).astype(np.int32)

        gt_file = join(self.tree_path,
                       cloud_name + "_al_groundTruth_IDs.pkl")
        if self.al_iteration:
            with open(gt_file, "rb") as f:
                gt_ids = pickle.load(f)
            labels[np.asarray(gt_ids, dtype=np.int64)] = \
                sub_labels[np.asarray(gt_ids, dtype=np.int64)]
        else:
            with open(gt_file, "wb") as f:
                pickle.dump([], f)
        return labels


# ----------------------------------------------------------------------------
# DALES
# ----------------------------------------------------------------------------

class _DALESBase(CloudSegmentationDataset):
    label_to_names = {0: "Unknown", 1: "Ground", 2: "Vegetation", 3: "Cars",
                      4: "Trucks", 5: "Power", 6: "Fences", 7: "Poles",
                      8: "Buildings"}
    cloud_names = ["5080_54435", "5085_54320", "5095_54440", "5095_54455",
                   "5100_54495", "5105_54405", "5105_54460", "5110_54320",
                   "5110_54460", "5110_54475", "5110_54495", "5115_54480",
                   "5130_54355", "5135_54495", "5140_54445", "5145_54340",
                   "5145_54405", "5145_54460", "5145_54470", "5145_54480",
                   "5150_54340", "5160_54330", "5165_54390", "5165_54395",
                   "5180_54435", "5180_54485", "5185_54390", "5185_54485",
                   "5190_54400",
                   "test_5080_54400", "test_5080_54470", "test_5100_54440",
                   "test_5100_54490", "test_5120_54445", "test_5135_54430",
                   "test_5135_54435", "test_5140_54390", "test_5150_54325",
                   "test_5155_54335", "test_5175_54395"]
    all_splits = list(range(40))
    validation_split = 28
    # index of the first test tile == number of train+validation tiles
    _n_trainval = 29

    def __init__(self, config, *args, data_root: Optional[str] = None,
                 **kwargs):
        # DALES is naturally multi-tile; the reference hardcodes its 29
        # training / 1 validation / 11 test tile names
        # (DALES_WeakLabel.py:64-130). Keep that list when the root
        # contains it, but otherwise DISCOVER the layout from the root so
        # structure-preserving smaller roots (synthetic DALES-like data,
        # subsets) run through the identical split machinery: sorted
        # `test_*` plys form the test split, the LAST of the remaining
        # sorted names is the validation tile (mirroring 5190_54400, the
        # lexically last training name in the real layout), the rest
        # train.
        path = data_root or join("data", self.name)
        full_real_layout = all(
            exists(join(path, n + ".ply")) for n in _DALESBase.cloud_names)
        if not full_real_layout and os.path.isdir(path):
            names = sorted(
                f[:-4] for f in os.listdir(path)
                if f.endswith(".ply") and os.path.isfile(join(path, f)))
            trainval = [n for n in names if not n.startswith("test_")]
            test = [n for n in names if n.startswith("test_")]
            if len(trainval) >= 2 and test:
                self.cloud_names = trainval + test
                self.all_splits = list(range(len(self.cloud_names)))
                self.validation_split = len(trainval) - 1
                self._n_trainval = len(trainval)
            # else: fall through with the real names — the base class will
            # report the missing files with its usual errors
        super().__init__(config, *args, data_root=data_root, **kwargs)

    def _test_split(self, test_on_train):
        if test_on_train:
            return list(range(0, self._n_trainval - 1))
        return list(range(self._n_trainval, len(self.cloud_names)))

    def _sub_has_colors(self) -> bool:
        return False

    def prepare_ply(self):
        ply_dir = self._split_dir()
        os.makedirs(ply_dir, exist_ok=True)
        data = read_ply(join(self.path, self.cloud_names[0] + ".ply"))
        self.coord_offset = np.vstack((data["x"][0], data["y"][0],
                                       data["z"][0])).T
        for i, cloud_name in enumerate(self.cloud_names):
            if not self._in_split(i):
                continue
            cloud_file = join(ply_dir, cloud_name + ".ply")
            if exists(cloud_file):
                continue
            data = read_ply(join(self.path, cloud_name + ".ply"))
            points = np.vstack((data["x"], data["y"], data["z"])).T
            points = (points - self.coord_offset).astype(np.float32)
            classes = data["scalar_Classification"].astype(np.int32)
            write_ply(cloud_file, [points, classes],
                      ["x", "y", "z", "class"])

    def _sphere_features(self, colors, aug_points, center):
        ones = np.ones((aug_points.shape[0], 1), np.float32)
        fdim = self.config.in_features_dim
        if fdim == 1:
            return ones
        if fdim == 3:
            return np.hstack((
                ones, aug_points[:, 2:] + center[:, 2:].astype(np.float32),
                aug_points[:, 2:])).astype(np.float32)
        raise ValueError("DALES supports in_features_dim 1 or 3")


class DALESWLDataset(_DALESBase):
    name = "DALES"
    weak_labels = True


class DALESPLDataset(_DALESBase):
    name = "DALES"
    pseudo_labels = True
    label_to_names = {**_DALESBase.label_to_names, 10: "Ignore"}
    ignored_label_values = (10,)

    _training_labels = Vaihingen3DPLDataset._training_labels


DATASET_REGISTRY = {
    "Vaihingen3DWL": Vaihingen3DWLDataset,
    "Vaihingen3DPL": Vaihingen3DPLDataset,
    "DALESWL": DALESWLDataset,
    "DALESPL": DALESPLDataset,
}
