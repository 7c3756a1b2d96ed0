"""Pseudo-label refinement: combine predictions with weak-label masks.

Port of the reference's pseudoLabel_refinement.py:33-172. For every training
cloud's prediction ply (written by the WL tester), probabilities are
multiplied by the point-wise product of all containing anchors' multi-hot
labels; points whose best masked probability falls below the threshold get
the hard-coded 'no-label' class 10. Outputs the refined
`<cloud>_t<thd>_pseudo.txt` per cloud and the log-inverse-frequency class
weight file consumed by the PseudoLabel training stage.
"""

from __future__ import annotations

import os
import pickle
from os import listdir, makedirs
from os.path import exists, isfile, join
from typing import Optional

import numpy as np
from sklearn.neighbors import NearestNeighbors

from weasal_tpu.config import Config
from weasal_tpu.data.anchors import weak_label_masks
from weasal_tpu.utils.ply import read_ply

NO_LABEL = 10   # hard-coded 'no-label' class (pseudoLabel_refinement.py:141)


def get_weak_labels_per_point(cloud_name: str, sub_folder: str,
                              anchor_method: str,
                              num_classes: int) -> np.ndarray:
    """Point-wise weak-label mask for one subsampled cloud
    (reference pseudoLabel_refinement.py:33-70)."""
    kdtree_file = join(sub_folder, f"{cloud_name}_KDTree.pkl")
    anchors_file = join(sub_folder,
                        f"{cloud_name}_anchors_{anchor_method}.pkl")
    if not exists(kdtree_file):
        raise ValueError(f"KDTree file does not exist: {kdtree_file}")
    with open(kdtree_file, "rb") as f:
        search_tree = pickle.load(f)
        num_points = search_tree.data.shape[0]
    if not exists(anchors_file):
        raise ValueError(f"Anchors file does not exist: {anchors_file}")
    with open(anchors_file, "rb") as f:
        anchor, anchor_tree, anchors_dict, anchor_lb = pickle.load(f)
    return weak_label_masks(anchors_dict, anchor_lb, num_points, num_classes)


def refine_pseudo_labels(weak_label_log: str,
                         threshold: int,
                         results_root: str = "results/WeakLabel",
                         test_root: str = "test/WeakLabel",
                         data_root: Optional[str] = None,
                         config: Optional[Config] = None) -> str:
    """Run refinement for one WL log; returns the PseudoLabels output dir.

    :param threshold: max-prob cutoff in percent (reference defaults:
        20 for Vaihingen3D, 10 for DALES).
    """
    if config is None:
        config = Config()
        config.load(join(results_root, weak_label_log))

    base_path = join(test_root, weak_label_log)
    data_folder = data_root or join("data", config.dataset[:-2])
    sub_folder = join(data_folder,
                      "input_{:.3f}".format(config.first_subsampling_dl))
    pred_dir = join(base_path, "predictions")
    refinement_list = sorted(
        join(pred_dir, f) for f in listdir(pred_dir)
        if isfile(join(pred_dir, f)) and f.endswith(".ply"))

    # Guard against a partial probability dump: every weak-label training
    # cloud (identified by its anchor pickle) must have a prediction ply,
    # otherwise the pseudo labels and especially the class-weight file
    # would be silently computed from a subset (the reference enumerates
    # the training folder and crashes on the missing file).
    expected = sorted({f.split("_anchors")[0]
                       for f in listdir(sub_folder) if "_anchors_" in f})
    got = {file.split("/")[-1].split(".ply")[0]
           for file in refinement_list}
    missing = [c for c in expected if c not in got]
    if missing:
        raise FileNotFoundError(
            f"predictions missing for training cloud(s) {missing} in "
            f"{pred_dir} — rerun the probability dump "
            "(test_models.py --on train) to completion first")

    print(f"\nPseudo label refinement for {weak_label_log} "
          f"with threshold {threshold}%:\n")
    counts = np.zeros(config.num_classes, np.int64)
    out_folder = join(data_folder, "PseudoLabels", weak_label_log)
    makedirs(out_folder, exist_ok=True)

    for file in refinement_list:
        data = read_ply(file)
        points = np.array([data["x"], data["y"], data["z"]]).T
        pseudo_lbs = data["preds"].astype(np.int64)
        file_name = file.split("/")[-1].split(".ply")[0]

        points = (points - np.min(points, 0)).astype(np.float32)

        file_orig = join(sub_folder, file_name + ".ply")
        data_orig = read_ply(file_orig)
        points_orig = np.array([data_orig["x"], data_orig["y"],
                                data_orig["z"]]).T
        points_orig = (points_orig - np.min(points_orig, 0)).astype(
            np.float32)

        # 1-NN match of each original point into the prediction cloud
        nbrs = NearestNeighbors(n_neighbors=1,
                                algorithm="kd_tree").fit(points)
        _, indices = nbrs.kneighbors(points_orig)
        indices = np.squeeze(indices)

        prob_path = join(base_path, "probs", file_name + ".ply")
        data = read_ply(prob_path)
        label_list = data.dtype.names[3:]
        probs = np.vstack([data[label] for label in label_list]).T

        print(f'Getting point-wise weak labels for "{file_name}"')
        weak = get_weak_labels_per_point(file_name, sub_folder,
                                         config.anchor_method,
                                         config.num_classes)
        probs = probs[indices] * weak

        empty = np.max(probs, axis=-1) < (0.01 * threshold)
        pseudo_lbs = pseudo_lbs[indices]
        pseudo_lbs[empty] = NO_LABEL

        unique_lbs, counter = np.unique(pseudo_lbs, return_counts=True)
        for c in range(len(counts)):
            if c in unique_lbs:
                counts[c] += counter[np.where(unique_lbs == c)][0]

        pseudo_path = join(out_folder,
                           f"{file_name}_t{threshold}_pseudo.txt")
        np.savetxt(pseudo_path, pseudo_lbs, fmt="%i")
        print("Created: " + pseudo_path)

    if 0 in counts:
        print("\nWARNING:\nPseudo labels are missing classes! "
              "Lower threshold or improve weak label training.")
    if np.sum(counts) == 0:
        # Fully degenerate run (every point below threshold): fall back to
        # uniform weights instead of NaNs
        weights_norm = np.full(len(counts), 1.0 / len(counts))
    else:
        weights = np.log(1 / ((counts + 1) / np.sum(counts)))
        weights_norm = weights / np.sum(weights)
    weights_path = join(out_folder,
                        f"{config.dataset[:-2]}_t{threshold}_weight.txt")
    np.savetxt(weights_path, weights_norm, fmt="%.3f")
    print("\nCreated: " + weights_path + "\n")
    return out_folder
