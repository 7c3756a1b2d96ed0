"""Anchor (weak sub-cloud label) machinery.

Port of the reference's utils/anchors.py:26-268 with identical on-disk
semantics: anchors are regularly spaced sphere centers of radius
`sub_radius`; each anchor that contains points carries a multi-hot class
label of the points inside; overlapping anchors with different labels spawn
intersection anchors labeled with the AND of the two label sets; active
learning subsamples anchors per file by 'regular' / 'random' / 'balanced'
strategies.

Data structures match the reference pickles
(`<cloud>_anchors_<method>.pkl` = [anchor array, sklearn KDTree,
anchors_dict {i: [[point_inds], [center]]}, anchor_lbs {i: multi-hot}]),
so artifacts interoperate across pipeline stages.
"""

from __future__ import annotations

import random
from typing import Dict, List, Sequence

import numpy as np
from sklearn.neighbors import KDTree


def get_anchors(points: np.ndarray, sub_radius: float,
                method: str = "full") -> np.ndarray:
    """Regular 3-D grid of candidate anchor centers over the cloud bounds.

    'full': spacing = sub_radius. 'reduced': spacing = 2*sub_radius with a
    half-offset pattern (4 anchors per grid node), i.e. half the density.
    """
    mins = points.min(axis=0)
    maxs = points.max(axis=0)

    def axis_coords(spacing):
        steps = (np.floor((maxs - mins) / spacing) + 1).astype(int)
        return [np.linspace(mins[d], maxs[d], steps[d]) for d in range(3)]

    anchors = []
    if method == "full":
        xs, ys, zs = axis_coords(sub_radius)
        for x in xs:
            for y in ys:
                for z in zs:
                    anchors.append([x, y, z])
    elif method == "reduced":
        xs, ys, zs = axis_coords(2 * sub_radius)
        r = sub_radius
        for x in xs:
            for y in ys:
                for z in zs:
                    anchors.append([x, y, z])
                    anchors.append([x, y, z + r])
                    anchors.append([x + r, y + r, z])
                    anchors.append([x + r, y + r, z + r])
    else:
        raise ValueError(f"Unsupported anchor method: {method}")
    return np.array(anchors)


def anchors_with_points(input_tree: KDTree, anchors: np.ndarray,
                        labels: np.ndarray, radius: float, n_class: int):
    """Keep anchors with >= 1 point inside; label each with the multi-hot of
    member point classes."""
    clean_anchors = []
    anchors_dict: Dict[int, list] = {}
    anchor_lbs: Dict[int, np.ndarray] = {}
    cc = 0
    for i in range(anchors.shape[0]):
        center = anchors[i].reshape(1, -1)
        inds = input_tree.query_radius(center, r=radius)[0]
        if inds.shape[0] > 0:
            clean_anchors.append(anchors[i])
            anchors_dict[cc] = [[inds], [anchors[i]]]
            multi_hot = np.zeros(n_class)
            multi_hot[np.unique(labels[inds]).astype(int)] = 1
            anchor_lbs[cc] = multi_hot.astype(int)
            cc += 1
    clean_anchors = np.array(clean_anchors)
    anchor_tree = KDTree(clean_anchors, leaf_size=10)
    return clean_anchors, anchor_tree, anchors_dict, anchor_lbs


def update_anchors(input_tree: KDTree, clean_anchors: np.ndarray,
                   anchor_tree: KDTree, anchors_dict: Dict,
                   anchor_lbs: Dict, sub_radius: float):
    """Create intersection anchors for overlapping pairs with differing
    labels (label = AND of the pair), reference utils/anchors.py:105-143."""
    cc = len(anchors_dict)
    points = np.asarray(input_tree.data)

    nei_idx = anchor_tree.query_radius(clean_anchors, r=1.5 * sub_radius)
    n_base = len(nei_idx)
    for idx in range(n_base):
        neis = nei_idx[idx][nei_idx[idx] > idx]
        i_idxs = anchors_dict[idx][0][0]
        for nei in neis:
            nei_idxs = anchors_dict[nei][0][0]
            overlap = np.isin(i_idxs, nei_idxs)
            if overlap.sum() < 1:
                continue
            new_idxs = i_idxs[overlap]
            if (anchor_lbs[idx] != anchor_lbs[nei]).sum() > 0:
                new_anchor = np.mean(points[new_idxs], axis=0)
                anchors_dict[cc] = [[new_idxs], [new_anchor]]
                anchor_lbs[cc] = (anchor_lbs[idx] * anchor_lbs[nei]).astype(int)
                clean_anchors = np.vstack((clean_anchors, new_anchor[None]))
                cc += 1
    anchor_tree = KDTree(clean_anchors, leaf_size=10)
    return clean_anchors, anchor_tree, anchors_dict, anchor_lbs


def select_anchors(anchor: np.ndarray, anchors_dict: Dict, anchor_lb: Dict,
                   anchor_inds_sub: Sequence[int]):
    """Restrict anchors to the given (full-set) indices."""
    anchor_sub = anchor[np.asarray(anchor_inds_sub)]
    anchors_dict_sub = {}
    anchor_lb_sub = {}
    for idx, a_ind in enumerate(anchor_inds_sub):
        anchors_dict_sub[idx] = anchors_dict[a_ind]
        anchor_lb_sub[idx] = anchor_lb[a_ind]
    anchor_tree_sub = KDTree(anchor_sub, leaf_size=10)
    return anchor_sub, anchor_tree_sub, anchors_dict_sub, anchor_lb_sub


def subsample_anchors(anchor: np.ndarray, anchors_dict: Dict,
                      anchor_lb: Dict, anchor_count: int,
                      subsample_method: str,
                      rng: random.Random | None = None):
    """Active-learning initial anchor subsampling
    (reference utils/anchors.py:162-268).

    'regular': evenly spaced indices; 'random': uniform with replacement;
    'balanced': per-class round-robin over up to 4 passes, remainder random.
    Returns (anchor_sub, tree, dict, lbs, chosen_full_set_indices).
    """
    rng = rng or random.Random()
    if anchor_count > len(anchor_lb):
        raise ValueError(
            f"Selected anchor count ({anchor_count}) exceeds the number of "
            f"anchors ({len(anchor_lb)})!")

    if subsample_method == "regular":
        anchor_inds_sub = np.round(
            np.linspace(0, anchor.shape[0] - 1, anchor_count)).astype(int)
        anchor_inds_sub = list(anchor_inds_sub)

    elif subsample_method == "random":
        pool = list(range(len(anchor_lb)))
        anchor_inds_sub = sorted(rng.choices(pool, k=anchor_count))

    elif subsample_method == "balanced":
        pool = list(range(len(anchor_lb)))
        anchor_inds_sub: List[int] = []
        remaining = anchor_count
        n_class = len(anchor_lb[0])
        for _ in range(4):
            class_members = {label: [] for label in range(n_class)}
            for key in pool:
                for cls in np.where(anchor_lb[key] == 1)[0]:
                    class_members[cls].append(key)
            per_class = int(remaining / n_class)
            to_add: List[int] = []
            for label, members in class_members.items():
                if len(members) >= per_class:
                    ids = np.round(np.linspace(
                        0, len(members) - 1, per_class)).astype(int)
                    to_add += [members[i] for i in ids]
                else:
                    to_add += members
            to_add = list(set(to_add))
            anchor_inds_sub += to_add
            for ind in to_add:
                pool.remove(ind)
            remaining = anchor_count - len(anchor_inds_sub)
            if remaining < n_class:
                break
        anchor_inds_sub += rng.choices(pool, k=remaining)
        anchor_inds_sub = sorted(anchor_inds_sub)
    else:
        raise ValueError(
            f'Subsample method "{subsample_method}" is not supported!')

    sub = select_anchors(anchor, anchors_dict, anchor_lb, anchor_inds_sub)
    return (*sub, anchor_inds_sub)


def weak_label_masks(anchors_dict: Dict, anchor_lbs: Dict,
                     num_points: int, num_classes: int) -> np.ndarray:
    """Point-wise product of anchor multi-hot labels over all anchors that
    contain each point (used by pseudo-label refinement,
    reference pseudoLabel_refinement.py:33-70)."""
    weak = np.ones((num_points, num_classes))
    for aa in anchors_dict.keys():
        idx = anchors_dict[aa][0]
        weak[tuple(idx)] = weak[tuple(idx)] * anchor_lbs[aa]
    return weak
