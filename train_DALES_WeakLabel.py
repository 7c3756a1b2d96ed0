#!/usr/bin/env python
"""Weak-label (WL) training on DALES with active learning.

Mirrors the reference train_DALES_WeakLabel.py (config at :46-189).
Usage: python train_DALES_WeakLabel.py [saving_path] [--data_root ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from weasal_tpu.utils.platform import apply_platform_env
apply_platform_env()

from weasal_tpu.data.datasets import DALESWLDataset
from train_Vaihingen3D_WeakLabel import Vaihingen3DWLConfig, run


class DALESWLConfig(Vaihingen3DWLConfig):
    """Reference configuration (train_DALES_WeakLabel.py:46-189)."""
    dataset = "DALESWL"

    in_radius = 16
    sub_radius = 5
    first_subsampling_dl = 0.4
    in_features_dim = 3
    first_features_dim = 128
    # The reference's DALES config flips BN momentum to 0.98 (torch
    # convention: running stats ~= current batch) while Vaihingen uses
    # 0.02 — reference train_DALES_WeakLabel.py:116-125
    batch_norm_momentum = 0.98

    max_epoch = 100
    batch_num = 2
    epoch_steps = 400
    checkpoint_gap = 50

    augment_scale_min = 0.9
    augment_scale_max = 1.1
    augment_noise = 0.01

    active_learning_iterations = 10
    initial_labels_per_file = 7000
    subsample_method = "balanced"
    added_labels_per_epoch = 1000
    subsample_labels = active_learning_iterations > 0


if __name__ == "__main__":
    run(DALESWLConfig, DALESWLDataset)
