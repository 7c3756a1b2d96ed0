#!/usr/bin/env python
"""Pseudo-label (PL) segmentation training on DALES.

Mirrors the reference train_DALES_PseudoLabel.py (config :44-201).
Usage: python train_DALES_PseudoLabel.py [saving_path] [--data_root ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from weasal_tpu.utils.platform import apply_platform_env
apply_platform_env()

from weasal_tpu.data.datasets import DALESPLDataset
from train_Vaihingen3D_PseudoLabel import Vaihingen3DPLConfig, run_pl


class DALESPLConfig(Vaihingen3DPLConfig):
    """Reference configuration (train_DALES_PseudoLabel.py:44-201)."""
    dataset = "DALESPL"

    in_radius = 16
    first_subsampling_dl = 0.4
    in_features_dim = 3

    max_epoch = 200
    batch_num = 4
    epoch_steps = 100
    lr_decays = {i: 0.1 ** (1 / 200) for i in range(1, 200)}

    augment_scale_min = 0.9
    augment_scale_max = 1.1
    augment_noise = 0.01

    contrast_thd = 10

    active_learning_iterations = 20
    added_labels_per_epoch = 5000


if __name__ == "__main__":
    run_pl(DALESPLConfig, DALESPLDataset)
