#!/usr/bin/env python
"""Pseudo-label (PL) segmentation training on Vaihingen3D.

Mirrors the reference train_Vaihingen3D_PseudoLabel.py (config :44-196):
labels come from the refined pseudo-label files of a chosen WeakLabel log;
class weights load from the refinement weight file; active learning adds
ground-truth points by entropy.

Usage:
    python train_Vaihingen3D_PseudoLabel.py [saving_path]
        [--data_root ...] [--weak_label_log Log_...]
"""

import argparse
import os
import sys
from os.path import exists, join

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from weasal_tpu.utils.platform import apply_platform_env
apply_platform_env()

import numpy as np

from weasal_tpu.config import Config
from weasal_tpu.data.datasets import Vaihingen3DPLDataset
from weasal_tpu.train.tester import ModelTester
from weasal_tpu.train.trainer import ModelTrainer


class Vaihingen3DPLConfig(Config):
    """Reference configuration (train_Vaihingen3D_PseudoLabel.py:44-196)."""
    dataset = "Vaihingen3DPL"
    num_classes = None
    dataset_task = ""
    input_threads = 10

    architecture = ["simple", "resnetb", "resnetb_strided", "resnetb",
                    "resnetb_strided", "resnetb", "resnetb_strided",
                    "resnetb", "resnetb_strided", "resnetb",
                    "nearest_upsample", "unary",
                    "nearest_upsample", "unary",
                    "nearest_upsample", "unary",
                    "nearest_upsample", "unary"]

    num_kernel_points = 15
    in_radius = 24
    first_subsampling_dl = 0.24
    conv_radius = 2.5
    deform_radius = 6.0
    KP_extent = 1.0
    KP_influence = "linear"
    aggregation_mode = "sum"
    first_features_dim = 64
    in_features_dim = 4
    modulated = False
    use_batch_norm = True
    batch_norm_momentum = 0.02

    deform_fitting_mode = "point2point"
    deform_fitting_power = 1.0
    deform_lr_factor = 0.1
    repulse_extent = 1.2

    max_epoch = 150
    learning_rate = 0.01
    momentum = 0.98
    lr_decays = {i: 0.1 ** (1 / 150) for i in range(1, 150)}
    grad_clip_norm = 100.0

    batch_num = 4
    epoch_steps = 200
    validation_size = 200
    checkpoint_gap = 75

    augment_scale_anisotropic = True
    augment_symmetries = [True, True, True]
    augment_rotation = "vertical"
    augment_scale_min = 0.2
    augment_scale_max = 1.8
    augment_noise = 0.06
    augment_color = 0.7

    dropout = 0.5
    contrast_start = 0
    contrast_thd = 20

    active_learning_iterations = 20
    added_labels_per_epoch = 5000

    model_name = "KPFCNN"
    weak_label_log = ""

    class_w = [1, 1, 1, 1, 1, 1, 1, 1, 1]

    saving = True
    saving_path = None


def run_pl(config_cls, dataset_cls, stage_dir="PseudoLabel", argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("saving_path", nargs="?", default=None)
    parser.add_argument("--data_root", default=None)
    parser.add_argument("--weak_label_log", default=None)
    parser.add_argument("--max_epoch", type=int, default=None)
    parser.add_argument("--epoch_schedule", default=None,
                        help="comma list of epochs per AL iteration, e.g. "
                             "'150,15,15' (last value repeats); overrides "
                             "--max_epoch per iteration")
    parser.add_argument("--epoch_steps", type=int, default=None)
    parser.add_argument("--validation_size", type=int, default=None)
    parser.add_argument("--al_iterations", type=int, default=None)
    parser.add_argument("--resume", default=None)
    parser.add_argument("--preset", default=None, choices=["quick"],
                        help="'quick': scaled-down smoke-run config")
    parser.add_argument("--fused", action="store_true",
                        help="build the multi-scale pyramid on device "
                             "inside the jitted step (fastest path; the "
                             "host ships only level-0 arrays)")
    parser.add_argument("--devices", type=int, default=None,
                        help="data-parallel device count (sphere axis "
                             "sharded over a 1-D mesh; -1 = all devices)")
    parser.add_argument("--steps_per_dispatch", type=int, default=None,
                        help="train steps packed into one jitted lax.scan "
                             "dispatch (resident fused path; default auto)")
    parser.add_argument("--plan_percentile", type=float, default=None,
                        help="shape-plan level-0 sizing percentile "
                             "(config.plan_point_percentile); lower than "
                             "100 thins the oversized-sphere tail")
    parser.add_argument("--plan_buckets", type=float, default=None,
                        help="small-sphere plan bucket percentile "
                             "(config.plan_bucket_percentile, e.g. 80): "
                             "small-only training batches run a second, "
                             "smaller compiled step — nothing cropped")
    args = parser.parse_args(argv)

    config = config_cls()
    if args.fused:
        config.device_pyramid = True
    if args.devices is not None:
        config.data_parallel_devices = args.devices
    if args.steps_per_dispatch is not None:
        config.steps_per_dispatch = args.steps_per_dispatch
    if args.plan_percentile is not None:
        config.plan_point_percentile = args.plan_percentile
    if args.plan_buckets is not None:
        config.plan_bucket_percentile = args.plan_buckets
    if args.preset == "quick":
        config.in_radius = min(config.in_radius, 7.0)
        config.first_subsampling_dl = max(config.first_subsampling_dl, 0.45)
        config.first_features_dim = 16
        config.architecture = [
            "simple", "resnetb", "resnetb_strided", "resnetb",
            "resnetb_strided", "resnetb",
            "nearest_upsample", "unary", "nearest_upsample", "unary"]
        config.batch_num = 2
        config.max_epoch = 1
        config.epoch_steps = 3
        config.validation_size = 2
        config.active_learning_iterations = 0
        config.__init__()   # re-derive num_layers from the new architecture
    iteration_previous = 0
    chosen_chkp = None
    if args.resume:
        config.load(args.resume)
        iter_files = [f for f in os.listdir(config.saving_path)
                      if f.startswith("training_iteration")]
        # A run that crashed before its first training_iteration file
        # resumes at iteration 0, not -1
        iteration_previous = max(len(iter_files) - 1, 0)
        chosen_chkp = os.path.join(config.saving_path, "checkpoints",
                                   "current_chkp.tar")
        config.saving_path = None
    if args.saving_path:
        config.saving_path = args.saving_path
    if args.weak_label_log:
        config.weak_label_log = args.weak_label_log
    for key in ("max_epoch", "epoch_steps", "validation_size"):
        if getattr(args, key) is not None:
            setattr(config, key, getattr(args, key))
    if args.al_iterations is not None:
        config.active_learning_iterations = args.al_iterations

    schedule = None
    if args.epoch_schedule:
        schedule = [int(v) for v in args.epoch_schedule.split(",")]

    # Class weights from the refinement weight file when available
    data_folder = args.data_root or join("data", config.dataset[:-2])
    weight_file = join(data_folder, "PseudoLabels", config.weak_label_log,
                       config.dataset[:-2]
                       + f"_t{int(config.contrast_thd)}_weight.txt")
    if exists(weight_file):
        config.class_w = list(np.genfromtxt(weight_file, delimiter=" "))
        print(f"Loaded class weights from {weight_file}")

    for iteration in range(iteration_previous,
                           config.active_learning_iterations + 1):
        print(f"\n=== Active-learning iteration {iteration} ===\n")
        if schedule:
            config.max_epoch = schedule[min(iteration, len(schedule) - 1)]
        train_ds = dataset_cls(config, split="training",
                               al_iteration=iteration,
                               data_root=args.data_root)
        val_ds = dataset_cls(config, split="validation",
                             data_root=args.data_root)

        trainer = ModelTrainer(config, train_ds, chkp_path=chosen_chkp,
                               stage_dir=stage_dir)
        trainer.train(train_ds, val_ds, al_iteration=iteration)

        if config.active_learning_iterations and \
                iteration != config.active_learning_iterations:
            chosen_chkp = os.path.join(config.saving_path, "checkpoints",
                                       "current_chkp.tar")
            test_ds = dataset_cls(config, split="test", test_on_train=True,
                                  data_root=args.data_root)
            tester = ModelTester(config, test_ds, chosen_chkp)
            al_votes = 2 if args.preset == "quick" else 10
            tester.cloud_segmentation_test(test_ds, num_votes=al_votes,
                                           active_learning=True,
                                           test_on_train=True,
                                           stage_dir=stage_dir)
        chosen_chkp = None
        if iteration == config.active_learning_iterations:
            break


if __name__ == "__main__":
    run_pl(Vaihingen3DPLConfig, Vaihingen3DPLDataset)
