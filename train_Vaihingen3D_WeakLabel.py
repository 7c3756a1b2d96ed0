#!/usr/bin/env python
"""Weak-label (WL) training on Vaihingen3D with active learning.

Entry point mirroring the reference script of the same name
(train_Vaihingen3D_WeakLabel.py:46-363): config values match the reference;
the outer loop re-instantiates datasets/model/trainer per active-learning
iteration and extends the anchor ledger by testing on the training split.

Usage:
    python train_Vaihingen3D_WeakLabel.py [saving_path]
        [--data_root data/Vaihingen3D] [--max_epoch N] [--epoch_steps N]
        [--al_iterations N] [--resume results/WeakLabel/Log_...]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from weasal_tpu.utils.platform import apply_platform_env
apply_platform_env()

import numpy as np

from weasal_tpu.config import Config
from weasal_tpu.data.datasets import Vaihingen3DWLDataset
from weasal_tpu.train.tester import ModelTester
from weasal_tpu.train.trainer import ModelTrainer


class Vaihingen3DWLConfig(Config):
    """Reference configuration (train_Vaihingen3D_WeakLabel.py:46-189)."""
    dataset = "Vaihingen3DWL"
    num_classes = None
    dataset_task = ""
    input_threads = 10

    architecture = ["simple", "resnetb", "resnetb_strided", "resnetb",
                    "resnetb_strided", "resnetb",
                    "nearest_upsample", "nearest_upsample"]

    num_kernel_points = 15
    in_radius = 18
    sub_radius = 5
    first_subsampling_dl = 0.24
    conv_radius = 2.5
    deform_radius = 1.0
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

    max_epoch = 80
    learning_rate = 0.01
    momentum = 0.98
    lr_decays = {i: 0.98 for i in range(1, 1000)}
    grad_clip_norm = 1

    batch_num = 3
    epoch_steps = 600
    validation_size = 200
    checkpoint_gap = 40

    augment_scale_anisotropic = True
    augment_symmetries = [True, True, False]
    augment_rotation = "vertical"
    augment_scale_min = 0.8
    augment_scale_max = 1.2
    augment_noise = 0.04

    class_w = [1, 1, 1, 1, 1, 1, 1, 1, 1]

    active_learning_iterations = 20
    initial_labels_per_file = 600
    subsample_method = "balanced"
    added_labels_per_epoch = 200
    subsample_labels = active_learning_iterations > 0

    model_name = "KPFCNN_mprm"
    loss_type = "region_mprm_loss"
    anchor_method = "reduced"

    saving = True
    saving_path = None


def apply_al_override(config, al_iterations: int):
    """--al_iterations only controls how many acquisition loops run.

    It must NOT flip label subsampling off: --al_iterations 0 with the
    class default subsample_labels=True still trains on the
    initial_labels_per_file budget (600/file), not the full anchor set
    (~40x more labels on a reference-scale tile). The reference trains on
    all anchors only when the config class itself sets
    subsample_labels=False (reference train_Vaihingen3D_WeakLabel.py:180).
    """
    config.active_learning_iterations = al_iterations
    if al_iterations > 0:
        config.subsample_labels = True


def run(config_cls, dataset_cls, stage_dir="WeakLabel", argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("saving_path", nargs="?", default=None)
    parser.add_argument("--data_root", default=None)
    parser.add_argument("--max_epoch", type=int, default=None)
    parser.add_argument("--epoch_schedule", default=None,
                        help="comma list of epochs per AL iteration, e.g. "
                             "'80,15,15' (last value repeats); overrides "
                             "--max_epoch per iteration")
    parser.add_argument("--epoch_steps", type=int, default=None)
    parser.add_argument("--validation_size", type=int, default=None)
    parser.add_argument("--al_iterations", type=int, default=None)
    parser.add_argument("--resume", default=None,
                        help="previous Log_* dir to resume from")
    parser.add_argument("--preset", default=None, choices=["quick"],
                        help="'quick': scaled-down smoke-run config "
                             "(small spheres, few steps) for CI/dev")
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
                             "(config.plan_point_percentile): 100 pads to "
                             "the largest calibration sphere; lower (e.g. "
                             "80) sizes to the bulk and randomly thins the "
                             "oversized tail each visit — ~2x faster steps "
                             "on long-tailed tiles")
    parser.add_argument("--initial_labels", type=int, default=None,
                        help="initial weak-label anchors per file "
                             "(config.initial_labels_per_file); the "
                             "reference defaults assume full-size tiles "
                             "— scale down for smaller roots")
    parser.add_argument("--al_acquisition", default=None,
                        choices=["entropy", "random"],
                        help="active-learning acquisition policy: the "
                             "reference's entropy x class-rarity ranking, "
                             "or uniformly-random unused anchors at the "
                             "same budget (efficacy control arm)")
    parser.add_argument("--al_votes", type=int, default=None,
                        help="votes per AL acquisition pass (default 10; "
                             "2 with --preset quick — the reference votes "
                             "10x between AL restarts)")
    parser.add_argument("--added_labels", type=int, default=None,
                        help="anchors added per AL acquisition "
                             "(config.added_labels_per_epoch)")
    parser.add_argument("--plan_buckets", type=float, default=None,
                        help="small-sphere plan bucket percentile "
                             "(config.plan_bucket_percentile, e.g. 80): "
                             "small-only training batches run a second, "
                             "smaller compiled step — faster mean step on "
                             "long-tailed tiles, nothing cropped")
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
        config.sub_radius = min(getattr(config, "sub_radius", 5), 2.5)
        config.first_subsampling_dl = max(config.first_subsampling_dl, 0.45)
        config.first_features_dim = 16
        config.batch_num = 2
        config.max_epoch = 1
        config.epoch_steps = 3
        config.validation_size = 2
        config.active_learning_iterations = 1
        config.initial_labels_per_file = 40
        config.added_labels_per_epoch = 5
        config.subsample_labels = True
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
    for key in ("max_epoch", "epoch_steps", "validation_size"):
        if getattr(args, key) is not None:
            setattr(config, key, getattr(args, key))
    if args.initial_labels is not None:
        config.initial_labels_per_file = args.initial_labels
    if args.al_acquisition is not None:
        config.al_acquisition = args.al_acquisition
    if args.added_labels is not None:
        config.added_labels_per_epoch = args.added_labels
    if args.al_iterations is not None:
        apply_al_override(config, args.al_iterations)

    schedule = None
    if args.epoch_schedule:
        schedule = [int(v) for v in args.epoch_schedule.split(",")]

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

        n_files = len(train_ds.cloud_names_split)
        init = config.initial_labels_per_file * n_files \
            + iteration * config.added_labels_per_epoch * n_files
        over = int(np.sum([len(a) for a in train_ds.anchors])) \
            if hasattr(train_ds, "anchors") else 0
        print(f"\nInitial amount of weak labels: {init}")
        print(f"Amount of weak labels with overlaps: {over}\n")

        if config.active_learning_iterations and \
                iteration != config.active_learning_iterations:
            chosen_chkp = os.path.join(config.saving_path, "checkpoints",
                                       "current_chkp.tar")
            test_ds = dataset_cls(config, split="test", test_on_train=True,
                                  data_root=args.data_root)
            tester = ModelTester(config, test_ds, chosen_chkp)
            al_votes = args.al_votes if args.al_votes is not None \
                else (2 if args.preset == "quick" else 10)
            tester.cloud_segmentation_test(test_ds, num_votes=al_votes,
                                           active_learning=True,
                                           test_on_train=True,
                                           stage_dir=stage_dir)
        chosen_chkp = None
        if iteration == config.active_learning_iterations:
            break


if __name__ == "__main__":
    run(Vaihingen3DWLConfig, Vaihingen3DWLDataset)
