#!/usr/bin/env python
"""Test any trained model: full voting inference on train/validation/test.

Mirrors the reference test_models.py: picks the latest matching log (or an
explicit path), reloads its parameters.txt, and runs voting inference;
`--on train` generates pseudo labels on the training split for the
refinement stage.

Usage:
    python test_models.py [--log last_Vaihingen3DWL | results/.../Log_x]
        [--on train|validation|test] [--data_root ...] [--num_votes N]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from weasal_tpu.utils.platform import apply_platform_env
apply_platform_env()

import numpy as np

from weasal_tpu.config import Config
from weasal_tpu.data.datasets import DATASET_REGISTRY
from weasal_tpu.train.tester import ModelTester

DEFAULT_VOTES = {"Vaihingen3DWL": 20, "Vaihingen3DPL": 20,
                 "DALESWL": 2, "DALESPL": 2}


def model_choice(chosen_log: str) -> str:
    """Resolve 'last_<DS>' aliases to the newest matching log directory
    (reference test_models.py:46-81)."""
    if chosen_log in ("last_Vaihingen3DWL", "last_Vaihingen3DPL",
                      "last_DALESWL", "last_DALESPL"):
        test_dataset = "_".join(chosen_log.split("_")[1:])
        stage = "WeakLabel" if test_dataset.endswith("WL") else "PseudoLabel"
        results_dir = os.path.join("results", stage)
        logs = np.sort([os.path.join(results_dir, f)
                        for f in os.listdir(results_dir)
                        if f.startswith("Log")])
        for log in logs[::-1]:
            cfg = Config()
            cfg.load(log)
            if cfg.dataset.startswith(test_dataset):
                return log
        raise ValueError(f'No log of the dataset "{test_dataset}" found')
    if not os.path.exists(chosen_log):
        raise ValueError("The given log does not exist: " + chosen_log)
    return chosen_log


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--log", default="last_Vaihingen3DWL")
    parser.add_argument("--on", default="train",
                        choices=["train", "validation", "test"])
    parser.add_argument("--data_root", default=None)
    parser.add_argument("--num_votes", type=int, default=None)
    parser.add_argument("--chkp", default=None,
                        help="checkpoint file (default current_chkp.tar)")
    parser.add_argument("--fused", action="store_true",
                        help="run the voting inference through the fused "
                             "device-pyramid eval step")
    parser.add_argument("--resume", default=None, metavar="LOG_DIR",
                        help="resume an interrupted vote from LOG_DIR's "
                             "vote checkpoint (written at every vote "
                             "boundary; scripts/resumable.sh passes this "
                             "on stall/OOM retries)")
    args = parser.parse_args(argv)

    chosen_log = model_choice(args.resume or args.log)
    print("\nTesting on " + chosen_log)

    chosen_chkp = args.chkp or os.path.join(chosen_log, "checkpoints",
                                            "current_chkp.tar")
    config = Config()
    config.load(chosen_log)
    config.validation_size = 200
    config.input_threads = 10
    config.dropout = 0
    if args.fused:
        config.device_pyramid = True

    split = args.on
    test_on_train = split == "train"
    if test_on_train:
        split = "test"

    dataset_cls = DATASET_REGISTRY[config.dataset]
    num_votes = (args.num_votes if args.num_votes is not None
                 else DEFAULT_VOTES[config.dataset])

    dataset = dataset_cls(config, split=split, test_on_train=test_on_train,
                          data_root=args.data_root)
    stage_dir = ("WeakLabel" if config.dataset.endswith("WL")
                 else "PseudoLabel")
    tester = ModelTester(config, dataset, chosen_chkp)
    tester.cloud_segmentation_test(dataset, num_votes,
                                   test_on_train=test_on_train,
                                   stage_dir=stage_dir,
                                   resume=args.resume is not None)


if __name__ == "__main__":
    main()
