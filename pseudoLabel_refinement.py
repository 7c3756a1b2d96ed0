#!/usr/bin/env python
"""Refine pseudo labels with ground-truth weak region labels.

Mirrors the reference pseudoLabel_refinement.py: combines the WL tester's
predictions/probabilities with per-point weak-label masks and writes the
refined pseudo-label txt + class-weight file consumed by PL training.

Usage:
    python pseudoLabel_refinement.py --weak_label_log Log_... \
        [--threshold 20] [--data_root ...]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from weasal_tpu.utils.platform import apply_platform_env
apply_platform_env()

from weasal_tpu.train.refinement import refine_pseudo_labels


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--weak_label_log", required=True)
    parser.add_argument("--threshold", type=int, default=20,
                        help="max-prob cutoff %% "
                             "(default 20; use 10 for DALES)")
    parser.add_argument("--data_root", default=None)
    args = parser.parse_args(argv)

    refine_pseudo_labels(args.weak_label_log, args.threshold,
                         data_root=args.data_root)


if __name__ == "__main__":
    main()
