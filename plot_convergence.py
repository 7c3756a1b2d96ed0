#!/usr/bin/env python
"""Plot training convergence across logs.

Mirrors the reference plot_convergence.py: loss/accuracy/time curves,
active-learning iteration comparisons and smoothed per-class validation
IoUs, parsed from `training_iteration*.txt` / `val_IoUs.txt`.

Usage:
    python plot_convergence.py [--logs results/WeakLabel/Log_a ...]
        [--stage WeakLabel|PseudoLabel] [--dataset Vaihingen3D]
        [--out_dir plots]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from weasal_tpu.utils.convergence import (
    compare_active_learning, compare_convergences_segment,
    compare_trainings, find_logs)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--logs", nargs="*", default=None)
    parser.add_argument("--stage", default=None,
                        choices=[None, "WeakLabel", "PseudoLabel"])
    parser.add_argument("--dataset", default=None)
    parser.add_argument("--out_dir", default="plots")
    args = parser.parse_args(argv)

    logs = args.logs or find_logs(stage=args.stage,
                                  dataset_prefix=args.dataset)
    if not logs:
        print("No logs found.")
        return
    # Bare log names resolve under results/<stage>/ (reference
    # plot_convergence.py uses the same results-relative convention)
    resolved = []
    for log in logs:
        if not os.path.isdir(log) and args.stage:
            candidate = os.path.join("results", args.stage, log)
            log = candidate if os.path.isdir(candidate) else log
        resolved.append(log)
    logs = resolved

    os.makedirs(args.out_dir, exist_ok=True)
    print("Comparing logs:")
    for log in logs:
        print("  " + log)

    p1 = compare_trainings(
        logs, out_path=os.path.join(args.out_dir,
                                    "convergence_trainings.png"))
    p2 = compare_active_learning(
        logs, out_path=os.path.join(args.out_dir,
                                    "convergence_active_learning.png"))
    p3 = compare_convergences_segment(
        logs, out_path=os.path.join(args.out_dir,
                                    "convergence_val_ious.png"))
    print("Wrote:", p1, p2, p3)


if __name__ == "__main__":
    main()
