#!/usr/bin/env python
"""Summarize a full-budget pipeline run directory (VERDICT r1 #5).

Prints a compact report from a workdir containing results/WeakLabel/Log_*
(+ optional results/PseudoLabel/Log_*), chain_times.txt, and the *.log
files written by chain.sh: per-AL-iteration epoch counts, loss/accuracy
ranges, val-mIoU trajectory (first/peak/last), wall times, kernel-drop
telemetry, and LR-decay confirmation.

Usage: python scripts/summarize_full_run.py /root/full_run
"""

import glob
import os
import re
import sys

import numpy as np


def summarize_log_dir(log_dir):
    print(f"\n== {log_dir}")
    for it_file in sorted(glob.glob(os.path.join(
            log_dir, "training_iteration*.txt"))):
        rows = []
        with open(it_file) as f:
            header = f.readline()
            for line in f:
                parts = line.split()
                if len(parts) >= 6:
                    try:
                        rows.append([float(p) for p in parts[:6]])
                    except ValueError:
                        pass
        if not rows:
            continue
        a = np.array(rows)
        epochs = int(a[-1, 0]) + 1
        steps = len(a)
        print(f"  {os.path.basename(it_file)}: {epochs} epochs, "
              f"{steps} steps, loss {a[0, 2]:.3f} -> "
              f"{np.mean(a[-50:, 2]):.3f} (mean last 50), "
              f"acc {np.mean(a[:50, 4]):.2f} -> {np.mean(a[-50:, 4]):.2f}, "
              f"wall {a[-1, 5] / 3600:.2f} h")
        hdr = header.strip().split("\t")[-1] if "\t" in header else ""
        if hdr:
            print(f"    header note: {hdr}")

    iou_file = os.path.join(log_dir, "val_IoUs.txt")
    if os.path.exists(iou_file):
        mious = []
        with open(iou_file) as f:
            for line in f:
                vals = [float(v) for v in line.split()]
                if vals:
                    mious.append(100 * np.mean(vals))
        if mious:
            peak = int(np.argmax(mious))
            print(f"  val mIoU: {len(mious)} epochs, first "
                  f"{mious[0]:.1f}%, peak {max(mious):.1f}% (ep {peak}), "
                  f"last {mious[-1]:.1f}%")

    sat_file = os.path.join(log_dir, "plan_saturation.txt")
    if os.path.exists(sat_file):
        drops = []
        warns = 0
        with open(sat_file) as f:
            for line in f:
                m = re.search(r"kernel_drops (\d+)", line)
                if m:
                    drops.append(int(m.group(1)))
                m = re.search(r"warnings (\d+)", line)
                if m:
                    warns += int(m.group(1))
        if drops:
            print(f"  kernel_drops/epoch: min {min(drops)} max "
                  f"{max(drops)} (telemetry); saturation warnings {warns}")


def main():
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/root/full_run"
    times = os.path.join(workdir, "chain_times.txt")
    if os.path.exists(times):
        print("chain stages:")
        with open(times) as f:
            print("  " + "  ".join(f.read().splitlines()))
    for stage in ("WeakLabel", "PseudoLabel"):
        for log_dir in sorted(glob.glob(os.path.join(
                workdir, "results", stage, "Log_*"))):
            summarize_log_dir(log_dir)
    for name in ("wl.log", "pl.log", "wl_train.log", "pl_train.log",
                 "wl_probdump.log", "pl_eval.log"):
        path = os.path.join(workdir, name)
        if os.path.exists(path):
            with open(path) as f:
                txt = f.read()
            mious = re.findall(r"mean IoU = ([\d.]+)%", txt)
            if mious:
                vals = [float(v) for v in mious]
                print(f"\n{name}: {len(vals)} validations, first "
                      f"{vals[0]:.1f}%, peak {max(vals):.1f}%, "
                      f"last {vals[-1]:.1f}%")


if __name__ == "__main__":
    main()
