#!/usr/bin/env python
"""Summarize the AL-acquisition ablation (scripts/run_al_ablation.sh).

Each arm (entropy | random) trains AL_ITERS+1 times from scratch, with
`max_epoch` validation rows appended per iteration to the SAME
val_IoUs.txt (trainer contract). This tool chunks those rows back into
iterations, reports per-iteration val mIoU (peak and mean-of-last-3
epochs) for both arms at identical label budget, and writes a comparison
plot.

Usage:
    python scripts/compare_al.py --workdir full_run/al_ab [--plot out.png]
"""

import argparse
import os
import sys
from os.path import join

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def load_arm(workdir: str, arm: str):
    log_dir = join(workdir, arm, "results", "WeakLabel", f"Log_{arm}")
    val_file = join(log_dir, "val_IoUs.txt")
    ious = np.loadtxt(val_file, ndmin=2)          # [n_rows, n_classes]
    miou = 100.0 * ious.mean(axis=1)

    # epochs per AL iteration from the saved config; iteration count from
    # the training_iteration{i}.txt files actually written
    from weasal_tpu.config import Config
    cfg = Config()
    cfg.load(log_dir)
    iters = sorted(int(f[len("training_iteration"):-len(".txt")])
                   for f in os.listdir(log_dir)
                   if f.startswith("training_iteration"))
    per_iter = cfg.max_epoch
    chunks = []
    for it in iters:
        rows = miou[it * per_iter:(it + 1) * per_iter]
        if rows.size == 0:
            break
        chunks.append(rows)
    return cfg, chunks


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--plot", default=None,
                    help="output png (default <workdir>/al_efficacy.png)")
    args = ap.parse_args()

    arms = {}
    for arm in ("entropy", "random"):
        try:
            arms[arm] = load_arm(args.workdir, arm)
        except (OSError, ValueError) as e:
            print(f"[{arm}] unreadable ({e}) — skipped")
    if not arms:
        sys.exit("no arm results under " + args.workdir)

    any_cfg = next(iter(arms.values()))[0]
    budget0 = any_cfg.initial_labels_per_file
    added = any_cfg.added_labels_per_epoch
    print(f"\nAL efficacy at identical label budget "
          f"(initial {budget0}/file, +{added}/acquisition):\n")
    print(f"{'iter':>4} {'budget/file':>12} "
          + " ".join(f"{arm + ' peak':>14} {arm + ' last3':>14}"
                     for arm in arms))
    n_iters = max(len(c) for _, c in arms.values())
    for it in range(n_iters):
        cols = []
        for arm, (_, chunks) in arms.items():
            if it < len(chunks):
                rows = chunks[it]
                cols.append(f"{rows.max():>13.1f}% "
                            f"{rows[-3:].mean():>13.1f}%")
            else:
                cols.append(f"{'—':>14} {'—':>14}")
        print(f"{it:>4} {budget0 + it * added:>12} " + " ".join(cols))

    plot_path = args.plot or join(args.workdir, "al_efficacy.png")
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(7, 4.5))
        for arm, (_, chunks) in arms.items():
            x = np.arange(sum(len(c) for c in chunks))
            y = np.concatenate(chunks)
            ax.plot(x, y, label=f"{arm} acquisition", linewidth=1.4)
            for b in np.cumsum([len(c) for c in chunks[:-1]]):
                ax.axvline(b, color="gray", linestyle=":", linewidth=0.7)
        ax.set_xlabel("training epoch (iterations separated by dotted "
                      "lines; each iteration restarts from scratch with "
                      "a larger ledger)")
        ax.set_ylabel("val mIoU (%)")
        ax.set_title("Active-learning acquisition: entropy vs random "
                     "at equal label budget")
        ax.legend()
        fig.tight_layout()
        fig.savefig(plot_path, dpi=130)
        print(f"\nplot: {plot_path}")
    except Exception as e:   # matplotlib optional
        print(f"\n(plot skipped: {e})")


if __name__ == "__main__":
    main()
