#!/usr/bin/env python
"""Quality-trajectory parity: this framework vs the ACTUAL reference.

Compares two training logs produced at an identical scaled budget on the
same synthetic data with the same label budget (VERDICT r2 #1):

  * ours — an entry-script run of this framework (e.g.
    train_Vaihingen3D_WeakLabel.py on full_run/quality_root)
  * ref  — the reference's own torch pipeline at the same epochs/steps/
    validation protocol (scripts/run_reference_baseline.py --train_epochs)

Both write the same log contract (training_iteration0.txt + val_IoUs.txt —
the reference's format, weasal_tpu/utils/convergence.py loaders), so the
comparison needs no side channels. Prints a matched-step mIoU table and
renders loss + val-mIoU trajectories side by side.

Usage:
    python scripts/compare_quality.py \
        --ours full_run/quality/ours_log --ref full_run/quality/ref_log \
        --out full_run/quality/quality_parity.png
"""

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from weasal_tpu.utils.convergence import (  # noqa: E402
    load_training_iterations, load_val_ious, running_mean)


def _mious(log_dir):
    """[n_epochs] mean-over-classes validation IoU."""
    ious = load_val_ious(log_dir)
    if ious.size == 0:
        return np.zeros(0)
    return np.nanmean(ious, axis=1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ours", required=True)
    ap.add_argument("--ref", required=True)
    ap.add_argument("--out", default=os.path.join(
        REPO, "full_run", "quality", "quality_parity.png"))
    ap.add_argument("--epoch_steps", type=int, default=200,
                    help="steps per epoch (for the matched-step table)")
    args = ap.parse_args()

    ours_miou, ref_miou = _mious(args.ours), _mious(args.ref)
    n = min(len(ours_miou), len(ref_miou))
    if n == 0:
        print("no val_IoUs.txt rows to compare", file=sys.stderr)
        return 1

    print(f"{'steps':>8} {'ours mIoU':>10} {'ref mIoU':>10} {'delta':>8}")
    worse = 0
    for e in range(n):
        steps = (e + 1) * args.epoch_steps
        d = ours_miou[e] - ref_miou[e]
        worse += d < 0
        print(f"{steps:>8} {100 * ours_miou[e]:>9.1f}% "
              f"{100 * ref_miou[e]:>9.1f}% {100 * d:>+7.1f}%")
    verdict = ("ours >= reference at every matched step count"
               if worse == 0 else
               f"ours behind the reference at {worse}/{n} checkpoints")
    print(f"=> {verdict}")

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(11, 4))
    for log_dir, label, color in ((args.ours, "weasal_tpu", "C0"),
                                  (args.ref, "reference (torch)", "C1")):
        iters = load_training_iterations(log_dir)
        if iters:
            rows = np.concatenate([iters[k] for k in sorted(iters)], axis=0)
            axes[0].plot(np.arange(rows.shape[0]),
                         running_mean(rows[:, 2], 10), color, label=label)
    axes[0].set_title("train loss (matched budget, same data/labels)")
    axes[0].set_xlabel("step")
    epochs = np.arange(1, n + 1) * args.epoch_steps
    axes[1].plot(epochs, 100 * ours_miou[:n], "C0o-", label="weasal_tpu")
    axes[1].plot(epochs, 100 * ref_miou[:n], "C1s-",
                 label="reference (torch)")
    axes[1].set_title("validation mIoU [%]")
    axes[1].set_xlabel("training steps")
    for ax in axes:
        ax.grid(alpha=0.3)
        ax.legend(fontsize=9)
    fig.tight_layout()
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    fig.savefig(args.out, dpi=130)
    print(f"plot: {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
