"""Training-log loaders and convergence plotting.

Port of the reference's plot_convergence.py loaders/plotters
(compare_trainings :218, compare_active_learning :374,
compare_convergences_segment :539): parses `training_iteration*.txt`
(columns: epoch step out_loss offset_loss accuracy time) and `val_IoUs.txt`
across Log_* directories and renders loss/accuracy/time curves, active-
learning iteration comparisons, and smoothed per-class validation IoUs.

Log files written by weasal_tpu trainers use the same columns as the
reference, so either tool reads either's logs.
"""

from __future__ import annotations

import os
from os.path import exists, isdir, join
from typing import Dict, List, Optional, Sequence

import numpy as np


def load_training_iterations(log_dir: str) -> Dict[int, np.ndarray]:
    """{al_iteration: array[N, 6]} of per-step rows for one log dir."""
    out = {}
    for f in sorted(os.listdir(log_dir)):
        if not f.startswith("training_iteration"):
            continue
        it = int(f[len("training_iteration"):-len(".txt")])
        rows = []
        with open(join(log_dir, f)) as fh:
            header = fh.readline()
            for line in fh:
                parts = line.split()
                if len(parts) >= 6:
                    rows.append([float(p) for p in parts[:6]])
        if rows:
            out[it] = np.array(rows)
    return out


def load_val_ious(log_dir: str) -> np.ndarray:
    """[n_epochs, n_classes] validation IoUs for one log dir."""
    path = join(log_dir, "val_IoUs.txt")
    if not exists(path):
        return np.zeros((0, 0))
    rows = []
    with open(path) as f:
        for line in f:
            vals = [float(v) for v in line.split()]
            if vals:
                rows.append(vals)
    if not rows:
        return np.zeros((0, 0))
    width = max(len(r) for r in rows)
    return np.array([r + [np.nan] * (width - len(r)) for r in rows])


def running_mean(x: np.ndarray, n: int) -> np.ndarray:
    """Centered moving average with count-normalized edges (like the
    reference's sig_sum/sig_num, plot_convergence.py:81-83 — plain
    zero-padded convolution would deflate the first/last n plotted
    values by up to ~2x)."""
    if n <= 1 or x.shape[0] < 2 * n:
        return x
    kernel = np.ones(2 * n + 1)
    sums = np.convolve(x, kernel, mode="same")
    counts = np.convolve(np.ones_like(x), kernel, mode="same")
    return sums / counts


def _log_label(log_dir: str, label: Optional[str]) -> str:
    return label or os.path.basename(log_dir.rstrip("/"))


def compare_trainings(log_dirs: Sequence[str],
                      labels: Optional[Sequence[str]] = None,
                      out_path: Optional[str] = None,
                      smooth: int = 10):
    """Loss / accuracy / wall-time curves for several logs."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 3, figsize=(15, 4))
    for i, log_dir in enumerate(log_dirs):
        label = _log_label(log_dir, labels[i] if labels else None)
        iters = load_training_iterations(log_dir)
        if not iters:
            continue
        rows = np.concatenate([iters[k] for k in sorted(iters)], axis=0)
        steps = np.arange(rows.shape[0])
        axes[0].plot(steps, running_mean(rows[:, 2], smooth), label=label)
        axes[1].plot(steps, running_mean(rows[:, 4], smooth), label=label)
        axes[2].plot(steps, rows[:, 5], label=label)
    for ax, title in zip(axes, ["out_loss", "train accuracy",
                                "wall time [s]"]):
        ax.set_title(title)
        ax.set_xlabel("step")
        ax.grid(alpha=0.3)
    axes[0].legend(fontsize=8)
    fig.tight_layout()
    out_path = out_path or "convergence_trainings.png"
    fig.savefig(out_path, dpi=130)
    plt.close(fig)
    return out_path


def compare_active_learning(log_dirs: Sequence[str],
                            labels: Optional[Sequence[str]] = None,
                            out_path: Optional[str] = None):
    """Per-AL-iteration final loss/accuracy comparison."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(11, 4))
    for i, log_dir in enumerate(log_dirs):
        label = _log_label(log_dir, labels[i] if labels else None)
        iters = load_training_iterations(log_dir)
        its = sorted(iters)
        if not its:
            continue
        final_loss = [iters[k][-1, 2] for k in its]
        final_acc = [iters[k][-1, 4] for k in its]
        axes[0].plot(its, final_loss, "o-", label=label)
        axes[1].plot(its, final_acc, "o-", label=label)
    axes[0].set_title("final out_loss per AL iteration")
    axes[1].set_title("final accuracy per AL iteration")
    for ax in axes:
        ax.set_xlabel("active-learning iteration")
        ax.grid(alpha=0.3)
    axes[0].legend(fontsize=8)
    fig.tight_layout()
    out_path = out_path or "convergence_active_learning.png"
    fig.savefig(out_path, dpi=130)
    plt.close(fig)
    return out_path


def compare_convergences_segment(log_dirs: Sequence[str],
                                 class_names: Optional[Sequence[str]] = None,
                                 labels: Optional[Sequence[str]] = None,
                                 out_path: Optional[str] = None,
                                 smooth: int = 2):
    """Smoothed per-class + mean validation IoU curves."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(12, 4.5))
    for i, log_dir in enumerate(log_dirs):
        label = _log_label(log_dir, labels[i] if labels else None)
        ious = load_val_ious(log_dir)
        if ious.size == 0:
            continue
        mean_iou = np.nanmean(ious, axis=1)
        axes[0].plot(running_mean(mean_iou, smooth), label=label)
        if i == 0:
            for c in range(ious.shape[1]):
                name = (class_names[c] if class_names
                        and c < len(class_names) else f"class {c}")
                axes[1].plot(running_mean(ious[:, c], smooth), label=name,
                             linewidth=0.9)
    axes[0].set_title("validation mIoU")
    axes[0].set_xlabel("epoch")
    axes[0].legend(fontsize=8)
    axes[1].set_title(f"per-class IoU ({_log_label(log_dirs[0], None)})")
    axes[1].set_xlabel("epoch")
    axes[1].legend(fontsize=6, ncol=2)
    for ax in axes:
        ax.grid(alpha=0.3)
    fig.tight_layout()
    out_path = out_path or "convergence_val_ious.png"
    fig.savefig(out_path, dpi=130)
    plt.close(fig)
    return out_path


def find_logs(results_root: str = "results",
              stage: Optional[str] = None,
              dataset_prefix: Optional[str] = None) -> List[str]:
    """Enumerate Log_* directories, optionally filtered by stage/dataset."""
    from weasal_tpu.config import Config
    stages = [stage] if stage else ["WeakLabel", "PseudoLabel"]
    logs = []
    for st in stages:
        root = join(results_root, st)
        if not isdir(root):
            continue
        for d in sorted(os.listdir(root)):
            full = join(root, d)
            if not d.startswith("Log") or not isdir(full):
                continue
            if dataset_prefix:
                try:
                    cfg = Config()
                    cfg.load(full)
                except Exception:
                    continue
                if not cfg.dataset.startswith(dataset_prefix):
                    continue
            logs.append(full)
    return logs
