"""Confusion-matrix reporting: analysis + png/pdf heatmap plots.

Functional port of the reference's utils/conf_matrix.py (create/analize/
plot/print_to_file): builds confusions with asymmetric gt/pred label sets,
derives per-class precision/recall/F1/IoU and overall accuracy, and renders
a heatmap with per-class F1/IoU rows and class frequencies.
"""

from __future__ import annotations

import os
from os.path import join
from typing import Dict, Optional, Sequence

import numpy as np

from weasal_tpu.utils.metrics import fast_confusion


def create(gt: np.ndarray, pred: np.ndarray,
           label_values: Optional[Sequence[int]] = None,
           pred_label_values: Optional[Sequence[int]] = None) -> np.ndarray:
    """Confusion matrix (rows = ground truth).

    With `pred_label_values`, builds the reference's asymmetric/unbalanced
    matrix (reference utils/conf_matrix.py:17-84): rows indexed by
    `label_values` (gt classes), columns by `pred_label_values` — possibly
    rectangular.
    """
    if label_values is None:
        label_values = np.unique(np.hstack((gt, pred)))
    if pred_label_values is None:
        return fast_confusion(gt, pred, np.asarray(label_values))

    def continuous(data, labels):
        labels = np.asarray(labels, np.int64)
        data = np.asarray(data, np.int64)
        table = np.full(labels.max() + 2, -1, np.int64)
        table[labels] = np.arange(labels.size)
        # Route out-of-range ids (negative ignore labels like -1, or ids
        # above the largest declared label) to the sentinel -1 slot so the
        # `valid` mask drops them — direct table[data] would wrap negative
        # ids to the last class and IndexError on overflow ids.
        safe = np.where((data >= 0) & (data <= labels.max()), data,
                        labels.max() + 1)
        return table[safe], labels.size

    g, n_gt = continuous(gt, label_values)
    p, n_pr = continuous(pred, pred_label_values)
    valid = (g >= 0) & (p >= 0)
    flat = np.bincount(g[valid] * n_pr + p[valid],
                       minlength=n_gt * n_pr)
    return flat.reshape(n_gt, n_pr)


def analyze(confusion: np.ndarray) -> Dict[str, np.ndarray]:
    """Per-class precision/recall/F1/IoU + overall accuracy + frequencies."""
    C = confusion.astype(np.float64)
    tp = np.diagonal(C)
    col = C.sum(axis=0)
    row = C.sum(axis=1)
    precision = tp / np.maximum(col, 1e-9)
    recall = tp / np.maximum(row, 1e-9)
    f1 = 2 * tp / np.maximum(col + row, 1e-9)
    iou = tp / np.maximum(col + row - tp, 1e-9)
    oa = tp.sum() / np.maximum(C.sum(), 1e-9)
    freq = row / np.maximum(C.sum(), 1e-9)
    return dict(precision=precision, recall=recall, f1=f1, iou=iou,
                oa=oa, frequency=freq)


def plot(confusion: np.ndarray,
         label_to_names: Dict[int, str],
         out_dir: str,
         file_suffix: str = "",
         abs_vals: bool = False,
         F1: bool = True,
         iou: bool = True,
         show: bool = False) -> str:
    """Render the confusion heatmap with metric rows; returns the png path.

    Matches the reference call signature used by trainers/testers
    (utils/trainer_WeakLabel.py:538-540, utils/tester_WeakLabel.py:396-398).
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(out_dir, exist_ok=True)
    names = [label_to_names[k] for k in sorted(label_to_names)]
    n = len(names)
    C = np.asarray(confusion, dtype=np.float64)
    if C.shape[0] > n:
        # Tolerate matrices padded with TRAILING unused labels
        C = C[:n, :n]
    elif C.shape[0] < n:
        raise ValueError(
            f"confusion matrix has {C.shape[0]} classes but "
            f"label_to_names declares {n}; pass matching names")

    stats = analyze(C)
    row_sum = C.sum(axis=1, keepdims=True)
    display = C if abs_vals else 100.0 * C / np.maximum(row_sum, 1e-9)

    extra_rows = int(F1) + int(iou)
    fig_h = 1.0 + 0.5 * (n + extra_rows)
    fig, ax = plt.subplots(figsize=(1.8 + 0.75 * n, fig_h))
    ax.imshow(display, cmap="Blues", aspect="auto",
              vmin=0, vmax=display.max() if abs_vals else 100)

    for i in range(n):
        for j in range(n):
            v = display[i, j]
            txt = f"{v:.0f}" if abs_vals else f"{v:.1f}"
            ax.text(j, i, txt, ha="center", va="center", fontsize=7,
                    color="black" if v < 0.6 * max(display.max(), 1)
                    else "white")

    ax.set_xticks(range(n))
    ax.set_xticklabels(names, rotation=45, ha="right", fontsize=7)
    ylabels = [f"{nm}  ({100 * f:.1f}%)"
               for nm, f in zip(names, stats["frequency"])]
    ax.set_yticks(range(n))
    ax.set_yticklabels(ylabels, fontsize=7)
    ax.set_xlabel("Prediction")
    ax.set_ylabel("Ground truth (class frequency)")

    title = f"OA = {100 * stats['oa']:.2f}%"
    if F1:
        title += f"   mean F1 = {100 * stats['f1'].mean():.2f}%"
    if iou:
        title += f"   mIoU = {100 * stats['iou'].mean():.2f}%"
    ax.set_title(title, fontsize=9)

    lines = []
    if F1:
        lines.append("F1:   " + " ".join(f"{100 * v:5.1f}"
                                         for v in stats["f1"]))
    if iou:
        lines.append("IoU:  " + " ".join(f"{100 * v:5.1f}"
                                         for v in stats["iou"]))
    if lines:
        fig.text(0.01, 0.01, "\n".join(lines), family="monospace",
                 fontsize=7)

    fig.tight_layout(rect=(0, 0.04 * len(lines), 1, 1))
    base = join(out_dir, f"conf_matrix_{file_suffix}" if file_suffix
                else "conf_matrix")
    fig.savefig(base + ".png", dpi=150)
    fig.savefig(base + ".pdf")
    if show:                                      # pragma: no cover
        plt.show()
    plt.close(fig)
    return base + ".png"


def print_to_file(confusion: np.ndarray, label_to_names: Dict[int, str],
                  path: str) -> None:
    """Write the raw confusion + per-class metrics as text."""
    stats = analyze(confusion)
    names = [label_to_names[k] for k in sorted(label_to_names)]
    with open(path, "w") as f:
        f.write("confusion (rows = ground truth):\n")
        for i, nm in enumerate(names):
            f.write(nm.ljust(20)
                    + " ".join(f"{int(v):8d}" for v in confusion[i]) + "\n")
        f.write(f"\nOA = {100 * stats['oa']:.2f}%\n")
        for key in ("precision", "recall", "f1", "iou"):
            f.write(key.ljust(10) + " ".join(
                f"{100 * v:6.2f}" for v in stats[key]) + "\n")
