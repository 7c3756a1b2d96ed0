#!/usr/bin/env python
"""Merge an interrupted reference-torch quality run with its resumed half.

The reference trainer truncates training_iteration<al>.txt at the start of
every run (trainer_WeakLabel.py:137-144), so a run resumed with
run_reference_baseline.py --resume_chkp must write into a FRESH
--saving_path. This script splices the two log dirs into one that
compare_quality.py / plot_convergence can read:

  * training_iteration0.txt: original rows, then resumed rows (the resumed
    half's epoch column is correct — the trainer restores self.epoch from
    the checkpoint — but its time column restarts at 0; times are shifted
    by the original run's last timestamp so the merged column stays
    monotonic).
  * val_IoUs.txt: original rows, then resumed rows (with --val_first the
    resumed run's first row is the validation the crash interrupted).

Usage:
    python scripts/merge_ref_logs.py --orig <dir> --resume <dir> --out <dir>
"""

import argparse
import os
import shutil


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--orig", required=True)
    ap.add_argument("--resume", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--al_iteration", type=int, default=0)
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    name = f"training_iteration{args.al_iteration}.txt"

    with open(os.path.join(args.orig, name)) as f:
        orig_lines = f.read().splitlines()
    with open(os.path.join(args.resume, name)) as f:
        resume_lines = f.read().splitlines()

    # Row format: epoch step out_loss offset_loss acc time  (header first).
    # The original run died mid-write by definition, so its last line may be
    # truncated (fewer than 6 columns, or a column cut mid-token): take
    # t_last from the last COMPLETE row and drop any trailing partial row
    # rather than misreading e.g. the acc column as a timestamp.
    def complete(parts):
        if len(parts) < 6:
            return False
        try:
            [float(v) for v in parts]
        except ValueError:
            return False
        return True

    while len(orig_lines) > 1 and not complete(orig_lines[-1].split()):
        orig_lines.pop()
    t_last = float(orig_lines[-1].split()[-1]) if len(orig_lines) > 1 else 0.0
    merged = list(orig_lines)
    for line in resume_lines[1:]:                      # drop resumed header
        parts = line.split()
        if complete(parts):
            parts[-1] = f"{float(parts[-1]) + t_last:.3f}"
            merged.append(" ".join(parts))
    with open(os.path.join(args.out, name), "w") as f:
        f.write("\n".join(merged) + "\n")

    rows = []
    for d in (args.orig, args.resume):
        p = os.path.join(d, "val_IoUs.txt")
        if os.path.exists(p):
            with open(p) as f:
                rows += [ln for ln in f.read().splitlines() if ln.strip()]
    with open(os.path.join(args.out, "val_IoUs.txt"), "w") as f:
        f.write("\n".join(rows) + "\n")

    # parameters.txt (either copy parses identically) for log loaders that
    # want the config next to the rows
    for d in (args.orig, args.resume):
        src = os.path.join(d, "parameters.txt")
        if os.path.exists(src):
            shutil.copy(src, os.path.join(args.out, "parameters.txt"))
            break

    print(f"merged {len(merged) - 1} training rows + {len(rows)} val rows "
          f"-> {args.out}")


if __name__ == "__main__":
    main()
