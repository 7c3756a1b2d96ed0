#!/usr/bin/env python
"""Measure per-kernel-point column occupancy inside the banded KPConv
windows (VERDICT r3 #9 — the go/no-go measurement for a two-tier per-p
prefilter / per-p sub-window).

Context: the banded kernel (ops/pallas/kpconv_banded.py) rebuilds the
[T, Q] influence matrix once per kernel point p; round 3 measured that a
bbox skip test at (p, 128-column-block) granularity keeps ~96% of the
work (the window spans 5-10 m of sorted scan-line extent while kp_extent
is 0.3-1.4 m, so the block bbox nearly always intersects most influence
balls). The remaining hypothesis: WITHIN a surviving block, each kernel
point's ACTIVE columns (membership AND influence > 0) might occupy only a
narrow, p-dependent sub-range — in which case a per-p shifted sub-window
(or an 8-column-segment mask computed once and reused across the 15
kernel points) would cut the per-p work.

This probe computes, from the exact geometry the kernel sees (the fused
device pyramid run on CPU), per level and kernel point:
  * span_frac: (max active col - min active col + 1) / window width — the
    fraction of the fetched window a per-p contiguous sub-window would
    still have to cover;
  * seg_frac: fraction of 8-wide column segments with any active pair —
    the ceiling on segment-mask savings;
  * dead_frac: fraction of (p, target-block) pairs with NO active pair
    (the block-granularity skip rate, cross-checking round 3's ~4%).

Active pairs only arise at real neighbor entries, so the statistics are
computed from the neighbor lists directly (no dense [T, Q] build needed).

Usage:
    python scripts/probe_kp_occupancy.py --data_root full_run/mid/root/...
        [--spheres 4] [--blocks 40]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("WEASAL_PLATFORM", "cpu")
from weasal_tpu.utils.platform import apply_platform_env
apply_platform_env()

import numpy as np

QUANTUM = 128
SEG = 8


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_root", required=True)
    ap.add_argument("--spheres", type=int, default=4)
    ap.add_argument("--blocks", type=int, default=40,
                    help="sampled 128-row target blocks per level")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from train_Vaihingen3D_WeakLabel import Vaihingen3DWLConfig
    from weasal_tpu.data.datasets import Vaihingen3DWLDataset
    from weasal_tpu.data.level0 import Level0BatchSource
    from weasal_tpu.kernels.kernel_points import load_kernels

    cfg = Vaihingen3DWLConfig()
    cfg.device_pyramid = True
    cfg.saving = False
    ds = Vaihingen3DWLDataset(cfg, split="training",
                              data_root=args.data_root,
                              rng=np.random.default_rng(args.seed))
    plan = ds.calibration()
    src = Level0BatchSource(ds, plan)
    rng = np.random.default_rng(args.seed)

    # The exact fused pipeline, on CPU: sorted levels + neighbor lists
    import jax
    from weasal_tpu.ops.pyramid import batch_from_device_pyramid

    def build(batch):
        return batch_from_device_pyramid(
            batch["points0"], batch["mask0"], batch["features"],
            batch["labels"], cfg, plan, batch["center_pts"],
            rotations=batch["rotations"], cloud_lb=batch["cloud_lb"],
            region_inds=batch["region_inds"],
            region_masks=batch["region_masks"],
            region_point_masks=batch["region_point_masks"],
            region_lb=batch["region_lb"])

    build = jax.jit(build)

    L = cfg.num_layers
    stats = {l: dict(span=[], seg=[], dead=0, total=0, win=[], occ=[],
                     pblk=[])
             for l in range(L)}
    n_batches = max(1, args.spheres // max(cfg.batch_num, 1))
    brng = np.random.default_rng(args.seed + 1)

    for _ in range(n_batches):
        batch, _ = src.next_batch(rng, plan)
        pyr = build(batch)
        for l in range(L):
            pts = np.asarray(pyr.points[l])        # [B, N_l, 3]
            nbs = np.asarray(pyr.neighbors[l])     # [B, N_l, K]
            masks = np.asarray(pyr.masks[l])
            radius = (cfg.first_subsampling_dl * cfg.conv_radius
                      * (2 ** l))
            ext = radius * cfg.KP_extent / cfg.conv_radius
            kp = load_kernels(radius, cfg.num_kernel_points, 3,
                              cfg.fixed_kernel_points,
                              rng=np.random.default_rng(0))   # [P, 3]
            P = kp.shape[0]
            for b in range(pts.shape[0]):
                n_s = int(masks[b].sum())
                n_blocks = max(n_s // QUANTUM, 1)
                for _ in range(max(args.blocks // (n_batches
                                                   * pts.shape[0]), 1)):
                    j = int(brng.integers(0, n_blocks))
                    t0, t1 = j * QUANTUM, min((j + 1) * QUANTUM, n_s)
                    nb = nbs[b, t0:t1]                     # [T, K]
                    valid = nb < n_s
                    if not valid.any():
                        continue
                    rows = np.repeat(np.arange(t0, t1), nb.shape[1])
                    cols = nb.reshape(-1)
                    ok = valid.reshape(-1)
                    rows, cols = rows[ok], cols[ok]
                    # fetched window: neighbor span quantized to 128-row
                    # blocks (+1 block slack), like the kernel's n_win
                    qlo = (cols.min() // QUANTUM) * QUANTUM
                    qhi = ((cols.max() // QUANTUM) + 1) * QUANTUM
                    win = qhi - qlo
                    # The kernel already skips 128-column blocks with no
                    # member at all (all kernel points at once) — the
                    # honest baseline for per-p savings is the OCCUPIED
                    # blocks, not the fetched window.
                    occ_blocks = np.unique((cols - qlo) // QUANTUM)
                    n_occ = occ_blocks.size
                    occupied = n_occ * QUANTUM
                    # per-pair kernel-point distances: [n_pairs, P]
                    rel = pts[b, cols] - pts[b, rows]      # [n_pairs, 3]
                    d = np.linalg.norm(
                        rel[:, None, :] - kp[None, :, :], axis=-1)
                    act = d < ext                          # [n_pairs, P]
                    stats[l]["win"].append(win)
                    stats[l]["occ"].append(occupied / win)
                    blk_of = {int(v): i for i, v in enumerate(occ_blocks)}
                    for p in range(P):
                        c = cols[act[:, p]]
                        stats[l]["total"] += 1
                        if c.size == 0:
                            stats[l]["dead"] += 1
                            continue
                        # fraction of OCCUPIED blocks this p touches
                        pb = np.unique((c - qlo) // QUANTUM)
                        stats[l]["pblk"].append(pb.size / n_occ)
                        # 8-wide segment occupancy within occupied blocks
                        segs = np.unique((c - qlo) // SEG).size
                        stats[l]["seg"].append(segs / (occupied // SEG))
                        # contiguous span in occupied-block coordinates
                        first = blk_of[int(pb[0])]
                        last = blk_of[int(pb[-1])]
                        span_occ = (last - first + 1) * QUANTUM
                        stats[l]["span"].append(span_occ / occupied)

    print(f"\nPer-kernel-point column occupancy inside the fetched window "
          f"(P={cfg.num_kernel_points}, {args.spheres} spheres, "
          f"geometry: in_radius={cfg.in_radius}, dl="
          f"{cfg.first_subsampling_dl}):\n")
    print(f"{'lvl':>3} {'window rows':>12} {'occupied %':>11} "
          f"{'dead p-blk %':>13} {'p-blk p50':>10} {'span p50':>9} "
          f"{'seg-occ p50':>12} {'seg-occ p90':>12}")
    for l in range(L):
        s = stats[l]
        if not s["span"]:
            print(f"{l:>3} (no samples)")
            continue
        span = np.array(s["span"])
        seg = np.array(s["seg"])
        pblk = np.array(s["pblk"])
        print(f"{l:>3} {np.mean(s['win']):>12.0f} "
              f"{100 * np.mean(s['occ']):>10.1f}% "
              f"{100 * s['dead'] / max(s['total'], 1):>12.1f}% "
              f"{np.percentile(pblk, 50):>10.2f} "
              f"{np.percentile(span, 50):>9.2f} "
              f"{np.percentile(seg, 50):>12.2f} "
              f"{np.percentile(seg, 90):>12.2f}")
    print(
        "\nReading — all per-p columns are relative to the OCCUPIED blocks "
        "(the kernel already skips memberless 128-col blocks for all "
        "kernel points at once): p-blk = fraction of occupied blocks a "
        "kernel point touches (its per-p BLOCK skip opportunity is "
        "1 - p-blk; round 3 measured ~96% survival with a bbox test); "
        "span = per-p contiguous block-span coverage (a shifted per-p "
        "sub-window saves 1 - span); seg-occ = 8-wide column segment "
        "occupancy (a segment mask's ceiling is 1 - seg-occ, before "
        "overhead). 'occupied %' = occupied fraction of the fetched "
        "window (fetch-only waste; no [T,Q] compute is spent there).")


if __name__ == "__main__":
    main()
