"""Loader-level debug harnesses.

Counterpart of the reference's dataset debug functions
(datasets/Vaihingen3D_WeakLabel.py:1522-1690: debug_timing,
debug_upsampling, debug_show_clouds, debug_batch_and_neighbors_calib) for
the dense-batch data layer: sampling throughput, index sanity, visual dumps
and plan-vs-observed neighbor statistics.
"""

from __future__ import annotations

import time
from typing import Optional

import numpy as np


def debug_timing(dataset, plan, num_batches: int = 20,
                 rng: Optional[np.random.Generator] = None):
    """Measure host batch-generation throughput (spheres/s, points/s)."""
    rng = rng or np.random.default_rng(0)
    t0 = time.perf_counter()
    spheres = points = 0
    dts = []
    for _ in range(num_batches):
        t1 = time.perf_counter()
        batch, metas = dataset.next_batch(rng, plan)
        dts.append(time.perf_counter() - t1)
        spheres += len(metas)
        points += int(np.sum(np.asarray(batch.lengths[0])))
    total = time.perf_counter() - t0
    stats = dict(batches=num_batches, spheres_per_s=spheres / total,
                 points_per_s=points / total,
                 mean_batch_ms=1000 * np.mean(dts),
                 p95_batch_ms=1000 * np.percentile(dts, 95))
    print("debug_timing:", stats)
    return stats


def debug_upsampling(dataset, plan, num_batches: int = 3,
                     rng: Optional[np.random.Generator] = None):
    """Sanity-check pyramid indices: ranges, shadow rates, upsample validity."""
    rng = rng or np.random.default_rng(1)
    for _ in range(num_batches):
        batch, _ = dataset.next_batch(rng, plan)
        L = batch.num_layers
        for l in range(L):
            nb = np.asarray(batch.neighbors[l])
            n_l = batch.points[l].shape[1]
            assert nb.min() >= 0 and nb.max() <= n_l, f"conv inds level {l}"
        for l in range(L - 1):
            pools = np.asarray(batch.pools[l])
            ups = np.asarray(batch.upsamples[l])
            assert pools.max() <= batch.points[l].shape[1]
            assert ups.max() <= batch.points[l + 1].shape[1]
            # Every real fine point must have a valid upsample source
            mask = np.asarray(batch.masks[l])
            real_up = ups[..., 0][mask]
            frac_shadow = np.mean(real_up == batch.points[l + 1].shape[1])
            print(f"level {l}: upsample shadow fraction "
                  f"{100 * frac_shadow:.2f}%")
            assert frac_shadow < 0.05, "too many dangling upsamples"
    print("debug_upsampling: OK")


def debug_show_clouds(dataset, plan, out_dir: str = "debug_clouds",
                      rng: Optional[np.random.Generator] = None):
    """Dump one batch's pyramid as ply + png artifacts."""
    from weasal_tpu.utils.visualizer import show_batch
    rng = rng or np.random.default_rng(2)
    batch, _ = dataset.next_batch(rng, plan)
    return show_batch(batch, out_dir=out_dir)


def debug_batch_and_neighbors_calib(dataset, plan, num_batches: int = 10,
                                    rng: Optional[np.random.Generator] = None):
    """Compare observed neighbor counts against the shape plan's budgets
    (the analog of the reference's calibration histograms)."""
    rng = rng or np.random.default_rng(3)
    L = plan.num_layers
    clipped = [0] * L
    totals = [0] * L
    occupancy = [[] for _ in range(L)]
    for _ in range(num_batches):
        batch, _ = dataset.next_batch(rng, plan)
        for l in range(L):
            nb = np.asarray(batch.neighbors[l])
            mask = np.asarray(batch.masks[l])
            n_l = batch.points[l].shape[1]
            counts = np.sum(nb < n_l, axis=2)[mask]
            full = counts == plan.conv_neighbors[l]
            clipped[l] += int(np.sum(full))
            totals[l] += counts.size
            occupancy[l].append(mask.mean())
    for l in range(L):
        frac = clipped[l] / max(totals[l], 1)
        print(f"level {l}: K={plan.conv_neighbors[l]} "
              f"saturated rows {100 * frac:.1f}% "
              f"(target <= ~10%), point occupancy "
              f"{100 * np.mean(occupancy[l]):.0f}%")
    return clipped, totals
