#!/usr/bin/env python
"""Explain the saturated-batch bench line (VERDICT r3 weak #6 / next #6).

BENCH_r03 showed B=9 at ~323k pts/s vs B=3 at ~357k — *lower* per-point
throughput at the bigger batch, contradicting the amortization story.
Hypothesis: the two lines were never shape-equivalent. bench.py calibrates
each line's ShapePlan from exactly its own `batch_num` sampled spheres, so
B=9 takes a p100 over 3x more samples — a larger per-sphere level-0 budget
and wider measured band windows (order statistics of the max), i.e. a
bigger padded program per sphere, not a slower chip.

This script measures both batch sizes twice on hardware:
  * `self` — each line calibrated from its own spheres (what bench.py did
    through round 3), reproducing the anomaly;
  * `shared` — both lines run under ONE plan calibrated from a common
    9-sphere pool (shape-equivalent programs), where per-point cost should
    be flat or falling with B.
and prints per-line plan sizes (level-0 budget, band windows) next to the
measured device times so the shape difference is visible, not inferred.

Usage: /opt/venv/bin/python scripts/profile_batch_scaling.py
(TPU; ~6 compiles, a few minutes.)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import bench_fused_step, build_bench_problem


def line(config, plan, batch_num, tag, calibrated_from):
    config.batch_num = batch_num
    r = bench_fused_step(config, plan, steps=8,
                         trace_dir=f"/tmp/weasal_bscale_{tag}_{batch_num}",
                         density=7.0)
    bands = plan.bands or {}
    return dict(
        tag=tag, batch_num=batch_num, calibrated_from=calibrated_from,
        step_time_ms=round(r["step_time_ms"], 2),
        points_per_sec=round(r["points_per_sec"], 1),
        us_per_real_point=round(r["step_time_ms"] * 1e3
                                / max(r["real_points"], 1), 3),
        real_points=r["real_points"],
        padded_points_l0=int(plan.num_points[0]) * batch_num,
        plan_num_points=[int(n) for n in plan.num_points],
        bands_kpconv={k: [int(x) for x in v]
                      for k, v in bands.get("kpconv", {}).items()},
        bands_search={k: [int(x) for x in v]
                      for k, v in bands.get("search", {}).items()},
        stages=r["stages"],
    )


def main():
    from weasal_tpu.utils.platform import enable_persistent_compile_cache
    enable_persistent_compile_cache()
    out = []
    # --- per-line calibration (bench.py <= r3): reproduces the anomaly ---
    for b in (3, 9):
        config, _batch, plan = build_bench_problem("vaihingen", batch_num=b)
        out.append(line(config, plan, b, "self", f"own {b}-sphere pool"))

    # --- one shared plan from a 9-sphere pool: shape-equivalent lines ---
    config, _batch, plan = build_bench_problem("vaihingen", batch_num=9)
    for b in (3, 9):
        out.append(line(config, plan, b, "shared", "common 9-sphere pool"))

    by = {(r["tag"], r["batch_num"]): r for r in out}
    s3, s9 = by[("self", 3)], by[("self", 9)]
    h3, h9 = by[("shared", 3)], by[("shared", 9)]
    # ONE parseable JSON object: all four lines + the summary (ADVICE r4
    # #3 — stdout is a single stream, prose lines are '#'-prefixed).
    print(json.dumps({
        "lines": out,
        "summary": {
            "self_us_per_pt": {"b3": s3["us_per_real_point"],
                               "b9": s9["us_per_real_point"]},
            "shared_us_per_pt": {"b3": h3["us_per_real_point"],
                                 "b9": h9["us_per_real_point"]},
            "plan_l0_budget_per_sphere": {
                "self_b3": s3["plan_num_points"][0],
                "self_b9": s9["plan_num_points"][0],
                "shared": h9["plan_num_points"][0]},
        },
    }))
    print("# self-calibrated (round-3 bench):  B=3 %.3f us/pt   B=9 %.3f us/pt"
          % (s3["us_per_real_point"], s9["us_per_real_point"]))
    print("# shared plan (shape-equivalent):   B=3 %.3f us/pt   B=9 %.3f us/pt"
          % (h3["us_per_real_point"], h9["us_per_real_point"]))


if __name__ == "__main__":
    main()
