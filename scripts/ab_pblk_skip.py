#!/usr/bin/env python
"""Hardware A/B of the per-(kernel-point, block) skip kernel path.

VERDICT r4 #1: the round-4 bench crash ("TPU worker process crashed")
happened on the first Vaihingen-shape execution of the then-new
`pallas_pblk_skip=True` kernel default, which had only ever run on
DALES-synthetic shapes and in interpret mode. This probe runs the SAME
fused step bench.py runs, at the same shapes, with the skip path OFF and
ON (one mode per process — run it twice), and prints one JSON line with
the profiler device step time so the modes can be compared and the
default adjudicated on measurement.

Usage: python scripts/ab_pblk_skip.py {on|off} [--geometry vaihingen]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    if os.environ.get("AB_DUMP_EVERY"):
        import faulthandler
        faulthandler.dump_traceback_later(
            int(os.environ["AB_DUMP_EVERY"]), repeat=True, file=sys.stderr)
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["on", "off"])
    ap.add_argument("--geometry", default="vaihingen",
                    choices=["vaihingen", "dales"])
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()

    from bench import build_bench_problem, bench_fused_step
    config, batch, plan = build_bench_problem(args.geometry)
    config.pallas_pblk_skip = (args.mode == "on")
    density = 12.0 if args.geometry == "dales" else 7.0
    r = bench_fused_step(config, plan, steps=args.steps,
                         trace_dir=f"/tmp/ab_pblk_{args.mode}",
                         density=density)
    print(json.dumps({
        "pblk_skip": args.mode,
        "geometry": args.geometry,
        "step_time_ms": round(r["step_time_ms"], 2),
        "points_per_sec": round(r["points_per_sec"], 1),
        "loss": round(r["loss"], 4),
        "stages_us": r["stages"],
    }))


if __name__ == "__main__":
    main()
