#!/usr/bin/env python
"""Per-op device-time profile of the fused WL train step on TPU.

Captures a jax.profiler trace of the fused step (via bench.make_fused_step)
and aggregates device self-time by op category from the raw XSpace protos
(weasal_tpu.utils.profiling; the tensorboard_plugin_profile converter is
incompatible with this image's TF/protobuf pairing).

This is the tool that established (round 2):
  * `jax.block_until_ready` does not block through the remote-TPU tunnel,
    so wall-clock loops measure dispatch rate — module-level device time
    is ground truth;
  * the XLA radius search (lax.top_k full sorts) was ~80% of the fused
    step (331 ms/step); the banded Pallas search brought it to 94 ms.

Usage: python scripts/profile_fused.py [--pallas] [--search 0|1]
                                       [--geometry dales] [--steps N]
                                       [--out F] [--parse_only]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(steps, trace_dir, geometry):
    import jax
    import bench as B
    config, _batch, plan = B.build_bench_problem(geometry)
    density = 12.0 if geometry == "dales" else 7.0
    fused_step, (params, bs, consts, opt), arrays = B.make_fused_step(
        config, plan, density=density)

    params, bs, opt, loss = fused_step(params, bs, consts, opt, arrays)
    _ = float(loss)   # forces completion; block_until_ready does not

    with jax.profiler.trace(trace_dir):
        for _ in range(steps):
            params, bs, opt, loss = fused_step(params, bs, consts, opt,
                                               arrays)
        _ = float(loss)


def summarize(trace_dir, steps, out_path=None):
    import numpy as np
    from weasal_tpu.utils.profiling import (categorize_op, module_times_us,
                                            op_self_times_us)

    mod_times = module_times_us(trace_dir, "fused_step")
    if mod_times:
        print(f"fused_step module device time: "
              f"median {np.median(mod_times)/1e3:.2f} ms/step over "
              f"{len(mod_times)} executions")
        steps = len(mod_times)

    per_op = op_self_times_us(trace_dir)
    per_cat = {}
    total = 0.0
    rows = []
    for name, t in per_op.items():
        total += t
        rows.append((t, name))
        key = categorize_op(name)
        per_cat[key] = per_cat.get(key, 0.0) + t

    print(f"total device self-time: {total/steps:.0f} us/step "
          f"(over {steps} steps)")
    for k, v in sorted(per_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {k:24s} {v/steps:9.1f} us/step  {100*v/total:5.1f}%")
    print("\ntop 25 ops:")
    for t, name in sorted(rows, reverse=True)[:25]:
        print(f"  {t/steps:9.1f} us/step  {name[:95]}")
    if out_path:
        with open(out_path, "w") as f:
            json.dump(dict(
                module_ms_per_step=(sorted(mod_times)[len(mod_times) // 2]
                                    / 1e3 if mod_times else None),
                total_us_per_step=total / steps,
                per_category={k: v / steps for k, v in per_cat.items()},
                top_ops=[dict(us_per_step=t / steps, name=n)
                         for t, n in sorted(rows, reverse=True)[:50]]),
                f, indent=2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pallas", action="store_true",
                    help="enable the banded Pallas KPConv path")
    ap.add_argument("--search", default="1",
                    help="banded Pallas radius search on/off (default on)")
    ap.add_argument("--band", type=int, default=0)
    ap.add_argument("--geometry", default="vaihingen")
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--trace_dir", default="/tmp/weasal_trace")
    ap.add_argument("--out", default=None)
    ap.add_argument("--parse_only", action="store_true")
    args = ap.parse_args()

    os.environ["WEASAL_BENCH_PALLAS"] = "1" if args.pallas else "0"
    os.environ["WEASAL_BENCH_SEARCH"] = args.search
    os.environ["WEASAL_BENCH_BAND"] = str(args.band)

    if not args.parse_only:
        import shutil
        shutil.rmtree(args.trace_dir, ignore_errors=True)
        capture(args.steps, args.trace_dir, args.geometry)
    summarize(args.trace_dir, args.steps, args.out)


if __name__ == "__main__":
    main()
