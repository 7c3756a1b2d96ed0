#!/usr/bin/env python
"""Per-op profile of the fused WL train step on TPU.

Captures a jax.profiler trace of the fused step, parses the XPlane with
tensorboard_plugin_profile, and aggregates device time by op category
(pyramid radius-search/top-k, subsample sort/segment ops, KPConv convs,
Pallas kernels, MPRM attention, loss, optimizer, ...).

Usage: python scripts/profile_fused.py [--pallas] [--steps N] [--out F]
"""

import argparse
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(steps, trace_dir):
    import jax
    from bench import build_bench_problem, bench_fused_step  # noqa: F401
    # Reuse bench's fused-step machinery by inlining its setup
    import bench as B
    config, batch, plan = B.build_bench_problem()

    # bench_fused_step with profiling hooks: we re-run its body manually
    import numpy as np
    import optax
    from weasal_tpu.data.demo import demo_sphere
    from weasal_tpu.data.level0 import assemble_level0
    from weasal_tpu.models import losses
    from weasal_tpu.models.architectures import KPFCNN_mprm
    from weasal_tpu.models.init import jit_init
    from weasal_tpu.ops.pyramid import batch_from_device_pyramid
    from weasal_tpu.train.trainer import make_optimizer

    rng = np.random.default_rng(0)
    payloads = [demo_sphere(rng, config, density=7.0)
                for _ in range(config.batch_num)]
    for p in payloads:
        n0 = plan.num_points[0]
        if p["points"].shape[0] > n0:
            keep = np.sort(rng.choice(p["points"].shape[0], n0,
                                      replace=False))
            remap = -np.ones(p["points"].shape[0], np.int64)
            remap[keep] = np.arange(n0)
            regions = []
            for inds, lb in p["regions"]:
                new = remap[inds]
                new = new[new >= 0]
                if new.size:
                    regions.append((new, lb))
            p.update(points=p["points"][keep], features=p["features"][keep],
                     labels=p["labels"][keep], regions=regions)
    arrays = assemble_level0(payloads, plan, config.num_classes, rng)

    model = KPFCNN_mprm(config, tuple(range(config.num_classes)), ())

    def to_batch(arrays):
        return batch_from_device_pyramid(
            arrays["points0"], arrays["mask0"], arrays["features"],
            arrays["labels"], config, plan, arrays["center_pts"],
            rotations=arrays["rotations"], cloud_lb=arrays["cloud_lb"],
            region_inds=arrays["region_inds"],
            region_masks=arrays["region_masks"],
            region_point_masks=arrays["region_point_masks"],
            region_lb=arrays["region_lb"])

    variables = jit_init(model, jax.random.PRNGKey(0),
                         jax.jit(to_batch)(arrays))
    params = variables["params"]
    tx = make_optimizer(config, params)
    opt_state = tx.init(params)
    batch_stats = variables.get("batch_stats", {})
    constants = variables.get("constants", {})

    @jax.jit
    def fused_step(params, batch_stats, constants, opt_state, arrays):
        batch = to_batch(arrays)

        def loss_fn(p):
            out, mutated = model.apply(
                {"params": p, "batch_stats": batch_stats,
                 "constants": constants},
                batch, train=True, mutable=["batch_stats"])
            _logits, _cla, cam = out
            loss = losses.region_mprm_loss(
                cam, batch.region_inds, batch.region_masks,
                batch.region_point_masks, batch.region_lb)
            return loss, mutated["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        updates = jax.tree_util.tree_map(
            lambda u: -config.learning_rate * u, updates)
        return optax.apply_updates(params, updates), new_bs, new_opt, loss

    arrays = jax.device_put(arrays)
    params, batch_stats, opt_state, loss = fused_step(
        params, batch_stats, constants, opt_state, arrays)
    jax.block_until_ready(loss)

    with jax.profiler.trace(trace_dir):
        for _ in range(steps):
            params, batch_stats, opt_state, loss = fused_step(
                params, batch_stats, constants, opt_state, arrays)
        jax.block_until_ready(loss)
    return steps


CATEGORIES = [
    ("pallas_kpconv", ("kpconv_banded", "_fwd_kernel", "_bwd_kernel",
                       "pallas_call")),
    ("pyramid_topk", ("top_k", "topk", "sort")),
    ("gather_scatter", ("gather", "scatter", "dynamic-slice",
                        "dynamic-update-slice")),
    ("convolution_gemm", ("dot", "convolution")),
    ("elementwise_fusion", ("fusion", "loop_", "add", "multiply",
                            "select", "compare", "broadcast", "reduce")),
    ("copy_transpose", ("copy", "transpose", "bitcast", "reshape")),
    ("allreduce_etc", ("all-reduce", "collective")),
]


def parse_trace(trace_dir, steps):
    """Aggregate per-op device self-time from the raw XSpace protos.

    Walks the TPU device plane's "XLA Ops" line directly (the
    tensorboard_plugin_profile converter is incompatible with this
    image's TF/protobuf pairing). Returns [(dur_us, name)] rows.
    """
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    paths = glob.glob(os.path.join(
        trace_dir, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        raise RuntimeError(f"no xplane under {trace_dir}")
    per_op = {}
    for path in paths:
        space = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            space.ParseFromString(f.read())
        for plane in space.planes:
            if "TPU" not in plane.name and "device" not in plane.name:
                continue
            meta = plane.event_metadata
            for line in plane.lines:
                # exact: "Async XLA Ops" spans overlap real work and
                # would double-count
                if line.name != "XLA Ops":
                    continue
                for ev in line.events:
                    name = meta[ev.metadata_id].name
                    per_op[name] = (per_op.get(name, 0.0)
                                    + ev.duration_ps / 1e6)  # -> us
    return sorted(((t, n) for n, t in per_op.items()), reverse=True)


def summarize(rows_in, steps, out_path=None):
    per_cat = {}
    total = 0.0
    rows = []
    for t, name in rows_in:
        total += t
        rows.append((t, name, ""))
        key = "other"
        lname = name.lower()
        for label, pats in CATEGORIES:
            if any(p in lname for p in pats):
                key = label
                break
        per_cat[key] = per_cat.get(key, 0.0) + t

    print(f"total device self-time: {total/steps:.0f} us/step "
          f"(over {steps} steps)")
    for k, v in sorted(per_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {k:24s} {v/steps:9.1f} us/step  {100*v/total:5.1f}%")
    print("\ntop 25 ops:")
    for t, name, cat in sorted(rows, reverse=True)[:25]:
        print(f"  {t/steps:9.1f} us/step  [{cat}] {name[:90]}")
    if out_path:
        with open(out_path, "w") as f:
            json.dump(dict(total_us_per_step=total / steps,
                           per_category={k: v / steps
                                         for k, v in per_cat.items()},
                           top_ops=[dict(us_per_step=t / steps, name=n,
                                         category=c)
                                    for t, n, c in
                                    sorted(rows, reverse=True)[:50]]),
                      f, indent=2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pallas", action="store_true")
    ap.add_argument("--band", type=int, default=512)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--trace_dir", default="/tmp/weasal_trace")
    ap.add_argument("--out", default=None)
    ap.add_argument("--parse_only", action="store_true")
    args = ap.parse_args()

    if args.pallas:
        os.environ["WEASAL_BENCH_PALLAS"] = "1"
        os.environ["WEASAL_BENCH_BAND"] = str(args.band)

    if not args.parse_only:
        import shutil
        shutil.rmtree(args.trace_dir, ignore_errors=True)
        capture(args.steps, args.trace_dir)
    table = parse_trace(args.trace_dir, args.steps)
    summarize(table, args.steps, args.out)


if __name__ == "__main__":
    main()
