#!/usr/bin/env python
"""Per-program device times of the bucketed train steps (round-5 open
question): the b80 arm routed 78% of dispatches to the small-bucket
program yet end-to-end device time matched p100. This probe times the
SMALL and LARGE compiled steps separately — 8 dispatches each on their
own bucket's batches, one profiler trace PER program (the two programs
share the XLA module name) — so the small program's cost is measured,
not inferred. (The WEASAL_TRACE_DIR window on the full run exceeded the
profiler's 2 GB XSpace limit.)

Usage: python scripts/probe_bucket_steps.py [data_root]
"""
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else \
        "full_run/buckets/root/Vaihingen3D"
    from weasal_tpu.utils.platform import enable_persistent_compile_cache
    enable_persistent_compile_cache()
    import jax
    from weasal_tpu.config import Config
    from weasal_tpu.data.datasets import Vaihingen3DWLDataset
    from weasal_tpu.data.resident import ResidentBatchSource
    from weasal_tpu.train.trainer import ModelTrainer
    from weasal_tpu.utils.profiling import module_times_us

    class C(Config):
        pass
    config = C()
    config.load("full_run/buckets/b80/results/WeakLabel/Log_b80")
    config.saving = False
    # --fused is a CLI flag, not a persisted parameter: restore the
    # fused/resident path the arm actually ran
    config.device_pyramid = True
    ds = Vaihingen3DWLDataset(config, "training", data_root=root)
    trainer = ModelTrainer(config, ds)
    assert trainer.plan_small is not None, "buckets not active"

    source = ResidentBatchSource(ds, trainer.plan, mesh=None,
                                 bucketed=True)
    rng = np.random.default_rng(0)
    batches = {"small": [], "large": []}
    while min(len(v) for v in batches.values()) < 8:
        arrays, metas = source.next_batch(rng)
        tag = metas[0].get("bucket", "large")
        if len(batches[tag]) < 8:
            batches[tag].append(
                {**jax.device_put(arrays), **source.resident.arrays})

    state = trainer.state
    lr = np.float32(config.learning_rate)
    key = jax.random.PRNGKey(0)
    for tag in ("small", "large"):
        step = trainer._train_steps[tag]
        out = step(state, batches[tag][0], lr, key, use_contrast=False)
        float(out[1])                        # force compile + completion

    for tag in ("small", "large"):
        step = trainer._train_steps[tag]
        trace_dir = f"/tmp/bucket_step_trace_{tag}"
        shutil.rmtree(trace_dir, ignore_errors=True)
        with jax.profiler.trace(trace_dir):
            for b in batches[tag]:
                out = step(state, b, lr, key, use_contrast=False)
            float(out[1])
        times = module_times_us(trace_dir, "step_core")
        med = float(np.median(times)) / 1e3 if times else None
        plan = trainer.plan_small if tag == "small" else trainer.plan
        print(f"{tag}: {len(times) if times else 0} executions, "
              f"median {med:.2f} ms, plan {list(plan.num_points)}")

    # --- the production dispatch: K-step lax.scan programs -------------
    # The 3-epoch arms run these, and their epoch walls sit BELOW the K=1
    # large program's device time — measure the scan programs directly.
    K = 10
    packs = {}
    for tag in ("small", "large"):
        host = []
        while len(host) < 2 * K:
            arrays, metas = source.next_batch(rng)
            if metas[0].get("bucket", "large") == tag:
                host.append(arrays)
        tag_packs = []
        for i in range(2):
            chunk = host[i * K:(i + 1) * K]
            stacked = {k: np.stack([b[k] for b in chunk])
                       for k in chunk[0]}
            stacked["do_step"] = np.ones(K, bool)
            tag_packs.append({**jax.device_put(stacked),
                              **source.resident.arrays})
        packs[tag] = tag_packs

    rngs = jax.random.split(key, K)
    for tag in ("small", "large"):
        scan_fn = trainer._build_train_step_scan(tag)
        out = scan_fn(state, packs[tag][0], lr, rngs, use_contrast=False)
        float(out[1][-1] if hasattr(out[1], "shape") else out[1])
        trace_dir = f"/tmp/bucket_scan_trace_{tag}"
        shutil.rmtree(trace_dir, ignore_errors=True)
        with jax.profiler.trace(trace_dir):
            for p in packs[tag]:
                out = scan_fn(state, p, lr, rngs, use_contrast=False)
            loss = out[1]
            float(loss[-1] if hasattr(loss, "shape") and loss.ndim else
                  loss)
        times = module_times_us(trace_dir, "train_step_k")
        med = float(np.median(times)) / 1e3 if times else None
        print(f"scan[{tag}]: {len(times) if times else 0} executions of "
              f"K={K}, median {med:.2f} ms = "
              f"{(med / K if med else 0):.2f} ms/step")


if __name__ == "__main__":
    main()
