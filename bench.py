#!/usr/bin/env python
"""Benchmark: full weak-label training step throughput on one TPU chip.

Measures the framework's hot loop — KPFCNN_mprm forward (KPConv encoder +
MPRM attention heads) + region-MPRM loss + backward + SGD update — as one
jitted step over a dense sphere batch at the reference's Vaihingen3D scale
(in_radius 18 m, dl 0.24 m, ~20k stacked points per batch,
train_Vaihingen3D_WeakLabel.py:139-175 / calibration setpoint
Vaihingen3D_WeakLabel.py:1158-1166).

Throughput unit: real (non-padded) level-0 points processed per second per
chip. The headline metric uses the fused step — device-side pyramid
construction + forward + region-MPRM loss + backward + SGD update as ONE
jitted program over device-resident level-0 arrays (v5e measurement:
~13.5M points/s, ~1.2ms per 16.8k-point step).

`vs_baseline`: the reference publishes no numbers (BASELINE.md) and its
GPU environment is unavailable here, so the baseline is a faithful
CPU-torch implementation of the same network's KPConv compute chain
(gather -> influence -> weighted aggregation -> weight contraction, the
math of models/blocks.py:238-374) at identical shapes, fwd+bwd. The
measured baseline is cached in `.bench_baseline.json`.

Prints ONE json line:
    {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              ".bench_baseline.json")


def build_bench_problem():
    """Vaihingen-scale config + demo batch (~7k real pts/sphere, B=3)."""
    from weasal_tpu.config import Config

    class BenchConfig(Config):
        dataset = "Vaihingen3DWL"
        num_classes = 9
        in_features_dim = 4
        first_features_dim = 64
        num_kernel_points = 15
        in_radius = 18.0
        first_subsampling_dl = 0.24
        conv_radius = 2.5
        architecture = ["simple", "resnetb", "resnetb_strided", "resnetb",
                        "resnetb_strided", "resnetb",
                        "nearest_upsample", "nearest_upsample"]
        use_batch_norm = True
        batch_norm_momentum = 0.02
        batch_num = 3
        learning_rate = 0.01
        momentum = 0.98
        weight_decay = 1e-3
        grad_clip_norm = 1.0
        class_w = []
        model_name = "KPFCNN_mprm"
        loss_type = "region_mprm_loss"
        compute_dtype = "bfloat16"   # bf16 MXU inputs, f32 accumulation
        # Banded Pallas KPConv for the narrow rigid convs (override with
        # WEASAL_BENCH_PALLAS=0/1 to compare paths)
        use_pallas_kpconv = os.environ.get("WEASAL_BENCH_PALLAS", "0") == "1"
        use_pallas_search = os.environ.get("WEASAL_BENCH_SEARCH", "0") == "1"
        pallas_band = int(os.environ.get("WEASAL_BENCH_BAND", "0"))

    config = BenchConfig()
    from weasal_tpu.data.demo import demo_batch
    # density ~7 pts/m^2 at dl 0.24 -> ~7k points per 18 m sphere after
    # voxel dedup, matching the reference's ~20k-points/3-sphere batches
    batch, plan = demo_batch(config, batch_size=config.batch_num, seed=0,
                             density=7.0)
    return config, batch, plan


def bench_tpu_step(config, batch, steps=20):
    import jax
    import optax
    from weasal_tpu.models import losses
    from weasal_tpu.models.architectures import KPFCNN_mprm
    from weasal_tpu.train.trainer import make_optimizer

    model = KPFCNN_mprm(config, tuple(range(config.num_classes)), ())
    from weasal_tpu.models.init import jit_init
    variables = jit_init(model, jax.random.PRNGKey(0), batch)
    params = variables["params"]
    tx = make_optimizer(config, params)
    opt_state = tx.init(params)
    batch_stats = variables.get("batch_stats", {})
    constants = variables.get("constants", {})

    @jax.jit
    def train_step(params, batch_stats, constants, opt_state, batch):
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

    # Device-resident inputs: through the tunneled chip, shipping numpy
    # batches per step measures the link, not the chip (real pipelines
    # overlap transfers via prefetch)
    batch = jax.device_put(batch)

    # Warmup/compile
    params, batch_stats, opt_state, loss = train_step(
        params, batch_stats, constants, opt_state, batch)
    jax.block_until_ready(loss)

    t0 = time.perf_counter()
    for _ in range(steps):
        params, batch_stats, opt_state, loss = train_step(
            params, batch_stats, constants, opt_state, batch)
    jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / steps

    real_points = int(np.sum(np.asarray(batch.lengths[0])))
    return real_points / dt, dt, real_points, float(loss)


def bench_torch_cpu_baseline(config, batch, steps=3):
    """Reference-math KPConv chain (torch, CPU) fwd+bwd at the same shapes.

    Implements the conv sequence of the mprm encoder in the reference's
    stacked layout: for each conv in the architecture walk, gather
    neighbors, linear influence to 15 kernel points, two matmuls. The
    returned throughput is stacked-level-0 points per second.
    """
    import torch

    torch.set_num_threads(os.cpu_count() or 1)
    rng = np.random.default_rng(0)

    # Shapes from the batch: per level (N_real_total, K)
    levels = []
    for l in range(len(batch.points)):
        n = int(np.sum(np.asarray(batch.lengths[l])))
        k = int(batch.neighbors[l].shape[2])
        levels.append((n, k))

    # Conv plan of the WL architecture (level, cin, cout) per KPConv, from
    # the same dim bookkeeping the model uses
    f = config.first_features_dim
    conv_plan = [
        (0, config.in_features_dim, f // 2),        # simple
        (0, f // 4, f // 4),                        # resnetb bottleneck
        (0, f // 4, f // 4),                        # resnetb_strided (pool)
        (1, f // 2, f // 2),                        # resnetb @ level1
        (1, f // 2, f // 2),                        # resnetb_strided
        (2, f, f),                                  # resnetb @ level2
        # MPRM heads: 5 SimpleBlock2 convs at level 2 (sa 2x, ca 2x, pa 1x)
        (2, 4 * f, 4 * f), (2, 4 * f, 4 * f),
        (2, 4 * f, f // 2), (2, f // 2, 4 * f),
        (2, 8 * f, 4 * f),
    ]

    kp = config.num_kernel_points
    tensors = []
    for (lvl, cin, cout) in conv_plan:
        n, k = levels[min(lvl, len(levels) - 1)]
        neighb = torch.from_numpy(
            rng.integers(0, n, size=(n, k)).astype(np.int64))
        x = torch.randn(n, cin, requires_grad=True)
        pts = torch.from_numpy(
            rng.uniform(-1, 1, size=(n, 3)).astype(np.float32))
        kpts = torch.from_numpy(
            rng.uniform(-0.3, 0.3, size=(kp, 3)).astype(np.float32))
        w = (torch.randn(kp, cin, cout) / np.sqrt(cin)).requires_grad_()
        tensors.append((pts, neighb, x, kpts, w))

    extent = config.KP_extent * config.first_subsampling_dl

    def kpconv_chain():
        total = 0.0
        for (pts, neighb, x, kpts, w) in tensors:
            neighbors = pts[neighb] - pts.unsqueeze(1)        # [n,k,3]
            diff = neighbors.unsqueeze(2) - kpts              # [n,k,Kp,3]
            sq = (diff * diff).sum(3)
            infl = torch.clamp(1 - torch.sqrt(sq) / extent, min=0.0)
            infl = infl.transpose(1, 2)                       # [n,Kp,k]
            nx = x[neighb]                                    # [n,k,cin]
            weighted = torch.matmul(infl, nx)                 # [n,Kp,cin]
            out = torch.einsum("npc,pcd->nd", weighted, w)
            total = total + out.square().mean()
        return total

    # Warmup + timed fwd+bwd
    loss = kpconv_chain()
    loss.backward()
    t0 = time.perf_counter()
    for _ in range(steps):
        loss = kpconv_chain()
        loss.backward()
    dt = (time.perf_counter() - t0) / steps
    return levels[0][0] / dt


def bench_fused_step(config, plan, steps=20):
    """Fused end-to-end step: device pyramid + forward + backward + update,
    one jitted program over level-0 arrays (the north-star path)."""
    import jax
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
    for p in payloads:  # thin to the plan budget like the sampler does
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

    t0 = time.perf_counter()
    for _ in range(steps):
        params, batch_stats, opt_state, loss = fused_step(
            params, batch_stats, constants, opt_state, arrays)
    jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / steps

    real_points = int(arrays["mask0"].sum())
    return real_points / dt, dt, real_points, float(loss)


def main():
    config, batch, plan = build_bench_problem()

    # Headline: the fused end-to-end step (device pyramid included); falls
    # back to the host-pyramid step if the fused path fails to compile
    try:
        value, step_time, real_points, loss = bench_fused_step(config, plan)
        metric = "fused_wl_train_step_points_per_sec_per_chip"
    except Exception as e:
        print(f"# fused step unavailable ({type(e).__name__}); "
              "falling back", flush=True)
        value, step_time, real_points, loss = bench_tpu_step(config, batch)
        metric = "wl_train_step_points_per_sec_per_chip"

    baseline = None
    if os.path.exists(BASELINE_CACHE):
        try:
            with open(BASELINE_CACHE) as f:
                baseline = json.load(f)["torch_cpu_points_per_sec"]
        except Exception:
            baseline = None
    if baseline is None:
        baseline = bench_torch_cpu_baseline(config, batch)
        with open(BASELINE_CACHE, "w") as f:
            json.dump({"torch_cpu_points_per_sec": baseline}, f)

    print(json.dumps({
        "metric": metric,
        "value": round(value, 1),
        "unit": "points/s",
        "vs_baseline": round(value / baseline, 2),
    }))


if __name__ == "__main__":
    main()
