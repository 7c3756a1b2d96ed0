#!/usr/bin/env python
"""Microbenchmark: per-layer KPConv on TPU — XLA path vs Pallas kernel.

Times fwd and fwd+bwd at the real conv shapes of the WL bench problem.
Each measurement runs INNER iterations of the op inside one jitted
lax.scan, so per-dispatch tunnel overhead (ms-scale through axon) is
amortized away.

Usage: python scripts/bench_kpconv.py [--steps N] [--inner N]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def time_scan(step_fn, x0, geom, inner, steps):
    """Time scan(step_fn) over `inner` iterations, `steps` repeats.

    `geom` (points/neighbors/weights) rides as jit ARGUMENTS: on this
    platform, large closure-captured constants are miscompiled (round-1
    discovery), silently zeroing the XLA conv.
    """
    @jax.jit
    def scanned(x, *geom):
        def body(carry, _):
            return step_fn(carry, *geom), None
        out, _ = jax.lax.scan(body, x, None, length=inner)
        return out

    out = scanned(x0, *geom)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = scanned(out, *geom)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / (steps * inner)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--inner", type=int, default=20)
    ap.add_argument("--paths", default="xla,banded",
                help="comma list of: xla, banded")
    ap.add_argument("--band", type=int, default=512)
    ap.add_argument("--layers", default="")
    args = ap.parse_args()

    from bench import build_bench_problem
    config, batch, plan = build_bench_problem()

    for l in range(len(batch.points)):
        b, n, _ = batch.points[l].shape
        k = batch.neighbors[l].shape[2]
        real = int(np.sum(np.asarray(batch.lengths[l])))
        print(f"level {l}: B={b} N={n} K={k} real={real}", flush=True)

    f = config.first_features_dim
    conv_plan = [
        ("simple_L0", 0, config.in_features_dim, f // 2),
        ("resnetb_L0", 0, f // 4, f // 4),
        ("resnetb_L1", 1, f // 2, f // 2),
        ("resnetb_L2", 2, f, f),
        ("mprm_sa_L2", 2, 4 * f, 4 * f),
    ]
    if args.layers:
        wanted = set(args.layers.split(","))
        conv_plan = [c for c in conv_plan if c[0] in wanted]

    from weasal_tpu.ops.kpconv import KPConvParams, kpconv
    from weasal_tpu.ops.pallas.kpconv_banded import kpconv_banded
    from weasal_tpu.kernels.kernel_points import load_kernels

    rng = np.random.default_rng(0)
    kp = config.num_kernel_points

    def voxel_sort(points, neighbors, dl):
        """Sort supports spatially per sphere; remap neighbor indices."""
        pts = np.asarray(points)
        nbs = np.asarray(neighbors)
        b, n, _ = pts.shape
        out_p = np.empty_like(pts)
        out_n = np.empty_like(nbs)
        for bi in range(b):
            p = pts[bi]
            vox = np.floor((p - p.min(0)) / dl).astype(np.int64)
            vox = np.minimum(vox, 10 ** 5)   # clamp shadow rows (1e6 coord)
            dims = vox.max(0) + 1
            lin = (vox[:, 0] * dims[1] + vox[:, 1]) * dims[2] + vox[:, 2]
            order = np.argsort(lin, kind="stable")
            inv = np.empty(n + 1, np.int64)
            inv[order] = np.arange(n)
            inv[n] = n
            out_p[bi] = p[order]
            out_n[bi] = inv[np.minimum(nbs[bi], n)][order]
        return out_p, out_n

    for (name, lvl, cin, cout) in conv_plan:
        dl_l = config.first_subsampling_dl * (2 ** lvl)
        sp, nbs = voxel_sort(batch.points[lvl], batch.neighbors[lvl], dl_l)
        q_pts = jnp.asarray(sp)
        s_pts = q_pts
        nb = jnp.asarray(nbs)
        b, nq, _ = q_pts.shape
        ns = s_pts.shape[1]
        k = nb.shape[2]
        x = jnp.asarray(rng.standard_normal((b, ns, cin)), jnp.float32)
        extent = config.KP_extent * config.first_subsampling_dl * (2 ** lvl)
        kpts = jnp.asarray(load_kernels(
            1.5 * config.first_subsampling_dl * (2 ** lvl), kp, 3, "center",
            rng=rng), jnp.float32)
        w = jnp.asarray(rng.standard_normal((kp, cin, cout)) /
                        np.sqrt(cin), jnp.float32)

        n_real = b * nq
        flops = 2 * n_real * kp * (k * cin + cin * cout)

        line = f"{name} B{b} Nq{nq} Ns{ns} K{k} Cin{cin} Cout{cout}"
        for path in args.paths.split(","):
            params = KPConvParams(
                kp_extent=float(extent), influence="linear",
                aggregation="sum", compute_dtype="bfloat16")

            if path == "banded":
                def conv(xc, q, s, nbi, kpt, wt):
                    return kpconv_banded(q, s, nbi, xc, kpt, wt,
                                         float(extent), "linear",
                                         band=args.band)[0]

                ref = jax.jit(lambda xc, *g: kpconv(
                    g[0], g[1], g[2], xc, g[3], g[4], params)[0])(
                    x, q_pts, s_pts, nb, kpts, w)
                got, oob = jax.jit(lambda xc, *g: kpconv_banded(
                    g[0], g[1], g[2], xc, g[3], g[4], float(extent),
                    "linear", band=args.band))(x, q_pts, s_pts, nb,
                                               kpts, w)
                err = float(jnp.max(jnp.abs(got - ref)))
                scale = float(jnp.max(jnp.abs(ref)))
                line += (f" [oob {int(np.sum(np.asarray(oob)))}"
                         f" err {err/max(scale,1e-9):.1e}]")
            else:
                def conv(xc, q, s, nbi, kpt, wt):
                    return kpconv(q, s, nbi, xc, kpt, wt, params)[0]

            # carry = x; output feeds back through a projection to Cin so
            # the scan has a real data dependency (no dead-code elision)
            proj = jnp.asarray(rng.standard_normal((cout, cin)) /
                               np.sqrt(cout), jnp.float32)

            def fwd_step(xc, *geom):
                return jnp.tanh(conv(xc, *geom) @ proj)

            def bwd_step(xc, *geom):
                def loss(xi):
                    return jnp.sum(conv(xi, *geom) ** 2)
                g = jax.grad(loss)(xc)
                return xc - 1e-6 * g

            geom = (q_pts, s_pts, nb, kpts, w)
            try:
                tf = time_scan(fwd_step, x, geom, args.inner, args.steps)
                tb = time_scan(bwd_step, x, geom, args.inner, args.steps)
                line += (f" | {path} f {tf*1e6:6.0f}us"
                         f" {flops/tf/1e12:5.1f}TF"
                         f" fb {tb*1e6:6.0f}us {3*flops/tb/1e12:5.1f}TF")
            except Exception as e:
                line += f" | {path} FAIL {str(e)[:90]}"
        print(line, flush=True)


if __name__ == "__main__":
    main()
