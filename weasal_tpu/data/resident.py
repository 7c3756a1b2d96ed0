"""Device-resident clouds: ship sphere *indices*, not point payloads.

The fused path (weasal_tpu/data/level0.py) already reduced the host's
per-step work to level-0 assembly, but it still ships every sphere's
points/features/labels/regions over PCIe each step (~2.5 MB at reference
geometry). On this platform that is not just bandwidth: every
host->device transfer leaks its byte count in host RSS (axon tunnel,
measured 2026-08-17 — see STATUS.md "Platform memory"), so a process has
a finite lifetime H2D budget and an 80-epoch run was OOM-killed.

This module makes the cloud itself device-resident and moves sphere
extraction into the jitted step, the TPU-native design the tunnel was
pushing toward anyway:

- `ResidentClouds` uploads each split's subsampled clouds ONCE (points,
  label-mapped labels, colors), stacked into flat `[S, ...]` arrays with
  a trailing shadow row (replicated over the mesh under data
  parallelism).
- `ResidentBatchSource` runs the *sampling* exactly as before (potential
  updates, KD radius query, max_points thinning, region resolution — all
  reference semantics, reference `datasets/common.py:252-458`) but ships
  only `flat_inds` [B, N0] int32 plus per-sphere augmentation parameters
  (~0.3 MB/step, ~8x less H2D).
- `assemble_level0_device` (pure jax, called inside the train/eval jit)
  gathers the sphere from the resident arrays, applies the augmentation
  (rotation/scale from the host draw, jitter from a shipped PRNG seed),
  builds the features, and voxel-sorts the sphere in the grid-rotated
  frame — emitting exactly the level-0 arrays `assemble_level0` would
  have shipped, plus the inverse permutation so eval outputs can be
  returned in `input_inds` order.

Host per-step work drops to sampling + tiny-array packing, which matters
independently of the leak: this host has one CPU core.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from weasal_tpu.data.batching import (
    ShapePlan, fill_region_row, grid_rotations, payload_meta)
from weasal_tpu.ops.subsample import SHADOW_COORD

_KEY_SENTINEL = np.int32(2 ** 31 - 1)    # sort key for pad rows


def feature_spec(dataset_name: str, in_features_dim: int) -> Tuple[str, ...]:
    """Static feature recipe replicated from the datasets'
    `_sphere_features` (weasal_tpu/data/datasets.py; reference
    `datasets/Vaihingen3D_WeakLabel.py` features stacking)."""
    name = (dataset_name or "").lower()
    if name.startswith("vaihingen"):
        return {1: ("ones",),
                2: ("ones", "color0"),
                4: ("ones", "color0", "abs_z", "red_z")}[in_features_dim]
    if name.startswith("dales"):
        return {1: ("ones",),
                3: ("ones", "abs_z", "red_z")}[in_features_dim]
    raise ValueError(f"no feature spec for dataset {dataset_name!r}")


class ResidentClouds:
    """One split's clouds as flat device arrays + host-side index bases."""

    def __init__(self, dataset, mesh=None):
        import jax

        clouds = [np.asarray(t.data, np.float32)
                  for t in dataset.input_trees]
        nmax = max(c.shape[0] for c in clouds)
        n_clouds = len(clouds)
        S = n_clouds * nmax + 1                 # +1 trailing shadow row
        # pack_payloads writes base[cloud]+inds into int32 flat_inds; numpy
        # would wrap silently past 2^31 (ADVICE r2)
        if S >= 2 ** 31:
            raise ValueError(
                f"resident flat cloud too large for int32 indexing: "
                f"{n_clouds} clouds x {nmax} max points = {S} rows")
        pts = np.zeros((S, 3), np.float32)
        labels = np.full(S, -1, np.int32)
        has_colors = any(c is not None for c in dataset.input_colors)
        ccol = (dataset.input_colors[0].shape[1] if has_colors else 0)
        colors = np.zeros((S, ccol), np.float32) if has_colors else None

        self.base = np.arange(n_clouds, dtype=np.int64) * nmax
        self.sizes = [c.shape[0] for c in clouds]
        self.shadow = S - 1
        for i, c in enumerate(clouds):
            b = int(self.base[i])
            pts[b:b + c.shape[0]] = c
            mapped = _mapped_labels(dataset, i)
            if mapped is not None:
                labels[b:b + c.shape[0]] = mapped
            if colors is not None and dataset.input_colors[i] is not None:
                colors[b:b + c.shape[0]] = dataset.input_colors[i]

        sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            sharding = NamedSharding(mesh, PartitionSpec())   # replicated
        put = (lambda a: jax.device_put(a, sharding) if sharding is not None
               else jax.device_put(a))
        self.arrays: Dict = {"res_points": put(pts),
                             "res_labels": put(labels)}
        if colors is not None:
            self.arrays["res_colors"] = put(colors)


def _mapped_labels(dataset, cloud_ind) -> Optional[np.ndarray]:
    """input_labels -> train indices via the dataset's vectorized
    label_to_idx table (same mapping as sample_sphere's)."""
    lbl = dataset.input_labels[cloud_ind]
    if lbl is None:
        return None
    return dataset._label_table()[np.asarray(lbl, np.int64)]


class ResidentBatchSource:
    """next_batch() -> (small index/param arrays, metas).

    Drop-in for Level0BatchSource in the fused loops; the consumer merges
    `self.resident.arrays` into each batch dict (no transfer — they are
    already on device) and the jitted step calls
    `assemble_level0_device`.
    """

    def __init__(self, dataset, plan: ShapePlan, mesh=None,
                 bucketed: bool = False):
        self.dataset = dataset
        self.plan = plan
        self.config = dataset.config
        self.resident = ResidentClouds(dataset, mesh=mesh)
        self.spec = feature_spec(dataset.name, dataset.config.in_features_dim)
        # Small-sphere bucket (plan.small, VERDICT r3 #4): group sampled
        # spheres into size-homogeneous batches so small-only batches can
        # run through the trainer's small-plan compiled step. Sampling
        # stays single-writer and potential-ordered; only the grouping of
        # spheres into batches changes (the reference's variable
        # spheres-per-batch batching reorders similarly).
        self.small_plan = plan.derive_small() if bucketed else None
        self._pending = {"small": [], "large": []}

    def next_batch(self, rng, plan=None, num_spheres=None, augment=None):
        plan = plan or self.plan
        ds = self.dataset
        B = num_spheres or ds.config.batch_num
        if augment is None:
            augment = ds.split == "training"
        if self.small_plan is None or plan is not self.plan:
            payloads = [ds.sample_sphere(rng, augment=augment,
                                         max_points=plan.num_points[0],
                                         gather=False)
                        for _ in range(B)]
            return self._pack(payloads, plan, rng)

        cut = self.plan.small["cut"]
        while True:
            for tag in ("small", "large"):
                if len(self._pending[tag]) >= B:
                    payloads = self._pending[tag][:B]
                    self._pending[tag] = self._pending[tag][B:]
                    p = self.small_plan if tag == "small" else self.plan
                    arrays, metas = self._pack(payloads, p, rng)
                    for m in metas:
                        m["bucket"] = tag
                    return arrays, metas
            payload = ds.sample_sphere(rng, augment=augment,
                                       max_points=self.plan.num_points[0],
                                       gather=False)
            tag = ("small" if payload["input_inds"].shape[0] <= cut
                   else "large")
            self._pending[tag].append(payload)

    def _pack(self, payloads, plan, rng):
        arrays = pack_payloads(payloads, plan, self.dataset.config, rng,
                               base=self.resident.base,
                               shadow=self.resident.shadow)
        n0 = plan.num_points[0]
        metas = [payload_meta(p, n0) for p in payloads]
        return arrays, metas


def pack_payloads(payloads, plan: ShapePlan, config, rng,
                  base: np.ndarray, shadow: int) -> Dict:
    """Pack gather-less sphere payloads into the small per-step arrays the
    device assembly consumes (`flat_inds` + augmentation parameters +
    region tables). `base[cloud_ind] + input_inds` addresses rows of the
    resident flat arrays; `shadow` pads."""
    B = len(payloads)
    n0 = plan.num_points[0]
    R, P = max(plan.max_regions, 1), max(plan.max_region_points, 1)
    C = config.num_classes

    flat_inds = np.full((B, n0), shadow, np.int32)
    centers = np.zeros((B, 3), np.float32)
    cloud_lb = np.zeros((B, C), np.float32)
    aug_rot = np.zeros((B, 3, 3), np.float32)
    aug_scale = np.ones((B, 3), np.float32)
    color_keep = np.ones(B, np.float32)
    region_inds = np.full((B, R, P), n0, np.int32)
    region_masks = np.zeros((B, R), bool)
    region_point_masks = np.zeros((B, R, P), bool)
    region_lb = np.zeros((B, R, C), np.float32)

    # Grid rotations for voxel de-aliasing — same draw (and same rng
    # stream position) as level0.assemble_level0
    rotations = grid_rotations(rng, B)

    for b, p in enumerate(payloads):
        inds = p["input_inds"]
        k = min(inds.shape[0], n0)
        flat_inds[b, :k] = base[p["cloud_ind"]] + inds[:k]
        centers[b] = p["center"]
        if p.get("cloud_lb") is not None:
            cloud_lb[b] = p["cloud_lb"]
        aug_rot[b] = p["rot"]
        aug_scale[b] = p["scale"]
        color_keep[b] = p.get("color_keep", 1.0)
        fill_region_row(region_inds[b], region_point_masks[b],
                        region_masks[b], region_lb[b],
                        p.get("regions"), k, rng)

    # Drawn AFTER the shared grid_rotations/fill_region_row draws so the
    # rng stream position stays in lockstep with assemble_level0 (region
    # subsampling uses identical draws on both paths — ADVICE r2).
    noise_seed = rng.integers(0, 2 ** 31, size=B).astype(np.uint32)

    return dict(flat_inds=flat_inds, center_pts=centers,
                cloud_lb=cloud_lb, rotations=rotations,
                aug_rot=aug_rot, aug_scale=aug_scale,
                color_keep=color_keep, noise_seed=noise_seed,
                region_inds=region_inds, region_masks=region_masks,
                region_point_masks=region_point_masks,
                region_lb=region_lb)


def resident_from_payloads(payloads, plan: ShapePlan, config, rng):
    """Fabricate resident cloud arrays + a packed index batch from
    standalone sphere payloads (bench / dryrun path, no dataset object).

    Each payload becomes its own tiny "cloud" in the flat resident
    arrays; color0 (when the feature spec needs it) is lifted from the
    payload's feature column 1, matching data/demo.py's layout.
    Returns (resident_arrays, packed_arrays) — merge the two dicts and
    call `assemble_level0_device` in-jit.
    """
    n0 = plan.num_points[0]
    sizes = [min(p["points"].shape[0], n0) for p in payloads]
    base = np.concatenate([[0], np.cumsum(sizes[:-1])]).astype(np.int64)
    S = int(sum(sizes)) + 1                      # +1 trailing shadow row
    pts = np.zeros((S, 3), np.float32)
    labels = np.full(S, -1, np.int32)
    needs_color = "color0" in feature_spec(config.dataset,
                                           config.in_features_dim)
    colors = np.zeros((S, 1), np.float32) if needs_color else None
    for b, p in enumerate(payloads):
        k = sizes[b]
        lo = int(base[b])
        pts[lo:lo + k] = p["points"][:k] + p["center"]
        labels[lo:lo + k] = p["labels"][:k]
        if colors is not None:
            colors[lo:lo + k] = p["features"][:k, 1:2]
        p.setdefault("cloud_ind", b)
        p.setdefault("input_inds", np.arange(k))
        p.setdefault("rot", np.eye(3, dtype=np.float32))
        p.setdefault("scale", np.ones(3, np.float32))
        p.setdefault("color_keep", 1.0)
    arrays = pack_payloads(payloads, plan, config, rng,
                           base=base, shadow=S - 1)
    resident = {"res_points": pts, "res_labels": labels}
    if colors is not None:
        resident["res_colors"] = colors
    return resident, arrays


# ----------------------------------------------------------------------
# In-jit assembly (pure jax; called from the train/eval step)
# ----------------------------------------------------------------------

def assemble_level0_device(batch: Dict, config, plan: ShapePlan,
                           augment: bool, spec: Sequence[str]) -> Dict:
    """Resident arrays + shipped indices -> the standard level-0 dict.

    Mirrors level0.assemble_level0 + datasets.augmentation_transform +
    `_sphere_features` + level0._sort_payload, entirely on device.
    Returns the keys batch_from_device_pyramid consumes, plus
    `unsort` [B, N0] (gather a sorted-order per-point output with it to
    get `input_inds` order — used by the voting tester).
    """
    import jax
    import jax.numpy as jnp

    res_pts = batch["res_points"]
    res_lbl = batch["res_labels"]
    inds = batch["flat_inds"]
    centers = batch["center_pts"]
    shadow = res_pts.shape[0] - 1
    B, n0 = inds.shape

    mask0 = inds < shadow
    pts = res_pts[inds] - centers[:, None, :]
    if augment:
        pts = jnp.einsum("bnc,bcd->bnd", pts, batch["aug_rot"])
        pts = pts * batch["aug_scale"][:, None, :]
        noise = float(getattr(config, "augment_noise", 0.0) or 0.0)
        if noise:
            def sphere_noise(seed):
                return jax.random.normal(
                    jax.random.PRNGKey(seed), (n0, 3), jnp.float32)
            pts = pts + jax.vmap(sphere_noise)(batch["noise_seed"]) * noise

    labels = jnp.where(mask0, res_lbl[inds], -1)

    cols = None
    if "res_colors" in batch:
        cols = batch["res_colors"][inds] * batch["color_keep"][:, None, None]

    columns = []
    for tok in spec:
        if tok == "ones":
            columns.append(jnp.ones((B, n0, 1), jnp.float32))
        elif tok == "color0":
            columns.append(cols[..., 0:1] if cols is not None
                           else jnp.zeros((B, n0, 1), jnp.float32))
        elif tok == "abs_z":
            columns.append(pts[..., 2:3] + centers[:, None, 2:3])
        elif tok == "red_z":
            columns.append(pts[..., 2:3])
        else:
            raise ValueError(f"unknown feature token {tok!r}")
    features = jnp.concatenate(columns, axis=-1) * mask0[..., None]

    points0 = jnp.where(mask0[..., None], pts, SHADOW_COORD)

    # Voxel sort in the grid-rotated frame (mirrors level0._sort_payload)
    rpts = jnp.einsum("bnc,bcd->bnd", points0, batch["rotations"])
    big = jnp.float32(np.inf)
    masked = jnp.where(mask0[..., None], rpts, big)
    lo = jnp.min(masked, axis=1)                                   # [B, 3]
    hi = jnp.max(jnp.where(mask0[..., None], rpts, -big), axis=1)
    extent = jnp.maximum(jnp.max(hi, axis=1) - jnp.min(lo, axis=1), 1e-6)
    # Pad rows would be inf here (SHADOW rotated); pin them to lo before
    # the int cast (f32 inf -> int32 is undefined in XLA)
    safe = jnp.where(mask0[..., None], rpts, lo[:, None, :])
    vox = jnp.floor((safe - lo[:, None, :])
                    / (extent[:, None, None] / 256.0)).astype(jnp.int32)
    vox = jnp.clip(vox, 0, 256)
    dims = jnp.max(jnp.where(mask0[..., None], vox, 0), axis=1) + 1
    lin = ((vox[..., 0] * dims[:, None, 1] + vox[..., 1])
           * dims[:, None, 2] + vox[..., 2])
    keys = jnp.where(mask0, lin, _KEY_SENTINEL)
    perm = jnp.argsort(keys, axis=1, stable=True)
    inv = jnp.argsort(perm, axis=1)

    take = lambda a: jnp.take_along_axis(
        a, perm.reshape(B, n0, *([1] * (a.ndim - 2))), axis=1)
    points0 = take(points0)
    features = take(features)
    labels = jnp.take_along_axis(labels, perm, axis=1)
    mask0 = jnp.take_along_axis(mask0, perm, axis=1)

    ri = batch["region_inds"]
    ri_sorted = jnp.where(
        ri < n0,
        jnp.take_along_axis(inv, jnp.clip(ri, 0, n0 - 1).reshape(B, -1),
                            axis=1).reshape(ri.shape),
        n0)

    return dict(points0=points0, mask0=mask0, features=features,
                labels=labels, rotations=batch["rotations"],
                center_pts=centers, cloud_lb=batch["cloud_lb"],
                region_inds=ri_sorted,
                region_masks=batch["region_masks"],
                region_point_masks=batch["region_point_masks"],
                region_lb=batch["region_lb"], unsort=inv)
