"""Background batch prefetching: host/device overlap for the train loop.

The reference hides its (C++-heavy) batch building behind 10 DataLoader
worker processes with shared-memory potential state
(train_Vaihingen3D_WeakLabel.py:279-296, SURVEY §2.3). Here batch building
is cheaper (native geometry kernels) but still host work, so a small
pipeline keeps the accelerator fed:

- a producer thread runs `dataset.next_batch` ahead of the consumer and
  queues up to `prefetch` ready batches,
- sphere *pyramids* inside one batch are built by a thread pool (the numpy/
  native kernels release the GIL in their hot loops),
- potentials stay single-writer: only the producer thread touches them,
  preserving the reference's sampling semantics without locks.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional

import numpy as np


class BatchPrefetcher:
    """Iterator producing (batch, metas) tuples ahead of consumption."""

    def __init__(self, dataset, plan, num_batches: int,
                 rng: Optional[np.random.Generator] = None,
                 prefetch: int = 2,
                 augment: Optional[bool] = None,
                 num_spheres: Optional[int] = None,
                 to_device: bool = True,
                 sharding=None,
                 extra_arrays: Optional[dict] = None,
                 pack: int = 1,
                 keep_fn=None):
        """`pack` > 1 stacks that many host batches into one [K, ...] dict
        (single device_put, consumed by a lax.scan'd multi-step train
        program — amortizes per-dispatch tunnel latency). Requires dict
        batches (resident/level0 sources); `sharding` then must be the
        packed layout (parallel.mesh.packed_batch_sharding). A short tail
        pack is padded by repeating its last batch with `do_step=False`.

        `keep_fn(metas) -> bool` drops batches before packing (the weak
        trainer's no-region skip); dropped batches still consume the
        `num_batches` quota, matching the unpacked loop's `continue`.
        """
        self.dataset = dataset
        self.plan = plan
        self.num_batches = num_batches
        self.rng = rng or np.random.default_rng()
        self.augment = augment
        self.num_spheres = num_spheres
        self.to_device = to_device
        self.sharding = sharding
        # Already-on-device arrays merged into every produced dict batch
        # AFTER the device_put (resident clouds — must not be re-put, and
        # must keep their replicated sharding under data parallelism)
        self.extra_arrays = extra_arrays
        self.pack = max(int(pack), 1)
        self.keep_fn = keep_fn
        self._queue: "queue.Queue" = queue.Queue(maxsize=prefetch)
        self._error = None
        self._thread = threading.Thread(target=self._produce, daemon=True)
        self._thread.start()

    def _place(self, batch):
        if self.to_device:
            # Transfer in the producer thread so host->device copies
            # overlap the consumer's device steps; with a sharding,
            # the sphere axis lands directly on the mesh
            import jax
            if self.sharding is not None:
                batch = jax.device_put(batch, self.sharding)
            else:
                batch = jax.device_put(batch)
        if self.extra_arrays is not None and isinstance(batch, dict):
            batch = {**batch, **self.extra_arrays}
        return batch

    def _emit_pack(self, buf, buf_metas):
        """Stack K batch dicts -> one [K, ...] dict + `do_step` [K] mask
        (False on tail-padding copies of the last batch)."""
        n_real = len(buf)
        while len(buf) < self.pack:
            buf.append(buf[-1])
        stacked = {k: np.stack([b[k] for b in buf]) for k in buf[0]}
        do_step = np.zeros(self.pack, bool)
        do_step[:n_real] = True
        if self.to_device:
            import jax
            if self.sharding is not None:
                from jax.sharding import NamedSharding, PartitionSpec
                rep = NamedSharding(self.sharding.mesh, PartitionSpec())
                shardings = {k: self.sharding for k in stacked}
                shardings["do_step"] = rep
                stacked["do_step"] = do_step
                stacked = jax.device_put(stacked, shardings)
            else:
                stacked["do_step"] = do_step
                stacked = jax.device_put(stacked)
        else:
            stacked["do_step"] = do_step
        if self.extra_arrays is not None:
            stacked = {**stacked, **self.extra_arrays}
        return stacked, buf_metas

    def _produce(self):
        try:
            # Per-bucket buffers: with a size-bucketed source (resident
            # plan.small), batches of different static shapes must never
            # share one stacked scan pack — each bucket fills its own
            # buffer (metas carry the tag; "large" when unbucketed).
            bufs = {}
            for _ in range(self.num_batches):
                batch, metas = self.dataset.next_batch(
                    self.rng, self.plan, num_spheres=self.num_spheres,
                    augment=self.augment)
                if self.keep_fn is not None and not self.keep_fn(metas):
                    continue
                if self.pack <= 1:
                    self._queue.put((self._place(batch), metas))
                    continue
                if not isinstance(batch, dict):
                    raise TypeError(
                        "pack > 1 requires dict batches "
                        "(resident/level0 sources)")
                tag = metas[0].get("bucket", "large") if metas else "large"
                buf, buf_metas = bufs.setdefault(tag, ([], []))
                buf.append(batch)
                buf_metas.append(metas)
                if len(buf) == self.pack:
                    self._queue.put(self._emit_pack(buf, buf_metas))
                    bufs.pop(tag)
            for buf, buf_metas in bufs.values():
                if buf:
                    self._queue.put(self._emit_pack(buf, buf_metas))
        except BaseException as e:                     # surface in consumer
            self._error = e
        finally:
            self._queue.put(None)

    def __iter__(self) -> Iterator:
        # With keep_fn/pack the producer can legitimately emit fewer than
        # num_batches items; the None sentinel terminates either way.
        produced = 0
        while produced < self.num_batches:
            item = self._queue.get()
            if item is None:
                if self._error is not None:
                    raise self._error
                return
            produced += 1
            yield item

    def close(self):
        # Drain so the producer can exit
        try:
            while True:
                self._queue.get_nowait()
        except queue.Empty:
            pass


class ParallelSphereBuilder:
    """Thread-pool pyramid building for the spheres of one batch.

    Sphere *sampling* (potential updates) stays sequential in the calling
    thread; only the independent pyramid builds fan out.
    """

    def __init__(self, dataset, max_workers: int = 4):
        self.dataset = dataset
        self.pool = ThreadPoolExecutor(max_workers=max_workers)

    def next_batch(self, rng, plan, num_spheres=None, augment=None):
        from weasal_tpu.data.batching import (
            assemble_batch, build_sphere_pyramid, payload_meta)
        ds = self.dataset
        b = num_spheres or ds.config.batch_num
        if augment is None:
            augment = ds.split == "training"

        payloads = [ds.sample_sphere(rng, augment=augment,
                                     max_points=plan.num_points[0])
                    for _ in range(b)]
        seeds = rng.integers(0, 2 ** 31, size=b)

        def build(args):
            payload, seed = args
            return build_sphere_pyramid(
                payload["points"], ds.config,
                rng=np.random.default_rng(int(seed)),
                max_neighbors=plan.conv_neighbors,
                max_pool_neighbors=plan.pool_neighbors)

        pyramids = list(self.pool.map(build, zip(payloads, seeds)))
        spheres, metas = [], []
        for payload, pyramid in zip(payloads, pyramids):
            spheres.append(dict(pyramid=pyramid,
                                features=payload["features"],
                                labels=payload["labels"],
                                center=payload["center"],
                                cloud_lb=payload["cloud_lb"],
                                regions=payload["regions"]))
            metas.append(payload_meta(payload, plan.num_points[0]))
        batch = assemble_batch(spheres, plan, ds.config.num_classes, rng=rng)
        return batch, metas
