"""Data-parallel scaling over a jax.sharding.Mesh.

The reference is strictly single-device (SURVEY §2.3: no DDP/NCCL anywhere);
multi-chip data parallelism is the headline capability this rebuild adds.
The recipe is the standard JAX one: one global mesh with a 'data' axis,
sphere batches sharded along axis 0, parameters/optimizer state replicated;
XLA's SPMD partitioner inserts the gradient all-reduce (psum over ICI) —
no hand-written collectives in the training step.

Because PyramidBatch indices are sphere-local (weasal_tpu/data/batch.py),
sharding the B axis never crosses device boundaries: every sphere's gather/
matmul work is fully local, and the only communication is the gradient
reduction. This is the layout that keeps collectives on ICI and off the
critical path.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(num_devices: Optional[int] = None,
              devices=None) -> Mesh:
    """1-D data-parallel mesh over the first `num_devices` devices."""
    if devices is None:
        devices = jax.devices()
    if num_devices:
        if num_devices > len(devices):
            # Never truncate silently: the caller has already sized
            # batch_num for the requested count, and a smaller mesh would
            # train with wrong per-device math while reporting N-way
            raise ValueError(
                f"requested {num_devices} data-parallel devices but only "
                f"{len(devices)} are available")
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (sphere) axis of every batch leaf."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def packed_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for K-packed batches [K, B, ...]: the scan axis is
    replicated, the sphere axis (axis 1) splits across the mesh — each
    lax.scan slice then carries the same layout batch_sharding gives a
    single step."""
    return NamedSharding(mesh, P(None, DATA_AXIS))


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place a PyramidBatch with its sphere axis split across the mesh."""
    sharding = batch_sharding(mesh)

    def place(x):
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(place, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate parameters / optimizer state across the mesh."""
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)


def shard_trainer(trainer, mesh: Mesh) -> None:
    """Switch a ModelTrainer to data-parallel execution on `mesh`.

    Parameters/optimizer state are replicated once; every subsequent
    next_batch must be placed with `shard_batch` (the trainer's jitted step
    then runs SPMD with an implicit gradient psum). Requires
    config.batch_num % mesh.size == 0.
    """
    if trainer.config.batch_num % mesh.size != 0:
        raise ValueError(
            f"batch_num ({trainer.config.batch_num}) must be divisible by "
            f"the mesh size ({mesh.size})")
    trainer.state = replicate(trainer.state, mesh)
    trainer.mesh = mesh
