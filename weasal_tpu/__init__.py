"""WeaSAL-TPU: a TPU-native framework for weakly-supervised aerial LiDAR segmentation.

Re-design of the capabilities of JohannesErnst/WeaSAL (KPConv + MPRM multi-path
region mining + weak sub-cloud labels + active learning + pseudo-label
refinement) as an idiomatic JAX/XLA/Pallas stack:

- geometry kernels (grid subsampling, radius search) as fixed-shape XLA ops so
  the whole multi-scale pyramid is traceable (`weasal_tpu.ops`),
- KPConv as a fused batched einsum / Pallas kernel (`weasal_tpu.ops.kpconv`),
- flax models assembled from the same architecture string DSL
  (`weasal_tpu.models`),
- functional optax training loops, orbax-compatible checkpoints, and the same
  on-disk artifact contract (parameters.txt, training_iteration*.txt,
  val_IoUs.txt, ply outputs) as the reference (`weasal_tpu.train`),
- data-parallel scaling over a `jax.sharding.Mesh` (`weasal_tpu.parallel`).

Unlike the reference (ragged stacked-point batches, C++ worker-process
neighbor search), batches here are dense `[B, N_l, ...]` per-sphere tensors
with static shapes per pyramid level, chosen by a calibration pass; padding
uses the reference's shadow semantics (shadow neighbor index = N_l, zero
feature row, far-away point row).
"""

__version__ = "0.1.0"
