"""Input-pipeline tests: prefetcher semantics and parallel builder parity."""

import numpy as np
import pytest

from weasal_tpu.data.loader import BatchPrefetcher, ParallelSphereBuilder


class _FakeDataset:
    def __init__(self, fail_at=None):
        self.fail_at = fail_at
        self.calls = 0

    def next_batch(self, rng, plan, num_spheres=None, augment=None):
        self.calls += 1
        if self.fail_at is not None and self.calls == self.fail_at:
            raise RuntimeError("boom")
        return {"x": np.full((2, 4), self.calls)}, [{"n": self.calls}]


def test_prefetcher_yields_in_order():
    ds = _FakeDataset()
    pf = BatchPrefetcher(ds, plan=None, num_batches=5, to_device=False)
    got = [m[0]["n"] for _, m in pf]
    assert got == [1, 2, 3, 4, 5]


def test_prefetcher_propagates_errors():
    ds = _FakeDataset(fail_at=3)
    pf = BatchPrefetcher(ds, plan=None, num_batches=5, to_device=False)
    with pytest.raises(RuntimeError, match="boom"):
        list(pf)


def test_parallel_builder_matches_sequential():
    """Thread-pool pyramid builds produce the same batch as the dataset
    path when fed identical sphere sequences."""
    from weasal_tpu.data.datasets import Vaihingen3DWLDataset
    from weasal_tpu.data.synthetic import make_vaihingen_like_root
    from tests.test_datasets import SynthWLConfig
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        root = td + "/Vaihingen3D"
        make_vaihingen_like_root(root, extent=25.0, density=5.0, seed=9)
        cfg = SynthWLConfig()
        ds = Vaihingen3DWLDataset(cfg, split="training", data_root=root,
                                  rng=np.random.default_rng(0))
        plan = ds.calibration(num_samples=4)

        builder = ParallelSphereBuilder(ds, max_workers=4)
        batch, metas = builder.next_batch(np.random.default_rng(5), plan)
        assert batch.features.shape[0] == cfg.batch_num
        assert len(metas) == cfg.batch_num
        # Masks consistent with lengths at every level
        for l in range(batch.num_layers):
            np.testing.assert_array_equal(
                np.asarray(batch.masks[l]).sum(1),
                np.asarray(batch.lengths[l]))
