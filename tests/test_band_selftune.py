"""Self-tuning band windows (VERDICT r2 #10).

The trainer folds observed runtime drop tails back into the persisted
ShapePlan.bands: when one edge's per-epoch drop fraction exceeds the
expected calibration residue (1e-4 of that edge's neighbor slots), the
trainer widens exactly that edge by one window quantum, persists the plan
under the dataset's cache key, and retraces the jitted steps. A run that
starts with undersized bands converges to a clean tail without manual
recalibration.
"""

import json
import os

import numpy as np
import pytest

from weasal_tpu.data.datasets import Vaihingen3DWLDataset
from weasal_tpu.data.synthetic import make_vaihingen_like_root
from weasal_tpu.ops.pallas.common import QUANTUM
from weasal_tpu.ops.pyramid import drop_vector_layout
from weasal_tpu.train.trainer import ModelTrainer
from tests.test_datasets import SynthWLConfig


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    wd = tmp_path_factory.mktemp("selftune")
    root = str(wd / "Vaihingen3D")
    # Small tile: interpret-mode banded kernels retrace after each widen,
    # so keep the level-0 budget modest
    make_vaihingen_like_root(root, extent=22.0, density=4.0, seed=7)
    cfg = SynthWLConfig()
    cfg.device_pyramid = True
    cfg.use_pallas_search = True
    cfg.pallas_interpret = True
    cfg.steps_per_dispatch = 1
    cfg.max_epoch = 6
    cfg.epoch_steps = 2
    cfg.validation_size = 1
    cfg.saving = True
    cfg.saving_path = str(wd / "log")
    ds = Vaihingen3DWLDataset(cfg, split="training", data_root=root,
                              rng=np.random.default_rng(0))
    return cfg, ds, str(wd)


def test_self_tune_widens_persists_and_rebuilds(setup):
    """_self_tune_bands: widens exactly the over-threshold edges by one
    quantum, persists the plan under the dataset's cache key, refreshes
    the kpconv band table, and swaps in freshly-traced steps; a
    sub-threshold tail (the expected calibration residue) is a no-op."""
    cfg, ds, _ = setup
    trainer = ModelTrainer(cfg, ds, stage_dir="WeakLabel")
    plan = trainer.plan
    assert plan.bands, "banded config must calibrate measured windows"
    L = plan.num_layers
    layout = drop_vector_layout(L)
    vec = np.zeros(5 * L - 3)
    i = layout.index(("search", "pool", 0))
    j = layout.index(("kpconv", "conv", 1))
    # Saturate both edges: far above the 1e-4 residue threshold
    vec[i] = plan.num_points[1] * plan.pool_neighbors[0] * cfg.batch_num
    vec[j] = plan.num_points[1] * plan.conv_neighbors[1] * cfg.batch_num

    old_search = plan.bands["search"]["pool"][0]
    old_kp = plan.bands["kpconv"]["conv"][1]
    old_conv0 = plan.bands["search"]["conv"][0]
    old_step, old_eval = trainer._train_step, trainer._eval_step

    assert trainer._self_tune_bands(vec, n_steps=1, dataset=ds)
    assert plan.bands["search"]["pool"][0] == old_search + QUANTUM
    assert plan.bands["kpconv"]["conv"][1] == old_kp + QUANTUM
    assert plan.bands["search"]["conv"][0] == old_conv0, \
        "edges without drops must not widen"
    assert trainer._train_step is not old_step
    assert trainer._eval_step is not old_eval
    assert trainer.config.pallas_band_table == plan.bands["kpconv"]

    with open(os.path.join(ds.path, "shape_plans.json")) as f:
        plans = json.load(f)
    persisted = plans[ds._plan_key()]["bands"]
    assert persisted["search"]["pool"][0] == old_search + QUANTUM
    assert persisted["kpconv"]["conv"][1] == old_kp + QUANTUM

    # Expected calibration tail: counted, logged, never widened
    vec2 = np.zeros_like(vec)
    vec2[i] = 1.0
    step = trainer._train_step
    assert not trainer._self_tune_bands(vec2, n_steps=1000, dataset=ds)
    assert trainer._train_step is step


def test_undersized_bands_converge_during_training(setup):
    """End-to-end VERDICT r2 #10 criterion: a training run that starts
    with an undersized search band self-tunes to a clean drop tail —
    the trainer widens the edge during training (no manual
    recalibration) and the final epoch's counted drops fall back under
    the 1e-4 residue threshold."""
    cfg, ds, wd = setup
    plan = ds.calibration()
    assert plan.bands

    # Undersize the level-0 conv search edge below its raw measured need:
    # sample fresh calibration spheres and measure the un-padded needs
    rng = np.random.default_rng(3)
    clouds, _, _ = ds._sample_calibration_clouds(8, rng)
    from weasal_tpu.data.level0 import assemble_level0
    from weasal_tpu.ops.pyramid import measure_bands
    payload_groups = []
    bsz = max(int(cfg.batch_num), 1)
    for k in range(0, len(clouds) - bsz + 1, bsz):
        payloads = [dict(points=np.asarray(p, np.float32),
                         features=np.zeros((p.shape[0], 1), np.float32))
                    for p in clouds[k:k + bsz]]
        arrays = assemble_level0(payloads, plan, cfg.num_classes, rng)
        payload_groups.append((arrays["points0"], arrays["mask0"],
                               arrays["rotations"]))
    needs = measure_bands(payload_groups, cfg, plan,
                          headroom_fn=lambda n: n)
    need = needs["search"]["conv"][0]
    w0 = max(QUANTUM, (need // QUANTUM - 3) * QUANTUM)
    if (w0 // QUANTUM + 1) * QUANTUM >= need:
        pytest.skip(f"geometry too small to undersize (need {need})")
    plan.bands["search"]["conv"][0] = w0
    ds.save_plan(plan)

    cfg.saving_path = os.path.join(wd, "log_tune")
    trainer = ModelTrainer(cfg, ds, stage_dir="WeakLabel")
    assert trainer.plan.bands["search"]["conv"][0] == w0, \
        "trainer must pick up the persisted (undersized) plan"
    trainer.train(ds, None, al_iteration=0)

    # The band was widened during the run and persisted
    final_w = trainer.plan.bands["search"]["conv"][0]
    assert final_w > w0, "self-tuning must widen the undersized edge"
    with open(os.path.join(ds.path, "shape_plans.json")) as f:
        persisted = json.load(f)[ds._plan_key()]["bands"]
    assert persisted["search"]["conv"][0] == final_w

    # Drop trajectory: starts hot, ends under the residue threshold
    sat = os.path.join(cfg.saving_path, "plan_saturation.txt")
    drops = []
    with open(sat) as f:
        for line in f:
            if "kernel_drops" in line:
                drops.append(int(line.rsplit("kernel_drops", 1)[1]))
    assert len(drops) == cfg.max_epoch
    assert drops[0] > 0, "undersized band must drop neighbors at first"
    plan = trainer.plan
    slots = sum(plan.num_points[l] * plan.conv_neighbors[l]
                for l in range(plan.num_layers))
    slots += sum(plan.num_points[l + 1] * plan.pool_neighbors[l]
                 for l in range(plan.num_layers - 1))
    slots *= cfg.epoch_steps * cfg.batch_num
    assert drops[-1] / slots <= 1e-4, \
        (f"final epoch tail {drops[-1]}/{slots} above the residue "
         f"threshold; trajectory {drops}")
