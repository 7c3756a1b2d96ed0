"""AL acquisition policies: entropy x class-rarity ranking vs the random
control arm (config.al_acquisition), on fabricated anchor ledgers.

The entropy policy is the reference's (tester_WeakLabel.py:403-474); the
random arm exists to measure AL efficacy at identical label budget
(VERDICT r3 #3, scripts/run_al_ablation.sh)."""

import pickle
from os.path import join
from types import SimpleNamespace

import numpy as np
import pytest

from weasal_tpu.config import Config
from weasal_tpu.train.tester import ModelTester


N_ANCHORS = 40
N_PTS = 400
N_CLASSES = 5


@pytest.fixture
def ledger(tmp_path):
    rng = np.random.default_rng(0)
    anchors_dict, anchor_lb = {}, {}
    for a in range(N_ANCHORS):
        pt_ids = rng.choice(N_PTS, size=12, replace=False)
        anchors_dict[a] = [[pt_ids], [rng.random(3)]]
        hot = np.zeros(N_CLASSES, np.int64)
        hot[rng.integers(0, N_CLASSES, 2)] = 1
        anchor_lb[a] = hot
    initial = np.array([0, 1, 2, 3], dtype=np.int64)

    with open(join(tmp_path, "cloud_anchors_reduced.pkl"), "wb") as f:
        pickle.dump((None, None, anchors_dict, anchor_lb), f)
    with open(join(tmp_path, "cloud_subsampled_anchors.pkl"), "wb") as f:
        pickle.dump(initial, f)

    probs = rng.random((N_PTS, N_CLASSES))
    probs /= probs.sum(1, keepdims=True)
    all_probs = {"cloud.ply": probs}
    all_pseudo = {"cloud.ply": probs.argmax(1)}
    ds = SimpleNamespace(cloud_names_split=["cloud"], tree_path=str(tmp_path))
    return ds, all_probs, all_pseudo, initial


def _run(tmp_path, ds, all_probs, all_pseudo, policy, n_add=6):
    cfg = Config()
    cfg.anchor_method = "reduced"
    cfg.added_labels_per_epoch = n_add
    cfg.al_acquisition = policy
    fake = SimpleNamespace(config=cfg)
    ModelTester._extend_anchor_ledger(fake, ds, all_probs, all_pseudo)
    with open(join(str(tmp_path), "cloud_subsampled_anchors.pkl"),
              "rb") as f:
        return np.asarray(pickle.load(f))


def test_entropy_arm_budget_and_no_reuse(tmp_path, ledger):
    ds, all_probs, all_pseudo, initial = ledger
    after = _run(tmp_path, ds, all_probs, all_pseudo, "entropy")
    assert len(after) == len(initial) + 6
    assert set(initial).issubset(set(after))
    assert len(set(after.tolist())) == len(after)      # no duplicates


def test_random_arm_budget_deterministic_and_distinct(tmp_path, ledger):
    ds, all_probs, all_pseudo, initial = ledger
    after = _run(tmp_path, ds, all_probs, all_pseudo, "random")
    assert len(after) == len(initial) + 6
    assert len(set(after.tolist())) == len(after)

    # same state -> same draw (crash/rerun of an acquisition is stable)
    with open(join(str(tmp_path), "cloud_subsampled_anchors.pkl"),
              "wb") as f:
        pickle.dump(initial, f)
    again = _run(tmp_path, ds, all_probs, all_pseudo, "random")
    np.testing.assert_array_equal(after, again)

    # the random permutation ignores the probabilities entirely: shuffling
    # them must not change the draw (whereas entropy ranking depends on
    # them) — this is what makes it a valid control arm
    rng = np.random.default_rng(5)
    shuffled = {"cloud.ply": all_probs["cloud.ply"][rng.permutation(N_PTS)]}
    with open(join(str(tmp_path), "cloud_subsampled_anchors.pkl"),
              "wb") as f:
        pickle.dump(initial, f)
    blind = _run(tmp_path, ds, shuffled, all_pseudo, "random")
    np.testing.assert_array_equal(after, blind)


def test_config_roundtrips_acquisition(tmp_path):
    cfg = Config()
    cfg.dataset = "Vaihingen3DWL"
    cfg.al_acquisition = "random"
    cfg.saving_path = str(tmp_path)
    cfg.save()
    loaded = Config()
    loaded.load(str(tmp_path))
    assert loaded.al_acquisition == "random"
    # default stays out of parameters.txt (reference-format compatibility)
    cfg2 = Config()
    cfg2.dataset = "Vaihingen3DWL"
    cfg2.saving_path = str(tmp_path / "d2")
    import os
    os.makedirs(cfg2.saving_path, exist_ok=True)
    cfg2.save()
    with open(join(str(tmp_path / "d2"), "parameters.txt")) as f:
        assert "al_acquisition" not in f.read()
