#!/usr/bin/env python
"""Rebuild a vote checkpoint from a COMPLETED probability dump so the vote
can be extended to a higher num_votes.

Round 3's mid-budget chain finished its train-split vote dump at 13 votes
(the stage was rerun with --num_votes 13 to meet the round's wall clock);
a completed vote deletes its vote_chkp_train.pkl (tester.py drops it on
success — nothing left to resume), so `test_models.py --resume` alone
cannot continue it. But the dump itself persists the full voting state:

  * test/<stage>/<log>/_probs.pickle  — the smoothed per-subsampled-point
    probability accumulators for every cloud (exactly self.test_probs),
  * test/<stage>/<log>/potentials/*.ply — the per-pot-point sampling
    potentials ("pots" field, float32).

This script reconstructs vote_chkp_<tag>.pkl from those artifacts so
`test_models.py --resume <log> --num_votes 20` continues voting from vote
13 instead of restarting. The reconstructed checkpoint uses a FRESH
augmentation rng (the original generator state was not dumped): the
continuation's random rotations/scales differ from an uninterrupted run's,
which is statistically immaterial (votes are iid augmentation samples; the
reference's own protocol, tester_WeakLabel.py, never pins vote rng across
runs) but means bit-identity to an uninterrupted 20-vote run is not
claimed — only the checkpoint-file resume path (tested) has that property.

Usage:
    python scripts/extend_vote.py --log results/WeakLabel/Log_x \
        --data_root <root> [--on train] [--last_min 13.5] [--test_epoch 27]
"""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Host-only work: never touch the TPU (a live tunnel client would leak and
# contend with the voting process this script exists to restart).
os.environ.setdefault("WEASAL_PLATFORM", "cpu")
from weasal_tpu.utils.platform import apply_platform_env
apply_platform_env()

import numpy as np

from weasal_tpu.config import Config
from weasal_tpu.data.datasets import DATASET_REGISTRY
from weasal_tpu.utils.ply import read_ply


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log", required=True)
    ap.add_argument("--data_root", required=True)
    ap.add_argument("--on", default="train", choices=["train", "validation"])
    ap.add_argument("--last_min", type=float, default=None,
                    help="voting progress counter at dump time (default: "
                         "floor(min potential) - 0.5, the tester's own "
                         "increment lattice)")
    ap.add_argument("--test_epoch", type=int, default=None,
                    help="vote epoch counter at dump time (cosmetic: only "
                         "affects log labels)")
    ap.add_argument("--rng_seed", type=int, default=1113,
                    help="fresh augmentation rng for the continuation")
    args = ap.parse_args()

    config = Config()
    config.load(args.log)
    stage = "WeakLabel" if config.dataset.endswith("WL") else "PseudoLabel"
    test_path = os.path.join(f"test/{stage}", args.log.rstrip("/").split("/")[-1])
    tag = "train" if args.on == "train" else "validation"

    with open(os.path.join(test_path, "_probs.pickle"), "rb") as f:
        all_probs = pickle.load(f)

    dataset_cls = DATASET_REGISTRY[config.dataset]
    test_on_train = args.on == "train"
    split = "test" if test_on_train else args.on
    dataset = dataset_cls(config, split=split, test_on_train=test_on_train,
                          data_root=args.data_root)

    test_probs, potentials, min_pots, argmin_pots = [], [], [], []
    for i, file_path in enumerate(dataset.files):
        fn = file_path.split("/")[-1].split(".txt")[0]
        probs = np.asarray(all_probs[fn], dtype=np.float64)
        n_sub = dataset.input_labels[i].shape[0]
        if probs.shape[0] != n_sub:
            raise SystemExit(f"{fn}: dumped probs rows {probs.shape[0]} != "
                             f"subsampled points {n_sub} — wrong data_root?")
        test_probs.append(probs)

        cloud_name = file_path.split("/")[-1]
        pot_ply = read_ply(os.path.join(test_path, "potentials", cloud_name))
        pots = np.asarray(pot_ply["pots"], dtype=np.float64)
        n_pot = dataset.potentials[i].shape[0]
        if pots.shape[0] != n_pot:
            raise SystemExit(f"{cloud_name}: dumped pots {pots.shape[0]} != "
                             f"pot points {n_pot} — wrong data_root?")
        potentials.append(pots)
        min_pots.append(float(pots.min()))
        argmin_pots.append(int(pots.argmin()))

    new_min = min(min_pots)
    # The tester's counter lives on a k+0.5 lattice (starts at -0.5,
    # advances by 1 while last_min + 1 < min potential); reconstruct the
    # value it must have held when this dump was written.
    last_min = args.last_min
    if last_min is None:
        # largest value on the tester's k+0.5 lattice STRICTLY below the
        # dumped min potential (increments require last_min + 1 < new_min,
        # so the counter always sits strictly under the potential floor);
        # undershooting only costs a couple of extra vote epochs.
        last_min = float(np.floor(new_min + 0.5 - 1e-9)) - 0.5
    test_epoch = args.test_epoch if args.test_epoch is not None else \
        int(round(2 * new_min))

    rng = np.random.default_rng(args.rng_seed)
    chkp_file = os.path.join(args.log, f"vote_chkp_{tag}.pkl")
    tmp = chkp_file + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(dict(test_probs=test_probs,
                         potentials=potentials,
                         min_potentials=min_pots,
                         argmin_potentials=argmin_pots,
                         rng_state=rng.bit_generator.state,
                         test_epoch=test_epoch,
                         last_min=float(last_min)), f)
    os.replace(tmp, chkp_file)
    print(f"reconstructed {chkp_file}: min potential {new_min:.2f}, "
          f"last_min {last_min}, test_epoch {test_epoch}, "
          f"fresh rng seed {args.rng_seed}")


if __name__ == "__main__":
    main()
