"""Voting inference + active-learning label acquisition.

Port surface of the reference's ModelTesterWL / ModelTesterPL
(utils/tester_WeakLabel.py:54-485, utils/tester_PseudoLabel.py): spheres are
drawn by minimum potential until every point has been voted on `num_votes`
times; per-sphere softmax probabilities are accumulated into full-cloud
buffers with 0.95 smoothing, only inside 0.7 * in_radius of the sphere
center; final probabilities are reprojected to the raw clouds and written as
prediction/probability/potential plys plus pickles.

Active-learning branches extend the on-disk label ledgers exactly like the
reference: WL ranks unused anchors by mean point entropy x class-rarity
score and appends to `<cloud>_subsampled_anchors.pkl`
(tester_WeakLabel.py:403-474); PL ranks points by entropy x class-weight
score and appends to `<cloud>_al_groundTruth_IDs.pkl`
(tester_PseudoLabel.py:393-438).
"""

from __future__ import annotations

import os
import pickle
import time
from os.path import join
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from weasal_tpu.train.trainer import TrainState, _model_for_config
from weasal_tpu.utils import conf_matrix
from weasal_tpu.utils.metrics import IoU_from_confusions, fast_confusion
from weasal_tpu.utils.ply import write_ply


class ModelTester:
    """Unified tester; `mode` follows the trained model
    ('weak' = KPFCNN_mprm, 'pseudo' = KPFCNN)."""

    def __init__(self, config, dataset, chkp_path: str,
                 mode: Optional[str] = None):
        self.config = config
        self.mode = mode or ("weak" if getattr(
            config, "model_name", "KPFCNN_mprm") == "KPFCNN_mprm"
            else "pseudo")
        # Data-parallel voting (VERDICT r2 #6): same mesh recipe as the
        # trainer — sphere axis sharded, state + resident clouds + vote
        # buffers replicated. batch_num must divide across the mesh.
        ndev = int(getattr(config, "data_parallel_devices", 0) or 0)
        if ndev == -1:
            ndev = len(jax.devices())
        if ndev > 1 and config.batch_num % ndev:
            new_bn = ((config.batch_num + ndev - 1) // ndev) * ndev
            print(f"batch_num {config.batch_num} -> {new_bn} "
                  f"(divisible by {ndev} data-parallel devices)")
            config.batch_num = new_bn
        if ndev > 1:
            from weasal_tpu.parallel.mesh import make_mesh
            self.mesh = make_mesh(ndev)
            print(f"Data-parallel voting over {ndev} devices "
                  f"({config.batch_num} spheres/batch)")
        else:
            self.mesh = None
        self.model = _model_for_config(config, dataset.label_values,
                                       dataset.ignored_labels)
        self.plan = dataset.calibration()
        config.pallas_band_table = (self.plan.bands or {}).get("kpconv")

        from weasal_tpu.train.trainer import load_checkpoint_file
        payload = load_checkpoint_file(chkp_path)
        ms = payload["model_state_dict"]
        self.state = TrainState(params=ms["params"],
                                batch_stats=ms["batch_stats"],
                                constants=ms["constants"], opt_state=None)
        self.epoch = payload["epoch"]
        if self.mesh is not None:
            from weasal_tpu.parallel.mesh import replicate
            self.state = replicate(self.state, self.mesh)
        print("Model and training state restored.")

        model, mmode, plan = self.model, self.mode, self.plan
        from weasal_tpu.utils.platform import resolve_pallas_flag
        self._resident_spec = None
        if resolve_pallas_flag(
                getattr(config, "resident_clouds", "auto"),
                bool(getattr(config, "device_pyramid", False))):
            from weasal_tpu.data.resident import feature_spec
            self._resident_spec = feature_spec(
                dataset.name, config.in_features_dim)
        spec = self._resident_spec

        @jax.jit
        def eval_step(state, batch):
            unsort = None
            d2 = None
            if isinstance(batch, dict):
                if "flat_inds" in batch:
                    from weasal_tpu.data.resident import (
                        assemble_level0_device)
                    # augment=True: reference voting averages over
                    # augmentations (potential_item augments at every
                    # split) and masks votes on AUGMENTED coordinates
                    batch = assemble_level0_device(
                        batch, config, plan, augment=True, spec=spec)
                    unsort = batch.pop("unsort")
                    pts = batch["points0"]
                    d2 = jnp.sum(pts * pts, axis=-1)    # sorted order
                # Fused path: level-0 arrays in, pyramid built in-jit (same
                # program shape as the fused train step)
                from weasal_tpu.ops.pyramid import batch_from_device_pyramid
                batch = batch_from_device_pyramid(
                    batch["points0"], batch["mask0"], batch["features"],
                    batch["labels"], config, plan, batch["center_pts"],
                    rotations=batch["rotations"],
                    cloud_lb=batch["cloud_lb"],
                    region_inds=batch["region_inds"],
                    region_masks=batch["region_masks"],
                    region_point_masks=batch["region_point_masks"],
                    region_lb=batch["region_lb"])
            variables = {"params": state.params,
                         "constants": state.constants,
                         "batch_stats": state.batch_stats}
            out = model.apply(variables, batch, train=False)
            logits = out[0] if mmode == "weak" else out
            probs = jax.nn.softmax(logits, axis=-1)
            if unsort is not None:
                # back to input_inds order for the host-side vote scatter
                probs = jnp.take_along_axis(probs, unsort[..., None], axis=1)
                d2 = jnp.take_along_axis(d2, unsort, axis=1)
            return probs, d2

        self._eval_step = eval_step

    # ------------------------------------------------------------------

    def cloud_segmentation_test(self, dataset, num_votes: int = 100,
                                active_learning: bool = False,
                                test_on_train: bool = False,
                                stage_dir: str = "WeakLabel",
                                resume: bool = False):
        config = self.config
        test_smooth = 0.95
        test_radius_ratio = 0.7
        nc_model = config.num_classes
        rng = np.random.default_rng(11)

        if dataset.split == "ERF":
            # ERF sampling never updates potentials (deterministic region,
            # datasets.py _sample_center), so the min-potential voting loop
            # below would spin forever.
            raise ValueError("cloud_segmentation_test cannot vote on the "
                             "'ERF' split: its potentials never advance. "
                             "Use the visualization utilities instead.")

        self.test_probs = [np.zeros((l.shape[0], nc_model))
                           for l in dataset.input_labels]

        test_path = None
        if not active_learning and config.saving:
            test_path = join(f"test/{stage_dir}",
                             config.saving_path.split("/")[-1])
            for sub in ("", "predictions", "probs", "potentials"):
                os.makedirs(join(test_path, sub), exist_ok=True)

        if dataset.split == "validation":
            val_proportions = np.zeros(nc_model, np.float32)
            i = 0
            for label_value in dataset.label_values:
                if label_value not in dataset.ignored_labels:
                    val_proportions[i] = np.sum(
                        [np.sum(lbl == label_value)
                         for lbl in dataset.validation_labels])
                    i += 1

        test_epoch = 0
        last_min = -0.5
        t_last = time.time()

        # Liveness: a dropped tunnel RPC wedges the loop in a fetch
        # forever; exit 86 lets a wrapper rerun the (resumable) voting.
        from weasal_tpu.utils.watchdog import StallWatchdog
        watchdog = StallWatchdog.from_config(config,
                                             label=f"vote[{self.mode}]")

        from weasal_tpu.data.loader import BatchPrefetcher
        extra_arrays = None
        vote_acc = None
        if getattr(config, "device_pyramid", False):
            if self._resident_spec is not None:
                from weasal_tpu.data.resident import ResidentBatchSource
                from weasal_tpu.train.vote import DeviceVoteAccumulator
                batch_source = ResidentBatchSource(dataset, self.plan,
                                                   mesh=self.mesh)
                extra_arrays = batch_source.resident.arrays
                r_sq = None
                if 0 < test_radius_ratio < 1:
                    r_sq = (test_radius_ratio * config.in_radius) ** 2
                # Full-cloud vote buffers stay on device: nothing is
                # fetched per batch, the loop is sampling-bound
                vote_acc = DeviceVoteAccumulator(
                    batch_source.resident, nc_model, smooth=test_smooth,
                    radius_sq=r_sq, mesh=self.mesh)
            else:
                from weasal_tpu.data.level0 import Level0BatchSource
                batch_source = Level0BatchSource(dataset, self.plan)
        else:
            batch_source = dataset

        sharding = None
        if self.mesh is not None:
            from weasal_tpu.parallel.mesh import batch_sharding
            sharding = batch_sharding(self.mesh)

        # Vote checkpointing: the voting loop is the longest un-resumable
        # stage on this platform (a 20-vote dump on the 1.9M-point tile is
        # ~40 epochs / ~75 min), and both failure modes observed in real
        # runs — a wedged tunnel RPC and the platform's per-dispatch host
        # memory leak (OOM at ~130 GB RSS) — kill the process mid-vote.
        # Persist (probs, potentials, rng, epoch counters) at every vote
        # boundary so a rerun with resume=True costs at most ~2 epochs.
        chkp_file = None
        if not active_learning and getattr(config, "saving", False) \
                and config.saving_path:
            tag = "train" if test_on_train else dataset.split
            # the tester may be pointed at a log whose directory was never
            # created in this process (e.g. a fabricated log name in tests)
            os.makedirs(config.saving_path, exist_ok=True)
            chkp_file = join(config.saving_path, f"vote_chkp_{tag}.pkl")
            if resume and os.path.exists(chkp_file):
                with open(chkp_file, "rb") as f:
                    vc = pickle.load(f)
                self.test_probs = vc["test_probs"]
                if vote_acc is not None:
                    vote_acc.load(self.test_probs)
                dataset.potentials = vc["potentials"]
                dataset.min_potentials = vc["min_potentials"]
                dataset.argmin_potentials = vc["argmin_potentials"]
                rng.bit_generator.state = vc["rng_state"]
                test_epoch = vc["test_epoch"]
                last_min = vc["last_min"]
                print(f"Vote resumed at epoch {test_epoch}, min potential "
                      f"{dataset.min_potential():.1f}")
            elif os.path.exists(chkp_file):
                # stale state from an earlier run of this log — a fresh
                # vote must not resume from it on its own stall retries
                os.remove(chkp_file)

        try:
            while True:
                # augment=True: the reference's voting protocol averages
                # smoothed votes over random augmentations (its test
                # loaders run the same augmenting potential_item)
                prefetcher = BatchPrefetcher(batch_source, self.plan,
                                             config.validation_size, rng=rng,
                                             augment=True, sharding=sharding,
                                             extra_arrays=extra_arrays)
                for i, (batch, metas) in enumerate(prefetcher):
                    probs_dev, d2_dev = self._eval_step(self.state, batch)
                    if vote_acc is not None:
                        # probs are already back in input_inds order; the
                        # radius mask (augmented coordinates) and smoothing
                        # run in-jit
                        vote_acc.update(probs_dev, batch, d2=d2_dev)
                    else:
                        probs_all = np.asarray(probs_dev)
                        points_all = np.asarray(batch["points0"]
                                                if isinstance(batch, dict)
                                                else batch.points[0])
                        for b, meta in enumerate(metas):
                            n = meta["n_real"]
                            probs = probs_all[b, :n]
                            inds = meta["input_inds"][:n]
                            pts = points_all[b, :n]
                            if 0 < test_radius_ratio < 1:
                                inside = np.sum(pts ** 2, axis=1) < \
                                    (test_radius_ratio * config.in_radius) ** 2
                                inds = inds[inside]
                                probs = probs[inside]
                            c_i = meta["cloud_ind"]
                            self.test_probs[c_i][inds] = \
                                test_smooth * self.test_probs[c_i][inds] \
                                + (1 - test_smooth) * probs
                    # Host sampling/dispatch is progress: vote epochs are
                    # sampling-bound and can legitimately exceed the stall
                    # threshold; the wedge (lost RPC) stops these beats
                    # too, and the materialize fetch catches it.
                    watchdog.beat()
                    if vote_acc is not None and (i + 1) % 20 == 0:
                        # Drain the tunnel's dispatch backlog every ~20
                        # batches (see DeviceVoteAccumulator.sync): without
                        # this, the first fetch after a 200-batch epoch
                        # paid the whole backlog at once — minutes, which
                        # the stall watchdog killed as a hang.
                        vote_acc.sync()
                        watchdog.beat()   # the fetch returned = alive
                    if time.time() - t_last > 1.0:
                        t_last = time.time()
                        print(f"e{test_epoch:03d}-i{i:04d} => "
                              f"{100 * i / config.validation_size:.0f}%")

                new_min = dataset.min_potential()
                print(f"Test epoch {test_epoch}, end. "
                      f"Min potential = {new_min:.1f}")
                watchdog.beat()

                if last_min + 1 < new_min:
                    last_min += 1
                    if vote_acc is not None:
                        # One fetch per vote epoch instead of one per batch
                        self.test_probs = vote_acc.materialize()
                        watchdog.beat()   # the fetch returned = device alive

                    if chkp_file is not None:
                        tmp = chkp_file + ".tmp"
                        with open(tmp, "wb") as f:
                            pickle.dump(dict(
                                test_probs=self.test_probs,
                                potentials=dataset.potentials,
                                min_potentials=dataset.min_potentials,
                                argmin_potentials=dataset.argmin_potentials,
                                rng_state=rng.bit_generator.state,
                                test_epoch=test_epoch + 1,
                                last_min=last_min), f)
                        os.replace(tmp, chkp_file)

                    if dataset.split == "validation":
                        self._subcloud_confusion(dataset, val_proportions)

                    if last_min > num_votes:
                        all_pseudo_lbs, all_probs = {}, {}
                        proj_probs = []
                        for i, file_path in enumerate(dataset.files):
                            probs = self.test_probs[i][dataset.test_proj[i], :]
                            proj_probs.append(probs)
                            fn = file_path.split("/")[-1].split(".txt")[0]
                            all_probs[fn] = self.test_probs[i]
                            all_pseudo_lbs[fn] = np.argmax(self.test_probs[i],
                                                           axis=1)

                        if not active_learning:
                            if test_path is not None:
                                with open(join(test_path, "_pseudo.pickle"),
                                          "wb") as f:
                                    pickle.dump(all_pseudo_lbs, f)
                                with open(join(test_path, "_probs.pickle"),
                                          "wb") as f:
                                    pickle.dump(all_probs, f)
                                self._save_clouds(dataset, proj_probs,
                                                  test_path, test_on_train)
                        elif self.mode == "weak":
                            self._extend_anchor_ledger(dataset, all_probs,
                                                       all_pseudo_lbs)
                        else:
                            self._extend_gt_ledger(dataset, all_probs)

                test_epoch += 1
                if last_min > num_votes:
                    break
        finally:
            # Disarm even on exceptions (an orphaned armed
            # watchdog would hard-kill later unrelated work)
            watchdog.stop()
        if chkp_file is not None and os.path.exists(chkp_file):
            os.remove(chkp_file)    # completed: nothing left to resume
        return self.test_probs

    # ------------------------------------------------------------------

    def _subcloud_confusion(self, dataset, val_proportions):
        label_values = dataset.label_values
        Confs = []
        for i in range(len(dataset.files)):
            probs = np.array(self.test_probs[i], copy=True)
            for l_ind, label_value in enumerate(label_values):
                if label_value in dataset.ignored_labels:
                    probs = np.insert(probs, l_ind, 0, axis=1)
            preds = label_values[np.argmax(probs, axis=1)].astype(np.int32)
            targets = dataset.input_labels[i]
            Confs.append(fast_confusion(targets, preds, label_values))
        C = np.sum(np.stack(Confs), axis=0).astype(np.float32)
        for l_ind, label_value in reversed(list(enumerate(label_values))):
            if label_value in dataset.ignored_labels:
                C = np.delete(C, l_ind, axis=0)
                C = np.delete(C, l_ind, axis=1)
        C *= np.expand_dims(
            val_proportions / (np.sum(C, axis=1) + 1e-6), 1)
        IoUs = IoU_from_confusions(C)
        print("Sub-cloud mIoU = {:.2f} | ".format(100 * np.mean(IoUs))
              + " ".join(f"{100 * v:.2f}" for v in IoUs))

    def _save_clouds(self, dataset, proj_probs, test_path, test_on_train):
        config = self.config
        label_values = dataset.label_values
        n_show = len(label_values) - len(dataset.ignored_labels)
        Confs = np.zeros((len(label_values), len(label_values)), np.int32)
        for i, file_path in enumerate(dataset.files):
            points = dataset.load_evaluation_points(file_path)
            if hasattr(dataset, "coord_offset"):
                points = points + dataset.coord_offset
            pp = proj_probs[i]
            for l_ind, label_value in enumerate(label_values):
                if label_value in dataset.ignored_labels:
                    pp = np.insert(pp, l_ind, 0, axis=1)
            preds = label_values[np.argmax(pp, axis=1)].astype(np.int32)

            targets = dataset.validation_labels[i].astype(np.int32)
            error_map = (preds != targets).astype(np.int8)
            cloud_name = file_path.split("/")[-1]
            write_ply(join(test_path, "predictions", cloud_name),
                      [points.astype(np.float32), preds, targets, error_map],
                      ["x", "y", "z", "preds", "targets", "error"])
            prob_names = ["_".join(dataset.label_to_names[label].split())
                          for label in label_values
                          if label not in dataset.ignored_labels]
            write_ply(join(test_path, "probs", cloud_name),
                      [points.astype(np.float32),
                       proj_probs[i].astype(np.float32)],
                      ["x", "y", "z"] + prob_names)
            pot_points = np.asarray(dataset.pot_trees[i].data)
            pots = dataset.potentials[i].astype(np.float32)
            write_ply(join(test_path, "potentials", cloud_name),
                      [pot_points.astype(np.float32), pots],
                      ["x", "y", "z", "pots"])
            Confs += fast_confusion(targets, preds, label_values).astype(
                np.int32)

        cm_name = dataset.name + ("_train" if test_on_train
                                  else "_" + dataset.split)
        names = {k: v for k, v in dataset.label_to_names.items()
                 if k not in dataset.ignored_labels}
        conf_matrix.plot(Confs[:n_show, :n_show], names,
                         join(test_path, "predictions"),
                         file_suffix=cm_name, abs_vals=False, F1=True,
                         iou=True, show=False)

    # ------------------------------------------------------------------
    # Active learning: extend label ledgers
    # ------------------------------------------------------------------

    def _extend_anchor_ledger(self, dataset, all_probs, all_pseudo_lbs):
        """WL: add `added_labels_per_epoch` unused anchors per training
        file — ranked by entropy x class-rarity (the reference policy,
        tester_WeakLabel.py:403-474) or uniformly at random
        (config.al_acquisition == "random", the efficacy control arm at
        identical label budget)."""
        config = self.config
        random_arm = getattr(config, "al_acquisition",
                             "entropy") == "random"
        for i, cloud_name in enumerate(dataset.cloud_names_split):
            key = cloud_name + ".ply"
            probs = all_probs[key]
            entropy = -np.sum(probs * np.log2(probs + 1e-12), axis=1)

            anchors_file = join(
                dataset.tree_path,
                f"{cloud_name}_anchors_{config.anchor_method}.pkl")
            with open(anchors_file, "rb") as f:
                anchor, anchor_tree, anchors_dict, anchor_lb = pickle.load(f)
            sub_file = join(dataset.tree_path,
                            f"{cloud_name}_subsampled_anchors.pkl")
            with open(sub_file, "rb") as f:
                anchor_inds_sub = pickle.load(f)

            if random_arm:
                # Deterministic per (cloud, ledger size): rerunning a
                # crashed acquisition draws the same permutation.
                r = np.random.default_rng(
                    [len(anchor_inds_sub), i, 913])
                sort_ids = r.permutation(len(anchors_dict))
            else:
                label_sum = np.zeros(np.size(anchor_lb[0]), dtype=np.int64)
                for label in anchor_inds_sub:
                    label_sum += anchor_lb[label]
                class_scores = np.exp(-label_sum / len(anchor_inds_sub))

                scores = np.zeros(len(anchors_dict), np.float32)
                pseudo = all_pseudo_lbs[key]
                for idx, a in enumerate(anchors_dict):
                    pt_ids = np.squeeze(anchors_dict[a][0])
                    ent = entropy[pt_ids]
                    weak_pred = np.zeros(np.size(anchor_lb[0]),
                                         dtype=np.int64)
                    weak_pred[np.unique(pseudo[pt_ids])] = 1
                    scores[a] = np.mean(ent) * (weak_pred @ class_scores)

                sort_ids = np.argsort(-scores)
            used = set(int(u) for u in anchor_inds_sub)
            sort_ids = np.array([s for s in sort_ids if s not in used])
            n_add = config.added_labels_per_epoch
            if len(sort_ids) < n_add:
                raise ValueError(
                    "Not enough weak labels left for the next iteration")
            anchor_inds_sub = np.append(anchor_inds_sub, sort_ids[:n_add])
            with open(sub_file, "wb") as f:
                pickle.dump(anchor_inds_sub, f)
            print(f"{cloud_name}: anchor ledger -> "
                  f"{len(anchor_inds_sub)} anchors")

    def _extend_gt_ledger(self, dataset, all_probs):
        """PL: add `added_labels_per_epoch` points per training file —
        ranked by entropy x class-weight (reference policy) or uniformly
        at random (config.al_acquisition == "random", control arm)."""
        config = self.config
        random_arm = getattr(config, "al_acquisition",
                             "entropy") == "random"
        for i, cloud_name in enumerate(dataset.cloud_names_split):
            key = cloud_name + ".ply"
            probs = all_probs[key]

            gt_file = join(dataset.tree_path,
                           cloud_name + "_al_groundTruth_IDs.pkl")
            with open(gt_file, "rb") as f:
                gt_ids = pickle.load(f)
            used = set(int(u) for u in np.asarray(gt_ids).ravel())
            if random_arm:
                r = np.random.default_rng([len(used), i, 913])
                sort_ids = r.permutation(probs.shape[0])
            else:
                entropy = -np.sum(probs * np.log2(probs + 1e-12), axis=1)
                class_w = np.asarray(config.class_w, np.float64)
                class_scores = np.exp(class_w[np.argmax(probs, axis=1)])
                combined = entropy * class_scores
                sort_ids = np.argsort(-combined)
            sort_ids = np.array([s for s in sort_ids if s not in used])
            n_add = config.added_labels_per_epoch
            if len(sort_ids) < n_add:
                raise ValueError(
                    "Not enough point labels left for the next iteration")
            gt_ids = np.append(np.asarray(gt_ids, dtype=np.int64),
                               sort_ids[:n_add]).astype(np.int64)
            with open(gt_file, "wb") as f:
                pickle.dump(gt_ids, f)
            print(f"{cloud_name}: GT ledger -> {len(gt_ids)} points")
