"""Training engine: functional optax loop for the WeakLabel and PseudoLabel
stages.

Port surface of the reference's ModelTrainer pair
(utils/trainer_WeakLabel.py:56-566, utils/trainer_PseudoLabel.py) with the
same artifact contract — `parameters.txt`, `training_iteration{al}.txt` rows
`epoch step out_loss offset_loss train_accuracy time`, `val_IoUs.txt`,
potentials plys, periodic confusion plots, `running_PID.txt` kill switch,
`checkpoints/current_chkp.tar` + numbered checkpoints — and the same
optimizer semantics (SGD momentum + weight decay, deform-LR parameter group,
gradient clipping by norm (WL) or value (PL), per-epoch multiplicative LR
decays).

TPU re-design: the whole optimize step (forward, loss, backward, clip,
update, BN-stat update) is one jitted function over a dense PyramidBatch;
the host loop only samples spheres and logs. Data parallelism shards the
sphere axis (weasal_tpu/parallel/mesh.py).
"""

from __future__ import annotations

import os
import pickle
import time
from functools import partial
from os.path import exists, join
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from weasal_tpu.models import losses
from weasal_tpu.models.architectures import (
    KPFCNN, KPFCNN_mprm, valid_label_mapper)
from weasal_tpu.utils import conf_matrix
from weasal_tpu.utils.metrics import IoU_from_confusions, fast_confusion
from weasal_tpu.utils.ply import write_ply


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    constants: Any
    opt_state: Any


def load_checkpoint_file(path: str) -> Dict:
    """Read a checkpoint payload from any supported format.

    - this framework's `.tar` (a real tar archive with a pickled member),
    - a bare pickle (round-1 files),
    - a reference torch `.tar` (utils/trainer_WeakLabel.py:274-288),
      converted parameter-by-parameter via weasal_tpu.utils.torch_interop.
    """
    import tarfile
    if tarfile.is_tarfile(path):
        with tarfile.open(path) as tar:
            member = tar.getmembers()[0]
            payload = pickle.loads(tar.extractfile(member).read())
        return payload
    with open(path, "rb") as f:
        head = f.read(2)
    if head == b"PK" or head == b"\x80\x02":
        # torch.save zip container / torch-1.4 legacy pickle
        from weasal_tpu.utils.torch_interop import load_torch_checkpoint
        return load_torch_checkpoint(path)
    with open(path, "rb") as f:
        return pickle.load(f)


def _offset_mask(params) -> Any:
    """Pytree mask marking deformable-offset parameters ('offset' in path),
    which train at lr * deform_lr_factor (reference
    utils/trainer_WeakLabel.py:80-87)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def is_offset(path):
        return any("offset" in str(getattr(p, "key", p)) for p in path)

    paths = [is_offset(p) for p, _ in flat]
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, paths)


def make_optimizer(config, params, clip_mode: str = "norm"):
    """Torch-equivalent SGD chain: clip -> +wd*param -> momentum ->
    deform-group scale. The learning rate is applied in the train step so
    epoch-wise decays never retrace."""
    chain = []
    if config.grad_clip_norm > 0:
        if clip_mode == "norm":
            chain.append(optax.clip_by_global_norm(config.grad_clip_norm))
        else:
            chain.append(optax.clip(config.grad_clip_norm))
    if config.weight_decay:
        chain.append(optax.add_decayed_weights(config.weight_decay))
    chain.append(optax.trace(decay=config.momentum, nesterov=False))
    mask = _offset_mask(params)
    if jax.tree_util.tree_reduce(lambda a, b: a or b, mask, False):
        chain.append(optax.masked(
            optax.scale(config.deform_lr_factor), mask))
    return optax.chain(*chain)


def _model_for_config(config, label_values, ignored_labels):
    name = getattr(config, "model_name", "KPFCNN_mprm")
    if name == "KPFCNN_mprm":
        return KPFCNN_mprm(config, tuple(label_values),
                           tuple(ignored_labels))
    if name == "KPFCNN":
        return KPFCNN(config, tuple(label_values), tuple(ignored_labels))
    raise ValueError(f"Unsupported model: {name}")


class ModelTrainer:
    """Drives one training stage over a dataset pair (train/validation)."""

    def __init__(self, config, dataset, chkp_path: Optional[str] = None,
                 finetune: bool = False, mode: Optional[str] = None,
                 stage_dir: str = "WeakLabel"):
        """
        :param dataset: the training dataset (defines labels + shape plan)
        :param chkp_path: checkpoint to restore (None = fresh)
        :param mode: 'weak' | 'pseudo' (default from config.model_name)
        :param stage_dir: results subdirectory (WeakLabel | PseudoLabel)
        """
        self.config = config
        # Resolve data-parallel device count early: batch_num must be
        # divisible by the mesh size before the example batch / shape plan
        ndev = int(getattr(config, "data_parallel_devices", 0) or 0)
        if ndev == -1:
            ndev = len(jax.devices())
            config.data_parallel_devices = ndev
        if ndev > 1 and config.batch_num % ndev:
            new_bn = ((config.batch_num + ndev - 1) // ndev) * ndev
            print(f"batch_num {config.batch_num} -> {new_bn} "
                  f"(divisible by {ndev} data-parallel devices)")
            config.batch_num = new_bn
        self.mode = mode or ("weak" if getattr(
            config, "model_name", "KPFCNN_mprm") == "KPFCNN_mprm"
            else "pseudo")
        self.stage_dir = stage_dir
        self.epoch = 0
        self.step = 0

        self.model = _model_for_config(config, dataset.label_values,
                                       dataset.ignored_labels)
        self.label_table = jnp.asarray(valid_label_mapper(
            dataset.label_values, dataset.ignored_labels))
        self.plan = dataset.calibration()
        # Measured banded-kernel windows (ShapePlan.bands) for the KPConv
        # blocks; the device pyramid reads its own (wider, key-range-bound)
        # search windows from the plan directly
        config.pallas_band_table = (self.plan.bands or {}).get("kpconv")
        self.class_w = (jnp.asarray(np.asarray(config.class_w, np.float32))
                        if len(config.class_w) else None)

        # Resident-cloud fused path: clouds stay on device, the host ships
        # sphere indices + augmentation params and the level-0 assembly
        # runs inside the jit (weasal_tpu/data/resident.py). "auto" = on
        # for real TPU backends (where H2D traffic is the scarce resource).
        from weasal_tpu.utils.platform import resolve_pallas_flag
        self._resident_spec = None
        if resolve_pallas_flag(
                getattr(config, "resident_clouds", "auto"),
                bool(getattr(config, "device_pyramid", False))):
            from weasal_tpu.data.resident import feature_spec
            self._resident_spec = feature_spec(
                dataset.name, config.in_features_dim)

        # Initialize variables on one example batch
        rng = np.random.default_rng(0)
        batch, _ = dataset.next_batch(rng, self.plan)
        from weasal_tpu.models.init import jit_init
        variables = jit_init(self.model, jax.random.PRNGKey(0), batch)
        params = variables["params"]
        self.tx = make_optimizer(
            config, params,
            clip_mode="norm" if self.mode == "weak" else "value")
        self.state = TrainState(
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            constants=variables.get("constants", {}),
            opt_state=self.tx.init(params))
        self.lr = config.learning_rate

        if chkp_path is not None:
            self.load_checkpoint(chkp_path, finetune=finetune)

        # Data parallelism (new capability vs the single-GPU reference,
        # SURVEY §2.3): shard the sphere axis over a 1-D mesh, replicate
        # state; XLA SPMD inserts the gradient psum over ICI.
        ndev = int(getattr(config, "data_parallel_devices", 0) or 0)
        if ndev == -1:
            ndev = len(jax.devices())
        if ndev > 1:
            from weasal_tpu.parallel.mesh import make_mesh, shard_trainer
            shard_trainer(self, make_mesh(ndev))
            print(f"Data-parallel over {ndev} devices "
                  f"({config.batch_num} spheres/step, "
                  f"{config.batch_num // ndev} per device)")
        else:
            self.mesh = None

        if config.saving:
            if config.saving_path is None:
                config.saving_path = time.strftime(
                    f"results/{stage_dir}/Log_%Y-%m-%d_%H-%M-%S",
                    time.gmtime())
            os.makedirs(config.saving_path, exist_ok=True)
            config.save()

        # Size buckets (plan.small, VERDICT r3 #4): a second train step
        # compiled at the small-sphere budgets; batches are bucket-
        # homogeneous (resident source groups them), dispatch picks the
        # step by the batch's tag. Training only — validation/eval and
        # the single-step contract (self._train_step) stay on the full
        # plan.
        self._step_cores = {}
        self.plan_small = (self.plan.derive_small()
                           if self._resident_spec is not None else None)
        self._train_step = self._build_train_step()
        self._train_steps = {"large": self._train_step}
        if self.plan_small is not None:
            self._train_steps["small"] = self._build_train_step(
                self.plan_small, tag="small")
            print("Shape-plan small bucket: level-0 cut "
                  f"{self.plan.small['cut']} pts, budgets "
                  f"{self.plan_small.num_points} vs {self.plan.num_points}")
        self._eval_step = self._build_eval_step()

    # ------------------------------------------------------------------
    # Jitted steps
    # ------------------------------------------------------------------

    def _variables(self, state: TrainState) -> Dict:
        v = {"params": state.params, "constants": state.constants}
        if state.batch_stats:
            v["batch_stats"] = state.batch_stats
        return v

    def _build_train_step(self, plan_override=None, tag: str = "large"):
        model, mode, config = self.model, self.mode, self.config
        loss_type = getattr(config, "loss_type", "region_mprm_loss")
        class_w = self.class_w
        label_table = self.label_table
        tx = self.tx
        contrast_thd = float(getattr(config, "contrast_thd", 20)) / 100.0
        num_classes = config.num_classes
        device_pyramid = bool(getattr(config, "device_pyramid", False))
        plan = plan_override or self.plan
        spec = self._resident_spec

        def step_core(state: TrainState, batch, lr, dropout_rng,
                      use_contrast: bool = False):
            if device_pyramid:
                if "flat_inds" in batch:
                    # Resident-cloud path: gather/augment/sort the spheres
                    # from the on-device clouds first
                    from weasal_tpu.data.resident import (
                        assemble_level0_device)
                    batch = assemble_level0_device(
                        batch, config, plan, augment=True, spec=spec)
                    batch.pop("unsort")
                # `batch` is a level-0 array dict; build the whole pyramid
                # on device so the step is one compiled program
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

            def loss_fn(params):
                variables = {"params": params,
                             "constants": state.constants,
                             "batch_stats": state.batch_stats}
                out, mutated = model.apply(
                    variables, batch, train=True,
                    mutable=["batch_stats", "deform", "telemetry"],
                    rngs={"dropout": dropout_rng,
                          "contrast": dropout_rng})
                # Banded-kernel out-of-band drop counts (0 on healthy
                # runs), per (edge, level) slot — KPConv.band_slot lands
                # each conv's count in its row of a [2L-1] vector so the
                # trainer can widen exactly the undersized band
                # (ops/pyramid.drop_vector_layout). Summed per epoch next
                # to plan saturation.
                n_kp = 2 * plan.num_layers - 1
                tel = jax.tree_util.tree_leaves(
                    mutated.get("telemetry", {}))
                oob = (sum(jnp.sum(t.reshape(-1, n_kp), axis=0)
                           if t.size % n_kp == 0 and t.ndim
                           else jnp.zeros((n_kp,)).at[0].add(jnp.sum(t))
                           for t in tel) if tel
                       else jnp.zeros((n_kp,), jnp.float32))
                deform_aux = mutated.get("deform", {})
                reg_loss = 0.0
                if deform_aux:
                    reg_loss = losses.p2p_fitting_regularizer(
                        deform_aux, config.repulse_extent,
                        config.deform_fitting_power)

                if mode == "weak":
                    logits, cla_logits, cam = out
                    if loss_type == "region_mprm_loss":
                        out_loss = losses.region_mprm_loss(
                            cam, batch.region_inds, batch.region_masks,
                            batch.region_point_masks, batch.region_lb,
                            class_w)
                    else:
                        out_loss = losses.class_logits_loss(
                            cla_logits, batch.cloud_lb, class_w)
                else:
                    logits = out
                    raw = batch.labels
                    targets = jnp.where(
                        raw >= 0, label_table[jnp.clip(raw, 0, None)], -1)
                    out_loss = losses.softmax_cross_entropy(
                        logits, targets, class_w)
                    if use_contrast:
                        b, n0, c = logits.shape
                        flat_logits = logits.reshape(-1, c)
                        flat_labels = jnp.where(
                            raw.reshape(-1) >= 0, raw.reshape(-1),
                            num_classes + 1)
                        flat_valid = batch.masks[0].reshape(-1)
                        out_loss = out_loss + losses.contrast_loss(
                            flat_logits, flat_labels, flat_valid,
                            dropout_rng, num_classes, contrast_thd)

                raw = batch.labels
                targets = jnp.where(
                    raw >= 0, label_table[jnp.clip(raw, 0, None)], -1)
                acc = losses.accuracy(logits, targets, batch.masks[0])
                total = out_loss + reg_loss
                new_bs = mutated.get("batch_stats", state.batch_stats)
                return total, (new_bs, out_loss, reg_loss, acc, oob)

            grads, (new_bs, out_loss, reg_loss, acc, oob) = jax.grad(
                loss_fn, has_aux=True)(state.params)
            # Dropped-neighbor telemetry, one concatenated per-edge vector
            # [(2L-1) kpconv oob ; (3L-2) search overflow] in
            # ops/pyramid.drop_vector_layout order; all-zero when healthy
            n_se = 3 * plan.num_layers - 2
            if device_pyramid and batch.search_overflow is not None:
                se = batch.search_overflow
            else:
                se = jnp.zeros((n_se,), jnp.float32)
            drops = jnp.concatenate([oob, se])
            updates, new_opt = tx.update(grads, state.opt_state,
                                         state.params)
            updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
            new_params = optax.apply_updates(state.params, updates)
            new_state = state.replace(params=new_params,
                                      batch_stats=new_bs,
                                      opt_state=new_opt)
            return new_state, out_loss, reg_loss, acc, drops

        self._step_cores[tag] = step_core
        return partial(jax.jit, static_argnames=("use_contrast",))(step_core)

    def _build_train_step_scan(self, tag: str = "large"):
        """K packed steps per dispatch: one jitted lax.scan over a stacked
        [K, ...] batch dict (VERDICT r2 #3 — through the remote tunnel each
        dispatch costs ~40-50 ms of host latency; the resident path's index
        payloads are small enough to ship K at a time and amortize it).

        Semantics match K sequential _train_step calls exactly: the rng keys
        arrive pre-split in host order, tail-padding slices carry
        do_step=False and their state update / telemetry is masked out.
        """
        step_core = self._step_cores[tag]

        @partial(jax.jit, static_argnames=("use_contrast",))
        def train_step_k(state: TrainState, packed, lr, rngs,
                         use_contrast: bool = False):
            invariant = {k: v for k, v in packed.items()
                         if k.startswith("res_")}
            xs = {k: v for k, v in packed.items()
                  if not k.startswith("res_") and k != "do_step"}

            def body(carry, sl):
                x, rng, do = sl
                new_state, out_loss, reg_loss, acc, drops = step_core(
                    carry, {**x, **invariant}, lr, rng,
                    use_contrast=use_contrast)
                new_state = jax.tree_util.tree_map(
                    lambda n, o: jnp.where(do, n, o), new_state, carry)
                return new_state, (out_loss, reg_loss, acc,
                                   jnp.where(do, drops, 0))

            final, (losses_k, regs_k, accs_k, drops_k) = jax.lax.scan(
                body, state, (xs, rngs, packed["do_step"]))
            return final, losses_k, regs_k, accs_k, drops_k

        return train_step_k

    def _build_eval_step(self):
        model, mode, config = self.model, self.mode, self.config
        plan = self.plan
        spec = self._resident_spec

        @jax.jit
        def eval_step(state: TrainState, batch):
            unsort = None
            if isinstance(batch, dict):
                if "flat_inds" in batch:
                    from weasal_tpu.data.resident import (
                        assemble_level0_device)
                    # augment=True: the reference's validation loader
                    # augments unconditionally (potential_item,
                    # Vaihingen3D_WeakLabel.py:478), so smoothed val probs
                    # average over augmentations
                    batch = assemble_level0_device(
                        batch, config, plan, augment=True, spec=spec)
                    # Device assembly voxel-sorts the sphere; outputs are
                    # gathered back to input_inds order for the host
                    unsort = batch.pop("unsort")
                labels = batch["labels"]
                # Fused path: level-0 arrays in, pyramid built in-jit
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
            else:
                labels = batch.labels
            out = model.apply(self._variables(state), batch, train=False)
            logits = out[0] if mode == "weak" else out
            probs = jax.nn.softmax(logits, axis=-1)
            if unsort is not None:
                probs = jnp.take_along_axis(probs, unsort[..., None], axis=1)
                labels = jnp.take_along_axis(labels, unsort, axis=1)
            return probs, labels

        return eval_step

    # ------------------------------------------------------------------
    # Self-tuning band windows (VERDICT r2 #10)
    # ------------------------------------------------------------------

    def _self_tune_bands(self, drops_vec, n_steps: int, dataset) -> bool:
        """Fold observed runtime drop tails back into the persisted plan.

        Calibration sizes each band window from ~40 spheres + 2 spare
        blocks; a run whose spheres spread wider (e.g. PL's 1.8x
        anisotropic scale augmentation, STATUS.md) shows a growing counted
        tail on specific edges. Instead of only warning, widen exactly the
        edges whose per-epoch drop fraction exceeds the expected
        calibration residue (1e-4 of that edge's neighbor slots) by one
        window quantum, persist the plan (so restarts and the tester pick
        it up), and retrace the jitted steps. Repeated epochs converge:
        each firing adds one quantum until the edge's tail drops under
        threshold.

        :param drops_vec: [(2L-1)+(3L-2)] per-edge epoch drop counts in
            ops/pyramid.drop_vector_layout order
        :return: True if any band was widened (steps were rebuilt)
        """
        plan = self.plan
        bands = plan.bands
        if not bands:
            return False
        from weasal_tpu.ops.pallas.common import QUANTUM
        from weasal_tpu.ops.pyramid import drop_vector_layout
        layout = drop_vector_layout(plan.num_layers)
        per_epoch = max(n_steps, 1) * max(self.config.batch_num, 1)
        widened = []
        for (kind, edge, l), count in zip(layout, drops_vec):
            if count <= 0:
                continue
            if edge == "conv":
                slots = plan.num_points[l] * plan.conv_neighbors[l]
            elif edge == "pool":
                slots = plan.num_points[l + 1] * plan.pool_neighbors[l]
            else:             # upsample gather: never a kpconv drop source
                slots = plan.num_points[l] * plan.up_neighbors
            frac = float(count) / max(slots * per_epoch, 1)
            if frac <= 1e-4:  # expected calibration tail — counted, logged
                continue
            row = bands.get(kind, {}).get(edge)
            if not row or l >= len(row):
                continue
            row[l] = int(row[l]) + QUANTUM
            widened.append((kind, edge, l, row[l], frac))
        if not widened:
            return False
        for kind, edge, l, w, frac in widened:
            print(f"[band-tune] {kind}/{edge}[{l}] tail "
                  f"{100 * frac:.4f}% of slots > 0.01% — widened to "
                  f"{w} rows (+{QUANTUM})")
        # The kpconv table is consumed by _make_kpconv at trace time
        self.config.pallas_band_table = bands.get("kpconv")
        try:
            dataset.save_plan(plan)
        except Exception as exc:   # persistence is best-effort; the
            print(f"[band-tune] plan persist skipped: {exc}")  # widened
            # in-memory plan still governs this run's retraced steps
        # Bands are trace-time constants of the jitted steps (static args
        # of _build_pyramid, closure of model.apply): rebuild so the wider
        # windows take effect. One extra compile per firing — rare, loud.
        # (The small bucket shares the same bands dict by reference, so
        # both plans see the widened rows.)
        self._train_step = self._build_train_step()
        self._train_steps = {"large": self._train_step}
        if self.plan_small is not None:
            self._train_steps["small"] = self._build_train_step(
                self.plan_small, tag="small")
        if getattr(self, "_train_step_scan", None) is not None:
            self._train_step_scan = self._build_train_step_scan()
            self._train_step_scans = {
                t: (self._train_step_scan if t == "large"
                    else self._build_train_step_scan(t))
                for t in self._train_steps}
        self._eval_step = self._build_eval_step()
        return True

    # ------------------------------------------------------------------
    # Checkpointing (same file naming as the reference)
    # ------------------------------------------------------------------

    def save_checkpoint(self, directory: str, name: str = "current_chkp.tar"):
        os.makedirs(directory, exist_ok=True)
        payload = {
            "epoch": self.epoch,
            "model_state_dict": jax.device_get(
                {"params": self.state.params,
                 "batch_stats": self.state.batch_stats,
                 "constants": self.state.constants}),
            "optimizer_state_dict": jax.device_get(self.state.opt_state),
            "saving_path": self.config.saving_path,
        }
        # Honest ".tar": a real tar archive with one pickled member, written
        # atomically (tmp + rename) so a crash mid-dump never corrupts
        # current_chkp.tar
        import io
        import tarfile
        target = join(directory, name)
        tmp = target + ".tmp"
        blob = pickle.dumps(payload)
        with tarfile.open(tmp, "w") as tar:
            info = tarfile.TarInfo("state.pkl")
            info.size = len(blob)
            tar.addfile(info, io.BytesIO(blob))
        os.replace(tmp, target)

    def load_checkpoint(self, path: str, finetune: bool = False):
        payload = load_checkpoint_file(path)
        model_state = payload["model_state_dict"]
        self.state = self.state.replace(
            params=model_state["params"],
            batch_stats=model_state["batch_stats"],
            constants=model_state["constants"])
        if not finetune:
            opt_state = payload.get("optimizer_state_dict")
            if opt_state is not None:
                self.state = self.state.replace(opt_state=opt_state)
            else:
                print("Checkpoint has no optimizer state (reference torch "
                      "file): momentum restarts from zero.")
            self.epoch = payload["epoch"]
        print("Model restored" + (" for finetuning." if finetune
                                  else " with training state."))

    # ------------------------------------------------------------------
    # Main loop
    # ------------------------------------------------------------------

    def train(self, train_dataset, val_dataset=None, al_iteration: int = 0):
        config = self.config
        self.al_iteration = al_iteration
        rng = np.random.default_rng(42 + al_iteration)
        dropout_key = jax.random.PRNGKey(al_iteration)

        if config.saving:
            log_file = join(config.saving_path,
                            f"training_iteration{al_iteration}.txt")
            with open(log_file, "w") as f:
                header = self._log_header(train_dataset, al_iteration)
                f.write(header)
            pid_file = join(config.saving_path, "running_PID.txt")
            if not exists(pid_file):
                with open(pid_file, "w") as f:
                    f.write("Launched\n")
            chkp_dir = join(config.saving_path, "checkpoints")
            os.makedirs(chkp_dir, exist_ok=True)
        else:
            log_file = pid_file = chkp_dir = None

        # Per-epoch decayed LR, resuming mid-schedule like the reference
        lr = config.learning_rate
        for e in range(self.epoch):
            if e in config.lr_decays:
                lr *= config.lr_decays[e]
        self.lr = lr

        # Host input pipeline: thread-pool pyramid builds + prefetch ahead
        # of the device (replaces the reference's DataLoader workers)
        from weasal_tpu.data.loader import (
            BatchPrefetcher, ParallelSphereBuilder)
        threads = max(int(getattr(config, "input_threads", 1) or 1), 1)
        extra_arrays = None
        if getattr(config, "device_pyramid", False):
            if self._resident_spec is not None:
                # Clouds live on device; the host ships indices + params
                from weasal_tpu.data.resident import ResidentBatchSource
                batch_source = ResidentBatchSource(
                    train_dataset, self.plan, mesh=self.mesh,
                    bucketed=self.plan_small is not None)
                extra_arrays = batch_source.resident.arrays
            else:
                # Fused path: the host only pads level-0 arrays; the
                # pyramid is built inside the jitted step
                from weasal_tpu.data.level0 import Level0BatchSource
                batch_source = Level0BatchSource(train_dataset, self.plan)
        elif threads > 1:
            batch_source = ParallelSphereBuilder(
                train_dataset, max_workers=min(threads, 8))
        else:
            batch_source = train_dataset

        sharding = None
        if self.mesh is not None:
            from weasal_tpu.parallel.mesh import batch_sharding
            sharding = batch_sharding(self.mesh)

        # Multi-step dispatch (VERDICT r2 #3): ship K index batches at once
        # and lax.scan K optimizer steps inside ONE jitted call, amortizing
        # the per-dispatch tunnel latency (~40-50 ms) and the log-flush
        # round trips over K steps. Only worth it on the resident path,
        # where a step's payload is ~0.3 MB of indices.
        K = self._resolve_steps_per_dispatch()
        keep_fn = None
        if K > 1:
            self._train_step_scan = getattr(
                self, "_train_step_scan", None) or \
                self._build_train_step_scan()
            scans = getattr(self, "_train_step_scans", None) or {
                "large": self._train_step_scan}
            for t in self._train_steps:
                if t not in scans:
                    scans[t] = self._build_train_step_scan(t)
            self._train_step_scans = scans
            if self.mesh is not None:
                from weasal_tpu.parallel.mesh import packed_batch_sharding
                sharding = packed_batch_sharding(self.mesh)
            if self.mode == "weak":
                def keep_fn(metas):
                    # No sub-region labels -> no loss signal: drop before
                    # packing, same semantics as the unpacked `continue`
                    # (reference trainer_WeakLabel.py:183-184)
                    if metas and all("has_regions" in m for m in metas):
                        return any(m["has_regions"] for m in metas)
                    return True

        # Liveness: the tunnel can drop an in-flight RPC and wedge the
        # process in a fetch forever; the watchdog turns that into a
        # restartable exit-86 (resume from current_chkp.tar).
        from weasal_tpu.utils.watchdog import StallWatchdog
        self._watchdog = StallWatchdog.from_config(
            config, label=f"train[{self.mode}]")

        # Opt-in loop diagnostics (no cost when unset):
        #   WEASAL_LOOP_STATS=1  — per-epoch wall breakdown of the dispatch
        #     loop (batch wait / rng / dispatch / log-flush), the tool for
        #     attributing end-to-end step time beyond device time;
        #   WEASAL_TRACE_DIR=dir — jax.profiler trace of a mid-epoch-0
        #     window (steps ~20-80), parsed by weasal_tpu/utils/profiling.
        loop_stats = None
        if os.environ.get("WEASAL_LOOP_STATS"):
            loop_stats = {"wait_batch": 0.0, "rng": 0.0, "dispatch": 0.0,
                          "flush": 0.0}
        # Per-epoch dispatch counts by bucket tag — always on (cheap),
        # printed with the saturation telemetry when buckets are active so
        # the routing fraction is measured, not assumed.
        bucket_counts = {}
        trace_dir = os.environ.get("WEASAL_TRACE_DIR")
        trace_state = "off" if trace_dir else "done"

        try:
            t0 = time.time()
            last_display = time.time()
            pending = []
            pending_steps = 0
            drops_pending = []
            while self.epoch < config.max_epoch:
                self.step = 0
                epoch_real_steps = 0
                prefetcher = BatchPrefetcher(batch_source, self.plan,
                                             config.epoch_steps, rng=rng,
                                             sharding=sharding,
                                             extra_arrays=extra_arrays,
                                             pack=K, keep_fn=keep_fn)
                epoch_t0 = time.perf_counter()
                batch_iter = iter(prefetcher)
                while True:
                    _tw = time.perf_counter()
                    try:
                        batch, metas = next(batch_iter)
                    except StopIteration:
                        break
                    if loop_stats is not None:
                        loop_stats["wait_batch"] += time.perf_counter() - _tw
                    if config.saving and pid_file and not exists(pid_file):
                        prefetcher.close()
                        break
                    if K == 1 and self.mode == "weak":
                        # No sub-region labels -> no loss signal (reference
                        # trainer_WeakLabel.py:183-184). Check host metas —
                        # np.asarray(batch.region_masks) would be a D2H fetch
                        # of a device array, a full tunnel round-trip (~50 ms)
                        # serializing the dispatch queue EVERY step.
                        if metas and all("has_regions" in m for m in metas):
                            if not any(m["has_regions"] for m in metas):
                                # Host sampling is progress too: a streak
                                # of label-less batches (sparse early-AL
                                # anchors) must not read as a stall
                                self._watchdog.beat()
                                continue
                        else:                      # custom source fallback
                            region_masks = (batch["region_masks"]
                                            if isinstance(batch, dict)
                                            else batch.region_masks)
                            if not np.any(np.asarray(region_masks)):
                                continue
                    use_contrast = (self.mode == "pseudo"
                                    and self.epoch >= getattr(
                                        config, "contrast_start", 1 << 30))
                    _tr = time.perf_counter()
                    if K == 1:
                        dropout_key, sub = jax.random.split(dropout_key)
                        if loop_stats is not None:
                            loop_stats["rng"] += time.perf_counter() - _tr
                            _tr = time.perf_counter()
                        tag = (metas[0].get("bucket", "large")
                               if metas else "large")
                        bucket_counts[tag] = bucket_counts.get(tag, 0) + 1
                        step_fn = self._train_steps.get(
                            tag, self._train_step)
                        (self.state, out_loss, reg_loss, acc,
                         drops) = step_fn(
                            self.state, batch, jnp.float32(self.lr), sub,
                            use_contrast=use_contrast)
                        n_real = 1
                    else:
                        # metas is a list of per-step metas lists here; rng
                        # keys split in host order so the dropout stream is
                        # bit-identical to K sequential steps
                        n_real = len(metas)
                        subs = []
                        for _ in range(n_real):
                            dropout_key, sub = jax.random.split(dropout_key)
                            subs.append(sub)
                        subs += [subs[-1]] * (K - n_real)
                        subs = jnp.stack(subs)
                        if loop_stats is not None:
                            loop_stats["rng"] += time.perf_counter() - _tr
                            _tr = time.perf_counter()
                        tag = (metas[0][0].get("bucket", "large")
                               if metas and metas[0] else "large")
                        bucket_counts[tag] = (bucket_counts.get(tag, 0)
                                              + n_real)
                        scan_fn = self._train_step_scans.get(
                            tag, self._train_step_scan)
                        (self.state, out_loss, reg_loss, acc,
                         drops) = scan_fn(
                            self.state, batch, jnp.float32(self.lr),
                            subs, use_contrast=use_contrast)
                    if loop_stats is not None:
                        loop_stats["dispatch"] += time.perf_counter() - _tr
                    drops_pending.append(drops)
                    epoch_real_steps += n_real

                    # Buffer device scalars; synchronous per-step reads would
                    # serialize the async dispatch queue (very costly through a
                    # remote-dispatch backend)
                    pending.append((self.epoch, self.step, out_loss, reg_loss,
                                    acc, time.time() - t0, n_real))
                    pending_steps += n_real
                    self.step += n_real
                    if pending_steps >= 20 or \
                            time.time() - last_display > 2.0:
                        last_display = time.time()
                        _tf = time.perf_counter()
                        self._flush_log(pending, log_file, al_iteration)
                        if loop_stats is not None:
                            loop_stats["flush"] += time.perf_counter() - _tf
                        pending = []
                        pending_steps = 0
                        self._watchdog.beat()   # a flush returned = progress
                        # Profiler window over steady-state steps; opened/
                        # closed right after a flush, when the dispatch
                        # queue is quiesced (all traced executions complete)
                        if trace_state == "off" and self.epoch == 0 \
                                and self.step >= 20:
                            jax.profiler.start_trace(trace_dir)
                            trace_state = "on"
                            trace_t0 = (self.step, time.perf_counter())
                        elif trace_state == "on" and \
                                self.step >= trace_t0[0] + 60:
                            jax.profiler.stop_trace()
                            trace_state = "done"
                            dt = time.perf_counter() - trace_t0[1]
                            n = self.step - trace_t0[0]
                            print(f"[trace] {n} steps in {dt:.2f}s wall "
                                  f"({1e3 * dt / n:.1f} ms/step) -> "
                                  f"{trace_dir}")

                self._flush_log(pending, log_file, al_iteration)
                pending = []
                pending_steps = 0

                if trace_state == "on":
                    # Epoch ended inside the window (epoch_steps < start+60;
                    # self.step resets per epoch so the in-loop stop above
                    # would never fire) — close here so the trace stays a
                    # bounded window instead of spanning the whole run.
                    jax.profiler.stop_trace()
                    trace_state = "done"
                    dt = time.perf_counter() - trace_t0[1]
                    n = max(self.step - trace_t0[0], 1)
                    print(f"[trace] {n} steps (to epoch end) in {dt:.2f}s "
                          f"wall ({1e3 * dt / n:.1f} ms/step) -> {trace_dir}")

                if loop_stats is not None:
                    tot = time.perf_counter() - epoch_t0
                    acc_t = sum(loop_stats.values())
                    parts = " ".join(f"{k}={v:.2f}s"
                                     for k, v in loop_stats.items())
                    n = max(epoch_real_steps, 1)
                    print(f"[loop-stats] epoch {self.epoch}: {tot:.2f}s "
                          f"/ {n} steps = {1e3 * tot / n:.1f} ms/step | "
                          f"{parts} other={tot - acc_t:.2f}s")
                    loop_stats = dict.fromkeys(loop_stats, 0.0)
                if self.plan_small is not None and bucket_counts:
                    print(f"[buckets] epoch {self.epoch} dispatches: "
                          + " ".join(f"{t}={c}" for t, c in
                                     sorted(bucket_counts.items())))
                bucket_counts = {}

                if config.saving and pid_file and not exists(pid_file):
                    break

                if self.epoch in config.lr_decays:
                    self.lr *= config.lr_decays[self.epoch]
                self.epoch += 1

                # Shape-plan saturation audit: silent caps (level/neighbor/
                # region truncation) become visible in the training log
                n_drop_steps = max(epoch_real_steps, len(drops_pending))
                n_slots = 5 * self.plan.num_layers - 3
                drops_vec = np.zeros(n_slots)
                for d in drops_pending:   # [n_slots] or [K, n_slots]
                    drops_vec += np.asarray(d).reshape(
                        -1, n_slots).sum(axis=0)
                drops_pending = []
                epoch_drops = float(drops_vec.sum())
                if epoch_drops > 0:
                    # Scale by the epoch's neighbor-slot count: calibration
                    # sizes band windows from ~40 spheres + 2 spare blocks, so
                    # a sub-1e-3 runtime tail is expected behavior (for scale:
                    # the reference's own neighborhood calibration truncates
                    # ~10% of neighborhoods by design, common.py:336-346) —
                    # only a larger fraction indicates a sizing/sort bug.
                    plan = self.plan
                    slots = sum(plan.num_points[l] * plan.conv_neighbors[l]
                                for l in range(plan.num_layers))
                    slots += sum(plan.num_points[l + 1] * plan.pool_neighbors[l]
                                 for l in range(plan.num_layers - 1))
                    slots *= max(n_drop_steps, 1) * max(config.batch_num, 1)
                    frac = epoch_drops / max(slots, 1)
                    if frac > 1e-3:
                        print(f"[pallas-telemetry] {int(epoch_drops)} neighbors "
                              f"({100 * frac:.3f}% of slots) dropped "
                              "out-of-band this epoch — spatial sort or band "
                              "sizing violated; rerun calibration("
                              "force_redo=True) or widen ShapePlan.bands")
                    else:
                        print(f"[pallas-telemetry] band-window tail: "
                              f"{int(epoch_drops)} neighbor drops this epoch "
                              f"({100 * frac:.5f}% of slots — counted, "
                              "within calibration's expected tail)")
                    # Self-tuning bands: when one edge's tail exceeds the
                    # expected calibration residue, widen that edge's
                    # persisted window and retrace — no manual recalibration
                    self._self_tune_bands(drops_vec, n_drop_steps,
                                          train_dataset)
                try:
                    from weasal_tpu.data.telemetry import (
                        audit_plan_saturation, format_saturation_line)
                    report = audit_plan_saturation(
                        train_dataset, self.plan,
                        rng=np.random.default_rng(1000 + self.epoch))
                    for warning in report["warnings"]:
                        print(f"[plan-saturation] {warning}")
                    if config.saving:
                        line = format_saturation_line(self.epoch, report)
                        line = (line.rstrip("\n")
                                + f" kernel_drops {int(epoch_drops)}\n")
                        with open(join(config.saving_path,
                                       "plan_saturation.txt"), "a") as f:
                            f.write(line)
                except Exception as exc:  # audit must never kill training
                    print(f"[plan-saturation] audit skipped: {exc}")

                if config.saving:
                    self.save_checkpoint(chkp_dir)
                    if (self.epoch + 1) % config.checkpoint_gap == 0:
                        self.save_checkpoint(
                            chkp_dir,
                            f"chkp_{self.epoch + 1:04d}_{al_iteration}.tar")
                self._watchdog.beat()

                if val_dataset is not None:
                    self.cloud_segmentation_validation(val_dataset)
                    self._watchdog.beat()

                # Cooperative kill file removed once training completes
                # (the reference clears it on its final epoch,
                # utils/trainer_WeakLabel.py:170-172)
                if self.epoch >= config.max_epoch and pid_file and \
                        exists(pid_file):
                    os.remove(pid_file)

            if config.saving and not exists(join(chkp_dir, "current_chkp.tar")):
                # Resumed at/after max_epoch: no epoch ran in this run dir, but
                # downstream stages (AL voting, PL init) restore from it
                self.save_checkpoint(chkp_dir)
            if pid_file and exists(pid_file) and self.epoch >= config.max_epoch:
                os.remove(pid_file)

            if getattr(self, "_val_acc", None) is not None:
                # Keep the host-visible smoothed validation buffer current
                # even when no checkpoint-gap dump ran (callers read it)
                self.validation_probs = self._val_acc.materialize()

        finally:
            # Disarm even on exceptions: an orphaned armed
            # watchdog would os._exit(86) unrelated later work
            # and mask the real failure's exit code.
            self._watchdog.stop()
            if trace_state == "on":   # epoch ended inside the trace window
                jax.profiler.stop_trace()
        print("Finished Training")

    def _log_header(self, train_dataset, al_iteration) -> str:
        cfg = self.config
        if self.mode == "weak" and hasattr(train_dataset, "anchors"):
            n_files = len(train_dataset.cloud_names_split)
            init = (getattr(cfg, "initial_labels_per_file", 0) * n_files
                    + al_iteration * getattr(cfg, "added_labels_per_epoch", 0)
                    * n_files)
            over = int(np.sum([len(a) for a in train_dataset.anchors]))
            return ("epochs steps out_loss offset_loss train_accuracy time "
                    f"\tweak labels (initial): {over} ({init})\n")
        gt_count = 0
        if self.mode == "pseudo":
            for cloud_name in train_dataset.cloud_names_split:
                gt_file = join(train_dataset.tree_path,
                               cloud_name + "_al_groundTruth_IDs.pkl")
                if exists(gt_file):
                    with open(gt_file, "rb") as f:
                        gt_count += len(pickle.load(f))
        return ("epochs steps out_loss offset_loss train_accuracy time "
                f"\tground truth labels: {gt_count}\n")

    def _resolve_steps_per_dispatch(self) -> int:
        """Config knob `steps_per_dispatch`: int, or "auto" = 10 when the
        resident fused path runs on a real TPU backend (the remote-dispatch
        case where per-call latency dominates); 1 otherwise. Packing needs
        dict batches, so non-device-pyramid sources always run unpacked."""
        val = getattr(self.config, "steps_per_dispatch", "auto")
        if isinstance(val, str):
            if jax.default_backend() == "tpu" and \
                    self._resident_spec is not None:
                k = 10
            else:
                return 1
        else:
            k = max(int(val), 1)
        if k > 1 and not getattr(self.config, "device_pyramid", False):
            print("steps_per_dispatch > 1 requires the fused device-pyramid "
                  "path; running unpacked")
            return 1
        return k

    def _flush_log(self, pending, log_file, al_iteration):
        """Materialize buffered device scalars in one transfer and log.
        Entries carry 0-d scalars (unpacked) or [K] vectors with n_real
        valid leading rows (packed multi-step dispatch)."""
        if not pending:
            return
        scalars = jax.device_get([(p[2], p[3], p[4]) for p in pending])
        rows = []
        for (epoch, step, _, _, _, wall, n), (ls, rg, ac) in zip(
                pending, scalars):
            ls, rg, ac = (np.atleast_1d(ls), np.atleast_1d(rg),
                          np.atleast_1d(ac))
            for i in range(n):
                rows.append((epoch, step + i, float(ls[i]), float(rg[i]),
                             float(ac[i]), wall))
        if self.config.saving and log_file:
            with open(log_file, "a") as f:
                for epoch, step, ls, rg, ac, wall in rows:
                    f.write(f"{epoch:d} {step:d} {ls:.3f} "
                            f"{rg:.3f} {ac:.3f} "
                            f"{wall:.3f}\n")
        epoch, step, ls, rg, ac, _ = rows[-1]
        print(f"e{epoch:03d}-i{step:04d} => L={ls:.3f} "
              f"acc={100 * ac:3.0f}% "
              f"| al_iteration={al_iteration}")

    # ------------------------------------------------------------------
    # Validation (reference cloud_segmentation_validation,
    # utils/trainer_WeakLabel.py:312-566)
    # ------------------------------------------------------------------

    def cloud_segmentation_validation(self, val_dataset, debug=False):
        config = self.config
        val_smooth = 0.95
        nc_model = config.num_classes
        rng = np.random.default_rng(7 + self.epoch)

        if not hasattr(self, "validation_probs") or \
                len(self.validation_probs) != val_dataset.num_clouds:
            self.validation_probs = [
                np.zeros((l.shape[0], nc_model))
                for l in val_dataset.input_labels]
            self.val_proportions = np.zeros(nc_model, np.float32)
            i = 0
            for label_value in val_dataset.label_values:
                if label_value not in val_dataset.ignored_labels:
                    self.val_proportions[i] = np.sum(
                        [np.sum(lbl == label_value)
                         for lbl in val_dataset.validation_labels])
                    i += 1

        predictions, targets = [], []
        from weasal_tpu.data.loader import BatchPrefetcher
        val_extra = None
        val_acc = None
        if getattr(config, "device_pyramid", False):
            if self._resident_spec is not None:
                from weasal_tpu.data.resident import ResidentBatchSource
                from weasal_tpu.train.vote import DeviceVoteAccumulator
                if not hasattr(self, "_val_resident_source") or \
                        self._val_resident_source.dataset is not val_dataset:
                    self._val_resident_source = ResidentBatchSource(
                        val_dataset, self.plan, mesh=self.mesh)
                    # Smoothed full-cloud validation probs stay on device
                    # (fetched only for the periodic confusion dumps);
                    # seed from any existing host state so the smoothing
                    # history carries over
                    self._val_acc = DeviceVoteAccumulator(
                        self._val_resident_source.resident, nc_model,
                        smooth=val_smooth)
                    self._val_acc.load(self.validation_probs)
                val_source = self._val_resident_source
                val_extra = val_source.resident.arrays
                val_acc = self._val_acc
            else:
                from weasal_tpu.data.level0 import Level0BatchSource
                val_source = Level0BatchSource(val_dataset, self.plan)
        else:
            val_source = val_dataset
        val_sharding = None
        if getattr(self, "mesh", None) is not None:
            from weasal_tpu.parallel.mesh import batch_sharding
            val_sharding = batch_sharding(self.mesh)
        prefetcher = BatchPrefetcher(val_source, self.plan,
                                     config.validation_size, rng=rng,
                                     augment=True, sharding=val_sharding,
                                     extra_arrays=val_extra)
        # Model-class index -> position in label_values (the reference
        # inserts zero columns for ignored labels before the argmax,
        # architectures.py; this index map is the same thing)
        label_values = val_dataset.label_values
        nonign = np.array([li for li, lv in enumerate(label_values)
                           if lv not in val_dataset.ignored_labels])

        if val_acc is not None:
            # Smoothing runs on device; buffer the per-batch argmax/targets
            # on device and fetch them ALL in one device_get at the end —
            # a per-batch np.asarray is a full tunnel round-trip (~50 ms)
            # that serializes the dispatch queue.
            buffered, metas_all = [], []
            for batch, metas in prefetcher:
                probs_dev, labels_dev = self._eval_step(self.state, batch)
                val_acc.update(probs_dev, batch)
                buffered.append((jnp.argmax(probs_dev, axis=-1), labels_dev))
                metas_all.append(metas)
                if len(buffered) % 20 == 0:
                    # Tiny dependent fetch: keep the tunnel's un-synced
                    # device_put backlog short (DeviceVoteAccumulator.sync
                    # documents the measured pathology) so the one big
                    # device_get below doesn't pay a whole epoch's drain.
                    val_acc.sync()
            for (preds_all, labels_all), metas in zip(
                    jax.device_get(buffered), metas_all):
                for b, meta in enumerate(metas):
                    n = meta["n_real"]
                    predictions.append(preds_all[b, :n])
                    targets.append(labels_all[b, :n])
        else:
            for batch, metas in prefetcher:
                probs_dev, labels_dev = self._eval_step(self.state, batch)
                probs_all = np.asarray(probs_dev)
                preds_all = np.argmax(probs_all, axis=-1)
                labels_all = np.asarray(labels_dev)
                for b, meta in enumerate(metas):
                    n = meta["n_real"]
                    inds = meta["input_inds"][:n]
                    c_i = meta["cloud_ind"]
                    self.validation_probs[c_i][inds] = \
                        val_smooth * self.validation_probs[c_i][inds] \
                        + (1 - val_smooth) * probs_all[b, :n]
                    predictions.append(preds_all[b, :n])
                    targets.append(labels_all[b, :n])

        # Sub-part confusions with proportion rebalance
        Confs = []
        for pred_cls, truth in zip(predictions, targets):
            preds = label_values[nonign[pred_cls]]
            truth_vals = label_values[np.clip(truth, 0, None)]
            Confs.append(fast_confusion(truth_vals, preds, label_values))
        C = np.sum(np.stack(Confs), axis=0).astype(np.float32)
        for l_ind, label_value in reversed(list(enumerate(label_values))):
            if label_value in val_dataset.ignored_labels:
                C = np.delete(C, l_ind, axis=0)
                C = np.delete(C, l_ind, axis=1)
        C *= np.expand_dims(
            self.val_proportions / (np.sum(C, axis=1) + 1e-6), 1)
        IoUs = IoU_from_confusions(C)
        mIoU = 100 * float(np.mean(IoUs))
        print(f"{config.dataset} mean IoU = {mIoU:.1f}%")

        if config.saving:
            line = " ".join(f"{IoU:.3f}" for IoU in IoUs) + " \n"
            val_file = join(config.saving_path, "val_IoUs.txt")
            with open(val_file, "a" if exists(val_file) else "w") as f:
                f.write(line)

            if val_dataset.use_potentials:
                pot_path = join(config.saving_path, "potentials")
                os.makedirs(pot_path, exist_ok=True)
                for i, file_path in enumerate(val_dataset.files):
                    pot_points = np.asarray(val_dataset.pot_trees[i].data)
                    cloud_name = file_path.split("/")[-1]
                    pots = val_dataset.potentials[i].astype(np.float32)
                    write_ply(join(pot_path, cloud_name),
                              [pot_points.astype(np.float32), pots],
                              ["x", "y", "z", "pots"])

            if (self.epoch + 1) % config.checkpoint_gap == 0:
                if val_acc is not None:
                    self.validation_probs = val_acc.materialize()
                self._save_val_confusions(val_dataset)
        return mIoU

    def _save_val_confusions(self, val_dataset):
        config = self.config
        val_path = join(config.saving_path,
                        f"val_preds_{self.al_iteration}_{self.epoch + 1}")
        os.makedirs(val_path, exist_ok=True)
        label_values = val_dataset.label_values
        n_tot = len(label_values)
        Confs = np.zeros((n_tot, n_tot), np.int32)
        for i, file_path in enumerate(val_dataset.files):
            sub_probs = self.validation_probs[i]
            for l_ind, label_value in enumerate(label_values):
                if label_value in val_dataset.ignored_labels:
                    sub_probs = np.insert(sub_probs, l_ind, 0, axis=1)
            sub_preds = label_values[np.argmax(sub_probs, axis=1)]
            preds = sub_preds[val_dataset.test_proj[i]].astype(np.int32)
            labels = val_dataset.validation_labels[i].astype(np.int32)
            Confs += fast_confusion(labels, preds, label_values).astype(
                np.int32)
        np.savetxt(join(val_path, "conf.txt"), Confs, fmt="%i")
        names = {k: v for k, v in val_dataset.label_to_names.items()
                 if k not in val_dataset.ignored_labels}
        conf_matrix.plot(
            Confs[:len(names), :len(names)], names, val_path,
            file_suffix=f"{val_dataset.name}_{val_dataset.split}",
            abs_vals=False, F1=True, iou=True, show=False)
