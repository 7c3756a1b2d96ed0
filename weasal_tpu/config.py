"""Configuration system with `parameters.txt` round-trip.

The text file is the interface between pipeline stages: test and refinement
stages reconfigure themselves from the training log directory, exactly like
the reference (utils/config.py:235-446, test_models.py:143-145). Key names
and formatting in `parameters.txt` match the reference so logs remain
interoperable with its analysis tooling.

On top of the reference's knobs this config adds the TPU shape plan
(`shape_plan`-related fields live with the calibration code, see
weasal_tpu/data/batching.py) and device/mesh options.
"""

from __future__ import annotations

import os
from os.path import join
from typing import Dict, List, Optional



class bcolors:
    HEADER = "\033[95m"
    OKBLUE = "\033[94m"
    OKGREEN = "\033[92m"
    WARNING = "\033[93m"
    FAIL = "\033[91m"
    ENDC = "\033[0m"
    BOLD = "\033[1m"
    UNDERLINE = "\033[4m"


class Config:
    """Parameter bag for a training/testing session.

    Subclass per dataset and override attributes (reference pattern:
    train_Vaihingen3D_WeakLabel.py:46-189). Derived fields (`num_layers`,
    `deform_layers`) are recomputed in __init__ from the architecture DSL.
    """

    # ------------------------------------------------------------------
    # Input parameters
    # ------------------------------------------------------------------
    dataset = ""
    dataset_task = ""
    num_classes = 0
    in_points_dim = 3
    in_features_dim = 1
    in_radius = 1.0
    input_threads = 8
    # Fused input path: build the multi-scale pyramid on device inside the
    # jitted train/eval step (weasal_tpu/ops/pyramid.py); the host ships
    # only padded level-0 arrays. Off by default for drop-in parity with
    # the reference's host-built pipeline.
    device_pyramid = False

    # ------------------------------------------------------------------
    # Model parameters
    # ------------------------------------------------------------------
    architecture: List[str] = []
    equivar_mode = ""
    invar_mode = ""
    first_features_dim = 64
    use_batch_norm = True
    batch_norm_momentum = 0.99
    segmentation_ratio = 1.0

    # ------------------------------------------------------------------
    # KPConv parameters
    # ------------------------------------------------------------------
    num_kernel_points = 15
    first_subsampling_dl = 0.02
    conv_radius = 2.5
    deform_radius = 5.0
    KP_extent = 1.0
    KP_influence = "linear"          # 'constant' | 'linear' | 'gaussian'
    aggregation_mode = "sum"         # 'closest' | 'sum'
    fixed_kernel_points = "center"   # 'none' | 'center' | 'verticals'
    modulated = False
    n_frames = 1
    max_in_points = 0
    val_radius = 51.0
    max_val_points = 50000

    # ------------------------------------------------------------------
    # Training parameters
    # ------------------------------------------------------------------
    learning_rate = 1e-3
    momentum = 0.9
    lr_decays: Dict[int, float] = {200: 0.2, 300: 0.2}
    grad_clip_norm = 100.0

    augment_scale_anisotropic = True
    augment_scale_min = 0.9
    augment_scale_max = 1.1
    augment_symmetries = [False, False, False]
    augment_rotation = "vertical"
    augment_noise = 0.005
    augment_color = 0.7
    augment_occlusion = "none"
    augment_occlusion_ratio = 0.2
    augment_occlusion_num = 1

    weight_decay = 1e-3
    segloss_balance = "none"
    class_w: List[float] = []

    deform_fitting_mode = "point2point"
    deform_fitting_power = 1.0
    deform_lr_factor = 0.1
    repulse_extent = 1.0

    batch_num = 10
    val_batch_num = 10
    max_epoch = 1000
    epoch_steps = 1000
    validation_size = 100
    checkpoint_gap = 50

    saving = True
    saving_path: Optional[str] = None

    # ------------------------------------------------------------------
    # TPU-specific parameters (not in the reference)
    # ------------------------------------------------------------------
    # Active-learning acquisition policy (train/tester.py ledgers):
    # "entropy" = the reference's entropy x class-rarity ranking
    # (tester_WeakLabel.py:403-474); "random" = uniformly random unused
    # anchors/points at the SAME label budget — the control arm for
    # measuring AL efficacy (scripts/run_al_ablation.sh).
    al_acquisition = "entropy"
    # Precision of matmul accumulation in the KPConv path
    compute_dtype = "float32"        # 'float32' | 'bfloat16'
    # Number of data-parallel devices to shard spheres over (0 = all)
    data_parallel_devices = 0
    # Gatherless banded Pallas KPConv kernel (ops/pallas/kpconv_banded.py)
    # for all rigid sum-aggregation convs. "auto" = on when the backend is
    # a real TPU (measured 2-2.8x over the XLA gather path at reference
    # shapes); True/False force it.
    use_pallas_kpconv = "auto"
    # Banded Pallas radius search inside the device pyramid (replaces the
    # XLA top_k/sort path — was 80% of the fused step). Same "auto" rule.
    use_pallas_search = "auto"
    pallas_band = 0                  # band half-window W rows (0 = auto,
                                     # sized per level from the plan)
    # Exact per-(kernel-point, block) compute skip inside the banded
    # KPConv kernel (XLA-precomputed block ranges branched on SMEM).
    # Default OFF: measured on hardware at Vaihingen bench shapes
    # (scripts/ab_pblk_skip.py, round 5) the skip path REGRESSES the
    # fused step 45.66 -> 72.33 ms (conv stage 30.0 -> 52.8 ms) — the
    # per-kernel-point branch overhead dwarfs the ~35% skippable work,
    # consistent with round 3's reverted in-kernel variant. Kept as an
    # opt-in for geometries with genuinely sparse kernel-point coverage.
    pallas_pblk_skip = False
    # Device-resident clouds for the fused path: upload each split's
    # clouds once, ship per-sphere indices + augmentation params, and
    # gather/augment/sort in-jit (weasal_tpu/data/resident.py). ~8x less
    # H2D traffic per step and far less host work. "auto" = on when the
    # backend is a real TPU and device_pyramid is set.
    resident_clouds = "auto"
    # Multi-step dispatch: pack this many train steps' index batches into
    # one jitted lax.scan call (weasal_tpu/train/trainer.py). Amortizes the
    # per-dispatch latency of a remote-TPU backend over K steps; only the
    # resident fused path ships payloads small enough for this to win.
    # "auto" = 10 on a real TPU backend with resident clouds, 1 otherwise.
    steps_per_dispatch = "auto"
    # Shape-plan LEVEL-0 sizing percentile (data/batching.py:
    # calibrate_shape_plan; applies to level 0 only — upper levels are
    # always sized at p100, because the sampler thinning that legalizes an
    # undersized budget crops only level 0, and random point thinning
    # barely shrinks the occupied-voxel counts that set upper-level
    # sizes). 100 = pad every batch to the largest calibration sphere —
    # simple, but real tiles have long-tailed sphere sizes, so average
    # batches run ~50% shadow rows and every kernel pays for them. A lower
    # percentile (e.g. 80) sizes level 0 near the bulk of the distribution
    # and lets the existing sampler thinning (datasets.sample_sphere
    # max_points) randomly crop the oversized tail — each visit re-draws
    # the crop, so coverage evens out across epochs.
    # Measured on the multi-district quality tile: p80 cuts the fused
    # device step 121.8 -> 71.4 ms (1.7x) with ~1/4 of spheres thinned;
    # a 3-epoch val-mIoU probe trailed the p100 run (25.7% vs 34.8% at
    # epoch 1), so treat <100 as a throughput knob whose quality cost
    # must be checked per dataset. The reference has no equivalent (its
    # batch_limit PID packs variable sphere counts instead, SURVEY §7.1);
    # 100 keeps that round-2 behavior and stays the default.
    plan_point_percentile = 100.0
    # Small-sphere plan bucket (data/batching.py calibrate_shape_plan,
    # VERDICT r3 #4). 0 = off. E.g. 80: calibration additionally sizes a
    # second, smaller set of per-level point budgets over the spheres at
    # or below the 80th level-0-size percentile; TRAINING batches made
    # entirely of such spheres run through a step compiled at those
    # budgets (trainer dispatches per batch; neighbor widths, region
    # budget and measured bands are shared). Unlike plan_point_percentile
    # this crops NOTHING — large spheres keep the full-size program — so
    # the val-mIoU trajectory is unchanged by construction while the mean
    # step cost drops toward the bucket-weighted mean of the two program
    # sizes. Validation/voting always use the full-size plan.
    plan_bucket_percentile = 0.0
    # Stall watchdog (weasal_tpu/utils/watchdog.py): hard-exit with code
    # 86 when a training/voting loop makes no progress for this many
    # seconds, so a wrapper can resume from the per-epoch checkpoint. The
    # remote-TPU tunnel can drop an in-flight RPC and wedge the process
    # forever (observed in a 150-epoch run). Active on TPU backends only;
    # <= 0 disables.
    stall_watchdog_s = 900

    # Keys that Config.save() writes under "# Other parameters" only when set
    _OPTIONAL_KEYS = (
        "sub_radius", "model_name", "loss_type", "contrast_start",
        "contrast_thd", "anchor_method", "active_learning_iterations",
        "subsample_labels", "initial_labels_per_file", "subsample_method",
        "added_labels_per_epoch", "weak_label_log", "dropout",
    )

    def __init__(self):
        self.num_layers = len(
            [b for b in self.architecture if "pool" in b or "strided" in b]) + 1

        # Per-layer flags: does any block of this layer deform its kernel
        layer_blocks: List[str] = []
        self.deform_layers: List[bool] = []
        for block in self.architecture:
            if not ("pool" in block or "strided" in block
                    or "global" in block or "upsample" in block):
                layer_blocks.append(block)
                continue
            deform_layer = bool(layer_blocks) and any(
                "deformable" in b for b in layer_blocks)
            if ("pool" in block or "strided" in block) and "deformable" in block:
                deform_layer = True
            self.deform_layers.append(deform_layer)
            layer_blocks = []
            if "global" in block or "upsample" in block:
                break

    # ------------------------------------------------------------------
    # Persistence
    # ------------------------------------------------------------------

    def load(self, path: str) -> None:
        """Re-parse a `parameters.txt` written by save() (or the reference)."""
        filename = join(path, "parameters.txt")
        with open(filename, "r") as f:
            lines = f.readlines()

        for line in lines:
            info = line.split()
            if len(info) <= 2 or info[0] == "#":
                continue
            key, value = info[0], info[2]

            if value == "None":
                setattr(self, key, None)
            elif key == "lr_decay_epochs":
                self.lr_decays = {int(b.split(":")[0]): float(b.split(":")[1])
                                  for b in info[2:]}
            elif key == "architecture":
                self.architecture = list(info[2:])
            elif key == "augment_symmetries":
                self.augment_symmetries = [bool(int(b)) for b in info[2:]]
            elif key == "num_classes":
                if len(info) > 3:
                    self.num_classes = [int(c) for c in info[2:]]
                else:
                    self.num_classes = int(value)
            elif key == "class_w":
                self.class_w = [float(w) for w in info[2:]]
            elif key in ("dropout", "sub_radius", "contrast_start"):
                setattr(self, key, float(value))
            elif key in ("model_name", "loss_type", "anchor_method",
                         "subsample_method", "weak_label_log",
                         "al_acquisition"):
                setattr(self, key, value)
            elif key in ("active_learning_iterations",
                         "initial_labels_per_file", "added_labels_per_epoch"):
                setattr(self, key, int(value))
            elif key == "subsample_labels":
                setattr(self, key, bool(int(value)))
            elif key.startswith("contrast_thd"):
                # Written as 'contrast_thd[%]' by the reference format
                setattr(self, "contrast_thd", float(value))
            elif hasattr(self, key):
                if len(value.split(".")) == 2:
                    attr_type = float
                else:
                    attr_type = type(getattr(self, key))
                if attr_type == bool:
                    setattr(self, key, bool(int(value)))
                else:
                    setattr(self, key, attr_type(value))

        self.saving = True
        self.saving_path = path
        self.__init__()

    def save(self) -> None:
        """Write `parameters.txt` into saving_path (reference format)."""
        assert self.saving_path is not None, "saving_path must be set"
        os.makedirs(self.saving_path, exist_ok=True)
        with open(join(self.saving_path, "parameters.txt"), "w") as f:
            w = f.write
            w("# -----------------------------------#\n")
            w("# Parameters of the training session #\n")
            w("# -----------------------------------#\n\n")

            w("# Input parameters\n# ****************\n\n")
            w(f"dataset = {self.dataset:s}\n")
            w(f"dataset_task = {self.dataset_task:s}\n")
            if isinstance(self.num_classes, list):
                w("num_classes =" +
                  "".join(f" {n:d}" for n in self.num_classes) + "\n")
            else:
                w(f"num_classes = {self.num_classes:d}\n")
            w(f"in_points_dim = {self.in_points_dim:d}\n")
            w(f"in_features_dim = {self.in_features_dim:d}\n")
            w(f"in_radius = {self.in_radius:.6f}\n")
            w(f"input_threads = {self.input_threads:d}\n\n")

            w("# Model parameters\n# ****************\n\n")
            w("architecture =" +
              "".join(f" {a:s}" for a in self.architecture) + "\n")
            w(f"equivar_mode = {self.equivar_mode:s}\n")
            w(f"invar_mode = {self.invar_mode:s}\n")
            w(f"num_layers = {self.num_layers:d}\n")
            w(f"first_features_dim = {self.first_features_dim:d}\n")
            w(f"use_batch_norm = {int(self.use_batch_norm):d}\n")
            w(f"batch_norm_momentum = {self.batch_norm_momentum:.6f}\n\n")
            w(f"segmentation_ratio = {self.segmentation_ratio:.6f}\n\n")

            w("# KPConv parameters\n# *****************\n\n")
            w(f"first_subsampling_dl = {self.first_subsampling_dl:.6f}\n")
            w(f"num_kernel_points = {self.num_kernel_points:d}\n")
            w(f"conv_radius = {self.conv_radius:.6f}\n")
            w(f"deform_radius = {self.deform_radius:.6f}\n")
            w(f"fixed_kernel_points = {self.fixed_kernel_points:s}\n")
            w(f"KP_extent = {self.KP_extent:.6f}\n")
            w(f"KP_influence = {self.KP_influence:s}\n")
            w(f"aggregation_mode = {self.aggregation_mode:s}\n")
            w(f"modulated = {int(self.modulated):d}\n")
            w(f"n_frames = {self.n_frames:d}\n")
            w(f"max_in_points = {self.max_in_points:d}\n\n")
            w(f"max_val_points = {self.max_val_points:d}\n\n")
            w(f"val_radius = {self.val_radius:.6f}\n\n")

            w("# Training parameters\n# *******************\n\n")
            w(f"learning_rate = {self.learning_rate:f}\n")
            w(f"momentum = {self.momentum:f}\n")
            w("lr_decay_epochs =" +
              "".join(f" {e:d}:{d:f}" for e, d in self.lr_decays.items()) + "\n")
            w(f"grad_clip_norm = {self.grad_clip_norm:f}\n\n")

            w("augment_symmetries =" +
              "".join(f" {int(a):d}" for a in self.augment_symmetries) + "\n")
            w(f"augment_rotation = {self.augment_rotation:s}\n")
            w(f"augment_noise = {self.augment_noise:f}\n")
            w(f"augment_occlusion = {self.augment_occlusion:s}\n")
            w(f"augment_occlusion_ratio = {self.augment_occlusion_ratio:.6f}\n")
            w(f"augment_occlusion_num = {self.augment_occlusion_num:d}\n")
            w(f"augment_scale_anisotropic = {int(self.augment_scale_anisotropic):d}\n")
            w(f"augment_scale_min = {self.augment_scale_min:.6f}\n")
            w(f"augment_scale_max = {self.augment_scale_max:.6f}\n")
            w(f"augment_color = {self.augment_color:.6f}\n\n")

            w(f"weight_decay = {self.weight_decay:f}\n")
            w(f"segloss_balance = {self.segloss_balance:s}\n")
            w("class_w =" +
              "".join(f" {a:.6f}" for a in self.class_w) + "\n")
            w(f"deform_fitting_mode = {self.deform_fitting_mode:s}\n")
            w(f"deform_fitting_power = {self.deform_fitting_power:.6f}\n")
            w(f"deform_lr_factor = {self.deform_lr_factor:.6f}\n")
            w(f"repulse_extent = {self.repulse_extent:.6f}\n")
            w(f"batch_num = {self.batch_num:d}\n")
            w(f"val_batch_num = {self.val_batch_num:d}\n")
            w(f"max_epoch = {self.max_epoch:d}\n")
            if self.epoch_steps is None:
                w("epoch_steps = None\n")
            else:
                w(f"epoch_steps = {self.epoch_steps:d}\n")
            w(f"validation_size = {self.validation_size:d}\n")
            w(f"checkpoint_gap = {self.checkpoint_gap:d}\n\n")

            w("# Other parameters\n# *******************\n\n")
            if hasattr(self, "sub_radius"):
                w(f"sub_radius = {self.sub_radius:.6f}\n")
            if hasattr(self, "model_name"):
                w(f"model_name = {self.model_name:s}\n")
            if hasattr(self, "loss_type"):
                w(f"loss_type = {self.loss_type:s}\n")
            if hasattr(self, "contrast_start"):
                w(f"contrast_start = {self.contrast_start:.6f}\n")
            if hasattr(self, "contrast_thd"):
                w(f"contrast_thd[%] = {float(self.contrast_thd):.6f}\n")
            if hasattr(self, "anchor_method"):
                w(f"anchor_method = {self.anchor_method:s}\n")
            if hasattr(self, "active_learning_iterations"):
                w(f"active_learning_iterations = {self.active_learning_iterations:d}\n")
            if hasattr(self, "subsample_labels"):
                w(f"subsample_labels = {int(self.subsample_labels):d}\n")
            if hasattr(self, "initial_labels_per_file"):
                w(f"initial_labels_per_file = {self.initial_labels_per_file:d}\n")
            if hasattr(self, "subsample_method"):
                w(f"subsample_method = {self.subsample_method:s}\n")
            if hasattr(self, "added_labels_per_epoch"):
                w(f"added_labels_per_epoch = {self.added_labels_per_epoch:d}\n")
            if hasattr(self, "weak_label_log"):
                w(f"weak_label_log = {self.weak_label_log:s}\n")
            if hasattr(self, "dropout"):
                w(f"dropout = {float(self.dropout):.3f}\n")
            if float(getattr(self, "plan_point_percentile", 100.0)) != 100.0:
                # Non-default only: keeps the default parameters.txt
                # byte-compatible with the reference loader fixtures
                w("plan_point_percentile = "
                  f"{float(self.plan_point_percentile):.6f}\n")
            if getattr(self, "al_acquisition", "entropy") != "entropy":
                w(f"al_acquisition = {self.al_acquisition:s}\n")
            if float(getattr(self, "plan_bucket_percentile", 0.0)) > 0.0:
                w("plan_bucket_percentile = "
                  f"{float(self.plan_bucket_percentile):.6f}\n")
