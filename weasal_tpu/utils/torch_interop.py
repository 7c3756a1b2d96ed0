"""Bidirectional parameter interop with the reference torch implementation.

The reference saves torch ``.tar`` checkpoints of ``net.state_dict()``
(utils/trainer_WeakLabel.py:274-288) whose keys follow its module attribute
names (models/architectures.py:192-651, models/blocks.py:144-1012). This
framework's flax modules intentionally mirror those names
(weasal_tpu/models/blocks.py), so the mapping is mechanical:

    torch key                                   flax collection / path
    ------------------------------------------- -------------------------
    encoder_blocks.3.unary1.mlp.weight          params  encoder_blocks_3/unary1/mlp          (transposed)
    ....batch_norm.batch_norm.{weight,bias}     params  .../batch_norm/{scale,bias}
    ....batch_norm.batch_norm.running_{mean,var} batch_stats .../batch_norm/{mean,var}
    ....batch_norm.bias         (use_bn=False)  params  .../batch_norm/bias
    ....KPConv.weights                          params  .../KPConv/weights                   (same [Kp,Cin,Cout] layout)
    ....KPConv.kernel_points                    constants .../KPConv/kernel_points
    ....KPConv.offset_conv.*                    (recurses with the same rules)
    ....gamma / offset_bias                     params  (as-is)
    criterion.* / l1.* / *num_batches_tracked   (skipped; loss buffers)

Used by
- ``tests/test_reference_parity.py`` to transplant reference weights into the
  flax models and assert forward/loss equivalence, and
- ``weasal_tpu.train.trainer.load_checkpoint_file`` to load reference torch
  checkpoints directly (the reverse of the reference's own restore,
  utils/trainer_WeakLabel.py:100-112).
"""

from __future__ import annotations

import sys
import types
from typing import Any, Dict, Optional, Tuple

import numpy as np

_BN_STAT_LEAVES = ("weight", "bias", "running_mean", "running_var",
                   "num_batches_tracked")
_BN_WRAPPER_NAMES = ("batch_norm", "batch_norm_conv")

# Module-list attributes of the reference architectures whose children are
# indexed numerically ("encoder_blocks.3"); flax names them with underscores.
_LIST_ATTRS = ("encoder_blocks", "decoder_blocks", "block_ops")


def _flax_tokens(tokens):
    """Fuse list indices: ['encoder_blocks', '3', ...] -> ['encoder_blocks_3', ...]."""
    out = []
    i = 0
    while i < len(tokens):
        if tokens[i] in _LIST_ATTRS and i + 1 < len(tokens) \
                and tokens[i + 1].isdigit():
            out.append(f"{tokens[i]}_{tokens[i + 1]}")
            i += 2
        else:
            out.append(tokens[i])
            i += 1
    return out


def classify_torch_key(key: str) -> Optional[Tuple[str, Tuple[str, ...], bool]]:
    """Map one torch state-dict key -> (collection, flax path, transpose).

    Returns None for keys that have no flax counterpart (loss buffers,
    num_batches_tracked).
    """
    tokens = key.split(".")
    if tokens[0] in ("criterion", "criterion_multi", "l1"):
        return None
    if tokens[-1] == "num_batches_tracked":
        return None

    leaf = tokens[-1]
    if leaf == "weight" and len(tokens) >= 2 and tokens[-2] == "mlp":
        return "params", tuple(_flax_tokens(tokens[:-1])), True
    if (len(tokens) >= 3 and tokens[-2] == "batch_norm"
            and tokens[-3] in _BN_WRAPPER_NAMES
            and leaf in _BN_STAT_LEAVES):
        # Inner nn.BatchNorm1d of a BatchNormBlock: drop the doubled level
        base = tuple(_flax_tokens(tokens[:-2]))
        if leaf == "weight":
            return "params", base + ("scale",), False
        if leaf == "bias":
            return "params", base + ("bias",), False
        if leaf == "running_mean":
            return "batch_stats", base + ("mean",), False
        if leaf == "running_var":
            return "batch_stats", base + ("var",), False
    if leaf == "bias" and len(tokens) >= 2 and tokens[-2] in _BN_WRAPPER_NAMES:
        # BatchNormBlock with use_bn=False: bias-only parameter
        return "params", tuple(_flax_tokens(tokens)), False
    if leaf == "kernel_points":
        return "constants", tuple(_flax_tokens(tokens)), False
    if leaf in ("weights", "gamma", "offset_bias"):
        return "params", tuple(_flax_tokens(tokens)), False
    raise ValueError(f"Unrecognized reference state-dict key: {key}")


def _set_nested(tree: Dict, path: Tuple[str, ...], value) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _to_numpy(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy(), dtype=np.float32)


def torch_state_to_flax(state_dict: Dict[str, Any]) -> Dict[str, Dict]:
    """Convert a reference ``net.state_dict()`` into flax variable
    collections ``{'params': ..., 'batch_stats': ..., 'constants': ...}``."""
    out: Dict[str, Dict] = {"params": {}, "batch_stats": {}, "constants": {}}
    for key, tensor in state_dict.items():
        spec = classify_torch_key(key)
        if spec is None:
            continue
        collection, path, transpose = spec
        arr = _to_numpy(tensor)
        if transpose:
            arr = arr.T
        _set_nested(out[collection], path, arr)
    return out


def flax_to_torch_state(params: Dict, batch_stats: Dict,
                        constants: Dict) -> Dict[str, np.ndarray]:
    """Inverse mapping: flax collections -> reference state-dict arrays.

    Keys come out in the reference's naming; callers load them with
    ``net.load_state_dict({k: torch.from_numpy(v) ...}, strict=False)``
    (strict=False because loss buffers like ``criterion.weight`` and BN
    ``num_batches_tracked`` are intentionally not produced).
    """
    out: Dict[str, np.ndarray] = {}

    def torch_tokens(path):
        tokens = []
        for p in path:
            head, _, tail = p.rpartition("_")
            if head in _LIST_ATTRS and tail.isdigit():
                tokens.extend([head, tail])
            else:
                tokens.append(p)
        return tokens

    def walk(tree, path, collection):
        for k, v in tree.items():
            sub = path + (k,)
            if isinstance(v, dict):
                walk(v, sub, collection)
                continue
            arr = np.asarray(v)
            tokens = torch_tokens(sub)
            leaf = tokens[-1]
            if collection == "params":
                if leaf == "mlp":
                    out[".".join(tokens) + ".weight"] = arr.T
                elif leaf == "scale":
                    out[".".join(tokens[:-1])
                        + ".batch_norm.weight"] = arr
                elif leaf == "bias" and tokens[-2] in _BN_WRAPPER_NAMES:
                    # use_bn case cannot be distinguished here from the
                    # bias-only case; emit the bias-only key and let the
                    # caller's template resolve — see _emit_bias below.
                    out[".".join(tokens)] = arr
                else:
                    out[".".join(tokens)] = arr
            elif collection == "batch_stats":
                base = ".".join(tokens[:-1])
                if leaf == "mean":
                    out[base + ".batch_norm.running_mean"] = arr
                else:
                    out[base + ".batch_norm.running_var"] = arr
            else:  # constants
                out[".".join(tokens)] = arr

    walk(params, (), "params")
    walk(batch_stats or {}, (), "batch_stats")
    walk(constants or {}, (), "constants")

    # Resolve BN bias naming: when the path has running stats OR a scale
    # parameter (use_bn=True — detectable even when the caller passes
    # batch_stats=None), its bias belongs to the inner nn.BatchNorm1d;
    # otherwise it is the bias-only fallback's own parameter.
    for key in list(out.keys()):
        if key.endswith(".bias") and key.rsplit(".", 1)[0].split(".")[-1] \
                in _BN_WRAPPER_NAMES:
            base = key.rsplit(".", 1)[0]
            if (base + ".batch_norm.running_mean" in out
                    or base + ".batch_norm.weight" in out):
                out[base + ".batch_norm.bias"] = out.pop(key)
    return out


def save_torch_checkpoint(path: str,
                          model_state: Dict[str, Dict],
                          epoch: int = 0,
                          saving_path: Optional[str] = None,
                          config=None,
                          class_weights=None,
                          model_name: str = "KPFCNN_mprm") -> None:
    """Write a reference-format torch ``.tar`` checkpoint that the
    reference's own restore consumes *strictly*
    (utils/trainer_WeakLabel.py:100-112: ``net.load_state_dict`` with
    strict=True plus ``optimizer.load_state_dict``).

    :param model_state: ``{'params':…, 'batch_stats':…, 'constants':…}``
        (this framework's checkpoint payload ``model_state_dict``).
    :param config: optional; fills the synthesized SGD param-group
        hyperparameters (lr/momentum/weight_decay/deform_lr_factor).
    :param class_weights: the reference registers ``criterion.weight``
        (and ``criterion_multi.weight`` for the mprm nets) buffers when
        built with class weights (architectures.py:315,637-638) — pass the
        same weights so the strict load finds them.
    """
    import torch

    state = flax_to_torch_state(model_state.get("params") or {},
                                model_state.get("batch_stats") or {},
                                model_state.get("constants") or {})

    # nn.BatchNorm1d state has a num_batches_tracked buffer next to the
    # running stats (skipped on import; required for the strict export)
    for key in list(state.keys()):
        if key.endswith(".running_mean"):
            state[key[:-len("running_mean")] + "num_batches_tracked"] = \
                np.asarray(0, dtype=np.int64)
    if class_weights is not None:
        w = np.asarray(class_weights, np.float32)
        state["criterion.weight"] = w
        if "mprm" in model_name:
            state["criterion_multi.weight"] = w

    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in state.items()}

    # Synthesize the two-group SGD state the reference trainer restores
    # (trainer_WeakLabel.py:80-87): group 0 = non-offset parameters,
    # group 1 = offset parameters at lr * deform_lr_factor. Parameter ids
    # enumerate group 0 then group 1; momentum state starts empty (fresh
    # momentum, like this framework's own torch-import path).
    buffer_leaves = ("running_mean", "running_var", "num_batches_tracked")
    param_keys = [k for k in state
                  if not k.endswith(buffer_leaves)
                  and not k.startswith(("criterion", "l1"))]
    n_offset = sum("offset" in k for k in param_keys)
    n_other = len(param_keys) - n_offset
    lr = float(getattr(config, "learning_rate", 0.01) or 0.01)
    hyper = dict(momentum=float(getattr(config, "momentum", 0.98) or 0.98),
                 dampening=0, nesterov=False, maximize=False,
                 weight_decay=float(getattr(config, "weight_decay", 0.001)
                                    or 0.0),
                 foreach=None, differentiable=False, fused=None)
    optimizer_state = {
        "state": {},
        "param_groups": [
            dict(hyper, lr=lr, params=list(range(n_other))),
            dict(hyper,
                 lr=lr * float(getattr(config, "deform_lr_factor", 0.1)
                               or 0.1),
                 params=list(range(n_other, n_other + n_offset))),
        ],
    }

    torch.save({"epoch": int(epoch),
                "model_state_dict": sd,
                "optimizer_state_dict": optimizer_state,
                "saving_path": saving_path}, path)


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Load a reference torch checkpoint
    ``{epoch, model_state_dict, optimizer_state_dict, saving_path}``
    (utils/trainer_WeakLabel.py:274-288) into this framework's payload
    schema. The torch optimizer state has no optax equivalent and is
    omitted (resume restarts momentum; use finetune=True semantics)."""
    import torch
    payload = torch.load(path, map_location="cpu", weights_only=False)
    collections = torch_state_to_flax(payload["model_state_dict"])
    return {
        "epoch": int(payload.get("epoch", 0)),
        "model_state_dict": {
            "params": collections["params"],
            "batch_stats": collections["batch_stats"],
            "constants": collections["constants"],
        },
        "saving_path": payload.get("saving_path"),
    }


def dense_batch_to_reference(batch):
    """Convert a dense PyramidBatch into the reference's stacked ragged
    batch object (datasets/Vaihingen3D_WeakLabel.py:1345-1447).

    Per level l, sphere-local indices become stacked-global indices and the
    per-sphere shadow (== padded N_l) becomes the stacked shadow
    (== total real point count of level l). The returned namespace carries
    torch tensors with the attributes the reference forwards read:
    points/neighbors/pools/upsamples/lengths/features/labels/center_pts.
    """
    import torch
    from types import SimpleNamespace

    L = batch.num_layers
    B = batch.batch_size
    lengths = [np.asarray(batch.lengths[l]).astype(np.int64)
               for l in range(L)]
    offsets = [np.concatenate([[0], np.cumsum(lengths[l])[:-1]])
               for l in range(L)]
    totals = [int(lengths[l].sum()) for l in range(L)]

    def stack_points(l):
        return np.concatenate([
            np.asarray(batch.points[l][b, :lengths[l][b]])
            for b in range(B)], axis=0)

    def stack_indices(arr_l, row_level, val_level):
        """arr_l: [B, N_rows, K] sphere-local into val_level."""
        n_pad_val = batch.points[val_level].shape[1]
        rows = []
        for b in range(B):
            block = np.asarray(
                arr_l[b, :lengths[row_level][b]]).astype(np.int64)
            shadow = block >= n_pad_val
            block = block + offsets[val_level][b]
            block[shadow] = totals[val_level]
            rows.append(block)
        return np.concatenate(rows, axis=0)

    points = [torch.from_numpy(stack_points(l).astype(np.float32))
              for l in range(L)]
    neighbors = [torch.from_numpy(stack_indices(batch.neighbors[l], l, l))
                 for l in range(L)]
    pools = [torch.from_numpy(stack_indices(batch.pools[l], l + 1, l))
             for l in range(L - 1)]
    upsamples = [torch.from_numpy(stack_indices(batch.upsamples[l], l, l + 1))
                 for l in range(L - 1)]
    features = torch.from_numpy(np.concatenate(
        [np.asarray(batch.features[b, :lengths[0][b]]) for b in range(B)],
        axis=0).astype(np.float32))
    labels = torch.from_numpy(np.concatenate(
        [np.asarray(batch.labels[b, :lengths[0][b]]) for b in range(B)],
        axis=0).astype(np.int64))
    return SimpleNamespace(
        points=points, neighbors=neighbors, pools=pools, upsamples=upsamples,
        lengths=[torch.from_numpy(lengths[l]) for l in range(L)],
        features=features, labels=labels,
        center_pts=torch.from_numpy(np.asarray(batch.center_pts,
                                               dtype=np.float32)))


# ----------------------------------------------------------------------------
# Runtime shims for importing/running the reference torch code on CPU
# ----------------------------------------------------------------------------

def install_reference_shims() -> None:
    """Make `/root/reference`'s model code importable and CPU-runnable.

    - stubs ``torch_scatter.scatter`` (only 'mean' reduce is used,
      architectures.py:501) with a pure-torch equivalent,
    - no-ops ``torch.Tensor.cuda`` so the attention blocks' hard-coded
      ``.cuda()`` tensors (models/blocks.py:798-799,862,988) stay on CPU.
    """
    import torch

    if "torch_scatter" not in sys.modules:
        mod = types.ModuleType("torch_scatter")

        def scatter(src, index, dim=0, dim_size=None, reduce="mean"):
            if dim_size is None:
                dim_size = int(index.max().item()) + 1 if index.numel() else 0
            shape = list(src.shape)
            shape[dim] = dim_size
            total = torch.zeros(shape, dtype=src.dtype)
            total.index_add_(dim, index, src)
            if reduce == "sum":
                return total
            if reduce != "mean":
                raise NotImplementedError(reduce)
            counts = torch.zeros(dim_size, dtype=src.dtype)
            counts.index_add_(0, index, torch.ones(
                index.shape[0], dtype=src.dtype))
            counts = torch.clamp(counts, min=1)
            view = [1] * total.dim()
            view[dim] = dim_size
            return total / counts.view(view)

        mod.scatter = scatter
        sys.modules["torch_scatter"] = mod

    if not torch.cuda.is_available():
        torch.Tensor.cuda = lambda self, *a, **k: self
        # trainer_WeakLabel.py:220-221 calls these unconditionally per step
        torch.cuda.empty_cache = lambda: None
        torch.cuda.synchronize = lambda *a, **k: None

    # torch>=2 removed Sampler.__init__(data_source); the reference's
    # samplers (torch-1.4 era) still call it (Vaihingen3D_WeakLabel.py:887)
    from torch.utils.data import Sampler
    try:
        Sampler.__init__(object.__new__(Sampler), None)  # probe signature
    except TypeError:
        Sampler.__init__ = lambda self, data_source=None: None
