"""Loss functions (pure, jittable) for all training stages.

Ports of the reference's network-owned losses
(models/architectures.py:354-504,709-784) as standalone functions over the
dense sphere-batch layout. Per-region/per-class Python loops become masked
segment means — the reference's `region_mprm_loss` loop
(architectures.py:754-775) was a per-step host sync point; here it is a
single gather + masked mean inside the jitted step.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp


def softmax_cross_entropy(logits: jnp.ndarray,
                          targets: jnp.ndarray,
                          class_w: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Weighted CE with ignore_index = -1 over flattened points.

    :param logits: [..., C]
    :param targets: [...] int32 in [0, C) or -1 (ignored)
    :return: scalar, weighted mean over non-ignored points (torch semantics:
        sum(w_i * nll_i) / sum(w_i)).
    """
    c = logits.shape[-1]
    valid = targets >= 0
    safe_t = jnp.where(valid, targets, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe_t[..., None], axis=-1)[..., 0]
    if class_w is not None:
        w = jnp.asarray(class_w)[safe_t]
    else:
        w = jnp.ones_like(nll)
    w = w * valid.astype(nll.dtype)
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1e-9)


def bce_with_logits(logits: jnp.ndarray,
                    targets: jnp.ndarray,
                    class_w: Optional[jnp.ndarray] = None,
                    mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """BCEWithLogitsLoss (elementwise weight = class_w broadcast on last axis).

    With a row `mask`, masked rows are excluded from the mean (torch computes
    a plain mean over all elements; masked rows here correspond to padding
    the reference never sees).
    """
    logp = jax.nn.log_sigmoid(logits)
    lognp = jax.nn.log_sigmoid(-logits)
    loss = -(targets * logp + (1 - targets) * lognp)
    if class_w is not None:
        loss = loss * jnp.asarray(class_w)
    if mask is None:
        return jnp.mean(loss)
    m = mask.astype(loss.dtype)
    while m.ndim < loss.ndim:
        m = m[..., None]
    return jnp.sum(loss * m) / jnp.maximum(jnp.sum(
        m * jnp.ones_like(loss)), 1e-9)


def class_logits_loss(cla_logits: Sequence[jnp.ndarray],
                      cloud_lb: jnp.ndarray,
                      class_w: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Sphere-level BCE summed over the 4 MPRM paths
    (reference architectures.py:709-733)."""
    return sum(bce_with_logits(lg, cloud_lb, class_w) for lg in cla_logits)


def region_mprm_loss(cam: Sequence[jnp.ndarray],
                     region_inds: jnp.ndarray,
                     region_masks: jnp.ndarray,
                     region_point_masks: jnp.ndarray,
                     region_lb: jnp.ndarray,
                     class_w: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Sub-region weak-label loss (reference architectures.py:735-784).

    For each of the 4 CAM paths, averages per-point class logits over every
    sub-region's member points and applies BCE against the region's multi-hot
    label; the per-path losses are summed. Regions are padded to [B, R, P].

    :param cam: 4 x [B, N0, C] per-point class maps
    :param region_inds: [B, R, P] level-0 point indices (pad = N0)
    :param region_masks: [B, R] region exists
    :param region_point_masks: [B, R, P] member valid
    :param region_lb: [B, R, C] multi-hot ground truth
    """
    total = 0.0
    pm = region_point_masks.astype(cam[0].dtype)              # [B, R, P]
    counts = jnp.maximum(jnp.sum(pm, axis=-1), 1.0)           # [B, R]
    for path in cam:
        b, n0, c = path.shape
        padded = jnp.concatenate(
            [path, jnp.zeros((b, 1, c), path.dtype)], axis=1)
        # Gather member logits: [B, R, P, C]
        flat = region_inds.reshape(b, -1)
        member = jnp.take_along_axis(
            padded[:, :, None, :],
            flat[:, :, None, None].astype(jnp.int32), axis=1)
        member = member.reshape(b, *region_inds.shape[1:], c)
        mean_logits = (jnp.sum(member * pm[..., None], axis=2)
                       / counts[..., None])                   # [B, R, C]
        total = total + bce_with_logits(mean_logits, region_lb, class_w,
                                        mask=region_masks)
    return total


def _deform_modules(tree: dict):
    """Yield each deformable conv's sown dict ('min_sq', 'deformed_kp',
    'q_valid' tuples) from the nested 'deform' collection."""
    if isinstance(tree, dict):
        if "min_sq" in tree or "deformed_kp" in tree:
            yield tree
        else:
            for v in tree.values():
                yield from _deform_modules(v)


def p2p_fitting_regularizer(deform_aux: dict,
                            repulse_extent: float,
                            deform_fitting_power: float) -> jnp.ndarray:
    """Deformable-kernel fitting + repulsion regularizer
    (reference models/architectures.py:24-57).

    :param deform_aux: the mutated 'deform' collection from a forward pass;
        per deformable conv: 'min_sq' [B,N,K] extent-normalized squared
        distance to nearest input point, 'deformed_kp' [B,N,K,3] normalized
        positions, 'q_valid' [B,N] real-query mask. Means run over REAL
        query rows only — the reference stacks ragged real points, so
        dense padding must not dilute the fit/repulsion strength.
    """
    fitting = 0.0
    repulsive = 0.0
    for mod in _deform_modules(deform_aux):
        m = mod["q_valid"][0]                                  # [B, N]
        denom = jnp.maximum(jnp.sum(m), 1.0)
        min_sq = mod["min_sq"][0]                              # [B, N, K]
        k = min_sq.shape[-1]
        fitting = fitting + jnp.sum(
            jnp.abs(min_sq) * m[..., None]) / (denom * k)
        kp = mod["deformed_kp"][0]                             # [B, N, K, 3]
        diff = kp[..., :, None, :] - jax.lax.stop_gradient(
            kp[..., None, :, :])
        dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)
        off_diag = 1.0 - jnp.eye(k)
        rep = jnp.clip(dist - repulse_extent, max=0.0) ** 2 * off_diag
        # sum_i mean(rep_i) / K == mean over (real point, i) of the
        # per-kernel-point repulsion sums (architectures.py:51-55)
        repulsive = repulsive + jnp.sum(
            jnp.sum(rep, axis=-1) * m[..., None]) / (denom * k)
    return deform_fitting_power * (2 * fitting + repulsive)


def contrast_loss(logits: jnp.ndarray,
                  labels: jnp.ndarray,
                  valid_mask: jnp.ndarray,
                  rng: jax.Array,
                  num_classes: int,
                  threshold: float,
                  slc_con: int = 1000,
                  temperature: float = 0.1,
                  base_temperature: float = 1.0,
                  slc_idx: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Supervised contrastive loss on pseudo labels
    (reference models/architectures.py:405-504).

    Flattened inputs: `logits` [N, C], `labels` [N] raw label indices
    (< num_classes = labeled, >= num_classes e.g. 10 = unlabeled), and
    `valid_mask` [N] excluding padding. Draws `slc_con` reference points
    among labeled/confident ones and pulls same-pseudo-class points together.
    """
    n = logits.shape[0]
    eps = 1e-8

    prob = jax.nn.softmax(logits, axis=1)
    pseudo_conf = jnp.max(prob, axis=1)
    label_id = (labels < num_classes) & valid_mask
    certain = ((pseudo_conf > threshold) | label_id) & valid_mask

    pseudo_lbs = jnp.argmax(prob, axis=1)
    pseudo_lbs = jnp.where(label_id, labels, pseudo_lbs)

    # Sample slc_con indices among certain points (with replacement, matching
    # the reference's randint-based fallback behavior). A precomputed
    # `slc_idx` bypasses the draw (deterministic replay for parity tests).
    any_valid = jnp.sum(certain.astype(jnp.float32)) > 0
    if slc_idx is None:
        p = certain.astype(jnp.float32)
        p = jnp.where(any_valid, p, valid_mask.astype(jnp.float32))
        p = p / jnp.maximum(jnp.sum(p), 1e-9)
        slc_idx = jax.random.choice(rng, n, shape=(slc_con,), replace=True,
                                    p=p)
    else:
        slc_idx = jnp.asarray(slc_idx)
        slc_con = slc_idx.shape[0]

    # Masks [N, slc_con]
    mask_slice = (jnp.arange(n)[:, None] != slc_idx[None, :]).astype(
        jnp.float32)
    certain_slc = certain[slc_idx]
    mask_certain = (certain_slc[None, :] == certain[:, None]).astype(
        jnp.float32)
    mask_positive = (pseudo_lbs[slc_idx][None, :]
                     == pseudo_lbs[:, None]).astype(jnp.float32)
    pos_mask = mask_positive * mask_slice * mask_certain

    feats = logits / jnp.maximum(
        jnp.linalg.norm(logits, axis=1, keepdims=True), 1e-12)
    sim = (feats @ feats[slc_idx].T) / temperature
    sim = sim - jax.lax.stop_gradient(jnp.max(sim, axis=1, keepdims=True))

    mc = mask_slice * mask_certain
    exp_sim = jnp.exp(sim) * mc
    log_prob = (sim - jnp.log(jnp.sum(exp_sim, axis=1, keepdims=True) + eps)
                ) * mc

    mean_log_prob_pos = (jnp.sum(pos_mask * log_prob, axis=1)
                         / (jnp.sum(pos_mask, axis=1) + 1e-12))
    pts_loss = -(temperature / base_temperature) * mean_log_prob_pos

    # Keep positive per-point losses, average per pseudo class, then average
    # over classes with positive means (reference scatter-mean + filtering)
    keep = (pts_loss > 0) & valid_mask
    w = keep.astype(jnp.float32)
    sums = jnp.zeros((num_classes + 2,)).at[pseudo_lbs].add(pts_loss * w)
    cnts = jnp.zeros((num_classes + 2,)).at[pseudo_lbs].add(w)
    class_means = sums / jnp.maximum(cnts, 1e-9)
    pos = class_means > 0
    loss = jnp.sum(class_means * pos) / jnp.maximum(jnp.sum(pos), 1e-9)
    return jnp.where(any_valid, loss, 0.0)


def accuracy(logits: jnp.ndarray,
             targets: jnp.ndarray,
             mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Fraction of real points whose argmax matches target.

    Reference semantics (architectures.py:786-807): ignored labels map to
    target -1 and count as *wrong* (argmax never equals -1), while the
    denominator is every point the reference sees. Padded rows (absent in
    the reference) are excluded via `mask`; without a mask, every row
    counts toward the denominator."""
    preds = jnp.argmax(logits, axis=-1)
    if mask is None:
        mask = jnp.ones(targets.shape, bool)
    correct = (preds == targets) & mask
    return jnp.sum(correct) / jnp.maximum(jnp.sum(mask), 1)
