"""Deformable KPConv: forward, regularizer plumbing, one training step."""

import numpy as np
import jax
import optax

from weasal_tpu.config import Config
from weasal_tpu.data.demo import demo_batch
from weasal_tpu.models import losses
from weasal_tpu.models.architectures import KPFCNN_mprm
from weasal_tpu.models.init import jit_init
from weasal_tpu.train.trainer import _offset_mask, make_optimizer


class DeformConfig(Config):
    dataset = "T"
    num_classes = 5
    in_features_dim = 4
    first_features_dim = 16
    in_radius = 4.0
    first_subsampling_dl = 0.5
    conv_radius = 2.5
    deform_radius = 5.0
    architecture = ["simple", "resnetb", "resnetb_strided",
                    "resnetb_deformable", "resnetb_deformable_strided",
                    "resnetb_deformable",
                    "nearest_upsample", "nearest_upsample"]
    use_batch_norm = True
    batch_norm_momentum = 0.02
    deform_fitting_power = 1.0
    deform_lr_factor = 0.1
    repulse_extent = 1.2
    learning_rate = 0.01
    momentum = 0.98
    weight_decay = 1e-3
    grad_clip_norm = 1.0


def test_deformable_forward_and_training_step():
    cfg = DeformConfig()
    batch, plan = demo_batch(cfg, batch_size=2, seed=0, density=6.0)
    model = KPFCNN_mprm(cfg, tuple(range(5)), ())
    variables = jit_init(model, jax.random.PRNGKey(0), batch)
    params = variables["params"]

    # Offset parameters exist and the optimizer masks them
    mask = _offset_mask(params)
    n_offset = sum(jax.tree_util.tree_leaves(mask))
    assert n_offset > 0

    # jitted: eager flax apply dispatches thousands of tiny CPU ops
    out, mutated = jax.jit(lambda v, b: model.apply(
        v, b, train=True, mutable=["batch_stats", "deform"]))(
        {"params": params, "constants": variables["constants"],
         "batch_stats": variables["batch_stats"]}, batch)
    logits, cla_logits, cam = out
    deform_aux = mutated.get("deform", {})
    assert deform_aux, "deformable blocks must sow regularizer inputs"
    reg = losses.p2p_fitting_regularizer(
        deform_aux, cfg.repulse_extent, cfg.deform_fitting_power)
    assert np.isfinite(float(reg)) and float(reg) >= 0

    # One full training step with the deform regularizer in the loss
    tx = make_optimizer(cfg, params)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, batch_stats, constants, opt_state, batch):
        def loss_fn(p):
            out, mutated = model.apply(
                {"params": p, "constants": constants,
                 "batch_stats": batch_stats},
                batch, train=True, mutable=["batch_stats", "deform"])
            _l, _c, cam = out
            loss = losses.region_mprm_loss(
                cam, batch.region_inds, batch.region_masks,
                batch.region_point_masks, batch.region_lb)
            loss = loss + losses.p2p_fitting_regularizer(
                mutated["deform"], cfg.repulse_extent,
                cfg.deform_fitting_power)
            return loss, mutated["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        updates = jax.tree_util.tree_map(
            lambda u: -cfg.learning_rate * u, updates)
        return optax.apply_updates(params, updates), loss, grads

    new_params, loss, grads = step(
        params, variables["batch_stats"], variables["constants"],
        opt_state, batch)
    assert np.isfinite(float(loss))

    # Offset weights receive gradients
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    offset_grads = [np.abs(np.asarray(g)).max() for path, g in flat
                    if any("offset" in str(getattr(k, "key", k))
                           for k in path)]
    assert offset_grads and max(offset_grads) > 0
