"""Model forward tests: shapes, padding invariance, and loss oracles."""

import numpy as np
import jax
import jax.numpy as jnp

from weasal_tpu.config import Config
from weasal_tpu.data.batching import (
    ShapePlan, assemble_batch, build_sphere_pyramid, calibrate_shape_plan)
from weasal_tpu.models.architectures import (
    KPFCNN, KPFCNN_mprm, valid_label_mapper)
from weasal_tpu.models.init import jit_init
from weasal_tpu.models import losses


def _jit_apply(model, variables, batch, **kw):
    """Jitted flax apply: eager apply dispatches thousands of tiny CPU
    ops per call; jitted programs also land in the persistent compile
    cache, so warm suite runs skip the compile too."""
    return jax.jit(lambda v, b: model.apply(v, b, train=True,
                                            mutable=["batch_stats"], **kw)
                   )(variables, batch)


class TinyWLConfig(Config):
    dataset = "TestWL"
    num_classes = 5
    in_features_dim = 4
    first_features_dim = 16
    num_kernel_points = 15
    first_subsampling_dl = 0.4
    conv_radius = 2.5
    in_radius = 4.0
    architecture = ["simple", "resnetb", "resnetb_strided", "resnetb",
                    "resnetb_strided", "resnetb",
                    "nearest_upsample", "nearest_upsample"]
    use_batch_norm = True
    batch_norm_momentum = 0.02
    KP_influence = "linear"
    aggregation_mode = "sum"
    fixed_kernel_points = "center"


class TinyPLConfig(TinyWLConfig):
    dataset = "TestPL"
    architecture = ["simple", "resnetb", "resnetb_strided", "resnetb",
                    "resnetb_strided", "resnetb",
                    "nearest_upsample", "unary", "nearest_upsample", "unary"]
    dropout = 0.5


def make_sphere(rng, n=400, radius=4.0, num_classes=5):
    pts = rng.uniform(-radius, radius, size=(n, 3)).astype(np.float32)
    pts = pts[np.linalg.norm(pts, axis=1) < radius]
    n = pts.shape[0]
    feats = np.hstack([np.ones((n, 1)),
                       rng.random((n, 1)),
                       pts[:, 2:] + 10.0,
                       pts[:, 2:]]).astype(np.float32)
    labels = rng.integers(0, num_classes, n).astype(np.int32)
    return pts, feats, labels


def make_batch(config, plan=None, b=2, seed=0, with_regions=True):
    rng = np.random.default_rng(seed)
    spheres = []
    all_pts = []
    for _ in range(b):
        pts, feats, labels = make_sphere(rng, num_classes=config.num_classes)
        all_pts.append(pts)
        regions = []
        if with_regions:
            for _ in range(3):
                inds = rng.choice(pts.shape[0],
                                  size=rng.integers(5, 40), replace=False)
                lb = np.zeros(config.num_classes, np.float32)
                lb[np.unique(labels[inds])] = 1
                regions.append((inds, lb))
        cloud_lb = np.zeros(config.num_classes, np.float32)
        cloud_lb[np.unique(labels)] = 1
        spheres.append(dict(
            pyramid=build_sphere_pyramid(pts, config,
                                         rng=np.random.default_rng(1)),
            features=feats, labels=labels, center=np.array([0, 0, 10.0]),
            cloud_lb=cloud_lb, regions=regions))
    if plan is None:
        plan = calibrate_shape_plan(all_pts, config,
                                    region_budget=(4, 48))
    return assemble_batch(spheres, plan, config.num_classes,
                          rng=np.random.default_rng(2)), plan


class TestKPFCNNmprm:

    def test_forward_shapes(self):
        cfg = TinyWLConfig()
        batch, plan = make_batch(cfg)
        model = KPFCNN_mprm(cfg, tuple(range(5)), ())
        variables = jit_init(model, jax.random.PRNGKey(0), batch)
        (logits, cla_logits, cam), _ = _jit_apply(model, variables, batch)
        B, N0 = batch.features.shape[:2]
        assert logits.shape == (B, N0, 5)
        assert len(cla_logits) == 4 and cla_logits[0].shape == (B, 5)
        assert len(cam) == 4 and cam[0].shape == (B, N0, 5)
        assert np.all(np.isfinite(np.asarray(logits)))

    def test_padding_invariance(self):
        """Extra padding must not change outputs on real points."""
        cfg = TinyWLConfig()
        batch1, plan1 = make_batch(cfg, seed=3)
        plan2 = ShapePlan(
            num_points=[n + 64 for n in plan1.num_points],
            conv_neighbors=plan1.conv_neighbors,
            pool_neighbors=plan1.pool_neighbors,
            up_neighbors=plan1.up_neighbors,
            max_regions=plan1.max_regions + 2,
            max_region_points=plan1.max_region_points)
        batch2, _ = make_batch(cfg, plan=plan2, seed=3)

        model = KPFCNN_mprm(cfg, tuple(range(5)), ())
        variables = jit_init(model, jax.random.PRNGKey(0), batch1)
        out1, _ = _jit_apply(model, variables, batch1)
        out2, _ = _jit_apply(model, variables, batch2)
        n_real = np.asarray(batch1.lengths[0])
        for b in range(2):
            np.testing.assert_allclose(
                np.asarray(out1[0][b, :n_real[b]]),
                np.asarray(out2[0][b, :n_real[b]]), rtol=5e-3, atol=5e-3)
            np.testing.assert_allclose(
                np.asarray(out1[1][0][b]), np.asarray(out2[1][0][b]),
                rtol=5e-3, atol=5e-3)

    def test_region_mprm_loss_matches_oracle(self):
        cfg = TinyWLConfig()
        batch, _ = make_batch(cfg, seed=4)
        rng = np.random.default_rng(5)
        B, N0 = batch.features.shape[:2]
        C = cfg.num_classes
        cam = [jnp.asarray(rng.normal(size=(B, N0, C)).astype(np.float32))
               for _ in range(4)]

        got = float(losses.region_mprm_loss(
            cam, jnp.asarray(batch.region_inds),
            jnp.asarray(batch.region_masks),
            jnp.asarray(batch.region_point_masks),
            jnp.asarray(batch.region_lb)))

        # Oracle: loop over valid regions like the reference
        total = 0.0
        for path in cam:
            path = np.asarray(path)
            per_elem = []
            lbs = []
            for b in range(B):
                for r in range(batch.region_masks.shape[1]):
                    if not batch.region_masks[b, r]:
                        continue
                    pm = batch.region_point_masks[b, r]
                    inds = batch.region_inds[b, r][pm]
                    per_elem.append(path[b, inds].mean(axis=0))
                    lbs.append(batch.region_lb[b, r])
            logits = np.stack(per_elem)
            t = np.stack(lbs)
            bce = -(t * np.log(1 / (1 + np.exp(-logits)))
                    + (1 - t) * np.log(1 - 1 / (1 + np.exp(-logits))))
            total += bce.mean()
        np.testing.assert_allclose(got, total, rtol=1e-4)


class TestKPFCNN:

    def test_forward_and_ce_loss(self):
        cfg = TinyPLConfig()
        batch, _ = make_batch(cfg, with_regions=False)
        model = KPFCNN(cfg, tuple(range(5)), ())
        variables = jit_init(model, jax.random.PRNGKey(1), batch)
        logits, _ = _jit_apply(model, variables, batch,
                               rngs={"dropout": jax.random.PRNGKey(2)})
        B, N0 = batch.features.shape[:2]
        assert logits.shape == (B, N0, 5)

        table = valid_label_mapper(range(5), ())
        raw = np.asarray(batch.labels)
        targets = np.where(raw >= 0, table[np.clip(raw, 0, None)], -1)
        loss = float(losses.softmax_cross_entropy(
            logits, jnp.asarray(targets)))
        assert np.isfinite(loss) and loss > 0

        acc = float(losses.accuracy(logits, jnp.asarray(targets)))
        assert 0.0 <= acc <= 1.0

    def test_ce_loss_ignores_padding_oracle(self):
        rng = np.random.default_rng(0)
        logits = rng.normal(size=(50, 4)).astype(np.float32)
        targets = rng.integers(0, 4, 50).astype(np.int32)
        targets[30:] = -1
        w = np.array([1.0, 2.0, 0.5, 1.0], np.float32)

        got = float(losses.softmax_cross_entropy(
            jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(w)))

        logp = logits - np.log(np.exp(logits).sum(1, keepdims=True))
        nll = np.array([-logp[i, targets[i]] for i in range(30)])
        ww = w[targets[:30]]
        expected = (nll * ww).sum() / ww.sum()
        np.testing.assert_allclose(got, expected, rtol=1e-5)

    def test_valid_label_mapper_with_ignore(self):
        table = valid_label_mapper([0, 1, 2, 10], [10])
        assert table[10] == -1
        np.testing.assert_array_equal(table[[0, 1, 2]], [0, 1, 2])


class TestContrastLoss:

    def test_runs_and_finite(self):
        rng = np.random.default_rng(0)
        n, c = 200, 5
        logits = jnp.asarray(rng.normal(size=(n, c)).astype(np.float32))
        labels = jnp.asarray(rng.integers(0, 11, n).astype(np.int32))
        valid = jnp.asarray(np.arange(n) < 180)
        loss = losses.contrast_loss(
            logits, labels, valid, jax.random.PRNGKey(0), num_classes=c,
            threshold=0.2, slc_con=64)
        assert np.isfinite(float(loss))
        assert float(loss) >= 0


class TestKPCNN:

    def test_classification_forward(self):
        import jax
        from weasal_tpu.models.architectures import KPCNN

        class ClsConfig(TinyWLConfig):
            architecture = ["simple", "resnetb", "resnetb_strided",
                            "resnetb", "resnetb_strided", "resnetb",
                            "global_average"]
            num_classes = 5

        cfg = ClsConfig()
        batch, _ = make_batch(cfg, with_regions=False)
        model = KPCNN(cfg)
        variables = jit_init(model, jax.random.PRNGKey(0), batch)
        logits, _ = _jit_apply(model, variables, batch)
        assert logits.shape == (2, 5)
        assert np.all(np.isfinite(np.asarray(logits)))
