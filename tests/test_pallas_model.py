"""Full-model equivalence: Pallas KPConv path vs XLA path (interpret mode)."""

import numpy as np
import jax

from weasal_tpu.config import Config
from weasal_tpu.data.demo import demo_batch
from weasal_tpu.models.architectures import KPFCNN_mprm
from weasal_tpu.models.init import jit_init


class XLAConfig(Config):
    dataset = "T"
    num_classes = 5
    in_features_dim = 4
    first_features_dim = 16
    in_radius = 4.0
    first_subsampling_dl = 0.5
    conv_radius = 2.5
    # 3 levels (two strided pools + two upsamples): covers multi-level
    # band auto-sizing and cross-level (nq != ns) windowing; the single
    # small sphere keeps interpret-mode cost down
    architecture = ["simple", "resnetb", "resnetb_strided", "resnetb",
                    "resnetb_strided", "resnetb",
                    "nearest_upsample", "nearest_upsample"]
    use_batch_norm = True
    batch_norm_momentum = 0.02


class PallasConfig(XLAConfig):
    use_pallas_kpconv = True
    pallas_interpret = True   # CPU test environment


def test_model_forward_matches_xla_path():
    cfg_x = XLAConfig()
    cfg_p = PallasConfig()
    batch, plan = demo_batch(cfg_x, batch_size=1, seed=0, density=5.0)

    model_x = KPFCNN_mprm(cfg_x, tuple(range(5)), ())
    model_p = KPFCNN_mprm(cfg_p, tuple(range(5)), ())
    variables = jit_init(model_x, jax.random.PRNGKey(0), batch)

    # jit the applies: eager flax apply dispatches thousands of tiny CPU
    # ops; jitted programs also land in the persistent compile cache
    out_x = jax.jit(lambda v, b: model_x.apply(v, b, train=False))(
        variables, batch)
    out_p = jax.jit(lambda v, b: model_p.apply(v, b, train=False))(
        variables, batch)

    np.testing.assert_allclose(np.asarray(out_x[0]), np.asarray(out_p[0]),
                               rtol=2e-3, atol=2e-3)
    for a, b in zip(out_x[1], out_p[1]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)
