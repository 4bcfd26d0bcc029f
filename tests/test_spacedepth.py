"""Space-to-depth conv rewrite (ops/spacedepth.py): exactness vs plain conv
and inside the folded model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egm_unet_tpu.ops.conv import conv2d
from egm_unet_tpu.ops.spacedepth import (conv3x3_s2d, depth_to_space,
                                         double_conv_s2d, space_to_depth)


def test_s2d_roundtrip():
    x = jnp.arange(2 * 8 * 6 * 5, dtype=jnp.float32).reshape(2, 8, 6, 5)
    np.testing.assert_array_equal(np.asarray(depth_to_space(space_to_depth(x))),
                                  np.asarray(x))


@pytest.mark.parametrize("dims", [(2, 8, 8, 3, 8), (1, 16, 12, 32, 32),
                                  (1, 10, 6, 5, 7)])
def test_conv3x3_s2d_exact(dims):
    b, h, w, ci, co = dims
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, h, w, ci)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, ci, co)) * 0.2, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((co,)) * 0.1, jnp.float32)
    ref = conv2d(x, k, padding=1) + bias
    np.testing.assert_allclose(np.asarray(conv3x3_s2d(x, k, bias)),
                               np.asarray(ref), atol=2e-5, rtol=1e-5)


def test_double_conv_s2d_exact():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((3, 3, 3, 8)) * 0.2, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((8,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((3, 3, 8, 8)) * 0.2, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((8,)) * 0.1, jnp.float32)
    ref = jax.nn.relu(conv2d(jax.nn.relu(conv2d(x, w1, padding=1) + b1),
                             w2, padding=1) + b2)
    np.testing.assert_allclose(np.asarray(double_conv_s2d(x, w1, b1, w2, b2)),
                               np.asarray(ref), atol=2e-5, rtol=1e-5)


def test_s2d_model_parity(monkeypatch):
    from egm_unet_tpu.models import create_model
    from egm_unet_tpu.models.fold_bn import fold_bn_variables

    rng = np.random.default_rng(0)
    model = create_model("egm_unet", base_c=8, num_classes=2)
    x0 = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    variables = model.init(jax.random.key(0), x0, train=True)
    fv = fold_bn_variables({"params": variables["params"],
                            "batch_stats": variables["batch_stats"]})
    fmodel = create_model("egm_unet", base_c=8, num_classes=2, fold_bn=True)
    ref = fmodel.apply(fv, x0, train=False)["out"]
    monkeypatch.setenv("EGM_DC_IMPL", "s2d")
    out = fmodel.apply(fv, x0, train=False)["out"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)
