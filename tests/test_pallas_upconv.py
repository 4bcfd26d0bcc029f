"""Fused decoder-stage Pallas kernel (upsample2x + concat + conv3x3 + bias +
ReLU) vs the XLA composition, and its integration into Up/fold_bn graphs."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egm_unet_tpu.ops.conv import conv2d
from egm_unet_tpu.ops.pallas.upconv import up_concat_conv
from egm_unet_tpu.ops.resize import upsample2x_bilinear_align_corners


@pytest.mark.parametrize("dims", [(2, 8, 8, 16, 8, 12), (1, 16, 12, 8, 8, 8),
                                  (1, 32, 32, 64, 32, 48)])
def test_upconv_matches_xla(dims):
    b, h, w, c1, c2, co = dims
    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.standard_normal((b, h, w, c1)), jnp.float32)
    x2 = jnp.asarray(rng.standard_normal((b, 2 * h, 2 * w, c2)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, c1 + c2, co)) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((co,)) * 0.1, jnp.float32)

    up = upsample2x_bilinear_align_corners(x1, impl="matmul")
    ref = jax.nn.relu(conv2d(jnp.concatenate([x2, up], -1), k, padding=1) + bias)
    out = up_concat_conv(x2, x1, k, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_fused_up_in_folded_model(monkeypatch):
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
    monkeypatch.setenv("EGM_UP_IMPL", "pallas")
    out = fmodel.apply(fv, x0, train=False)["out"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)
    # identical param tree: fused graph init == folded transform output
    finit = fmodel.init(jax.random.key(1), x0, train=False)
    assert jax.tree_util.tree_structure(finit["params"]) == \
        jax.tree_util.tree_structure(fv["params"])


def test_fused_up_skipped_on_odd_shapes(monkeypatch):
    """pad_to_match shapes (x2 != 2*x1) must fall back to the XLA path."""
    from egm_unet_tpu.models.unet import Up

    monkeypatch.setenv("EGM_UP_IMPL", "pallas")
    rng = np.random.default_rng(1)
    x1 = jnp.asarray(rng.standard_normal((1, 7, 9, 8)), jnp.float32)
    x2 = jnp.asarray(rng.standard_normal((1, 15, 19, 8)), jnp.float32)
    up = Up(features=8, fold_bn=True)
    v = up.init(jax.random.key(0), x1, x2)
    out = up.apply(v, x1, x2)
    assert out.shape == (1, 15, 19, 8)
