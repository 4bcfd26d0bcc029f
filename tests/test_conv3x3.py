"""Parity of the implicit-GEMM conv3x3 paths against the lax conv.

The Pallas kernel (ops/pallas/conv3x3.py) runs in interpret mode here;
``bench.py --verify-kernels`` re-checks the compiled Mosaic lowering on the
real TPU.  Reference op being replaced: the folded ConvBNReLU conv
(src/EGM-UNet.py:44-55 DoubleConv halves).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egm_unet_tpu.ops.conv import conv2d, conv3x3_dots
from egm_unet_tpu.ops.pallas.conv3x3 import conv3x3_gemm, conv3x3_gemm_supported


def _ref(x, w, b, relu):
    y = conv2d(x.astype(jnp.float32), w.astype(jnp.float32), padding=1)
    if b is not None:
        y = y + b
    return jnp.maximum(y, 0.0) if relu else y


@pytest.mark.parametrize("shape,co", [
    ((2, 16, 16, 64), 64),     # down1-like
    ((1, 8, 8, 128), 128),     # down2-like
    ((1, 8, 8, 64), 128),      # down2/conv1-like (C_in 64 -> 128)
    ((1, 8, 10, 64), 32),      # W not sublane-aligned, Co 32
    ((1, 12, 16, 128), 64),    # rb=4 row blocks
])
@pytest.mark.parametrize("relu", [False, True])
def test_conv3x3_gemm_parity(shape, co, relu):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, shape[-1], co)) * 0.1,
                    jnp.float32)
    b = jnp.asarray(rng.standard_normal((co,)) * 0.1, jnp.float32)
    assert conv3x3_gemm_supported(shape, co, jnp.float32)
    out = conv3x3_gemm(x, w, b, relu=relu, interpret=True)
    ref = _ref(x, w, b, relu)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_conv3x3_gemm_bf16():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 64)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, 64, 64)) * 0.1, jnp.bfloat16)
    out = conv3x3_gemm(x, w, None, relu=True, interpret=True)
    ref = _ref(x, w, None, True)
    assert float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref))) < 0.15


def test_conv3x3_gemm_no_bias():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 64)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 64, 64)) * 0.1, jnp.float32)
    np.testing.assert_allclose(
        np.asarray(conv3x3_gemm(x, w, None, interpret=True)),
        np.asarray(_ref(x, w, None, False)), rtol=1e-5, atol=1e-4)


def test_conv3x3_supported_guard():
    # odd H (no row block divides), tiny C, and non-4d all route to XLA
    assert not conv3x3_gemm_supported((1, 7, 8, 64), 64, jnp.float32)
    assert not conv3x3_gemm_supported((1, 8, 8, 32), 64, jnp.float32)
    assert not conv3x3_gemm_supported((8, 8, 64), 64, jnp.float32)


def test_egm_conv_impl_env_route(monkeypatch):
    """$EGM_CONV_IMPL=pallas routes folded ConvBNReLU/BasicConv through the
    kernel with an identical param tree and matching outputs."""
    from egm_unet_tpu.nn.layers import BasicConv, ConvBNReLU

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 64)), jnp.float32)

    m = ConvBNReLU(64, fold_bn=True)
    v = m.init(jax.random.key(0), x, False)
    ref = m.apply(v, x, False)
    monkeypatch.setenv("EGM_CONV_IMPL", "pallas")
    v2 = m.init(jax.random.key(0), x, False)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)
    out = m.apply(v, x, False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)

    b = BasicConv(64, 3, padding=1, fold_bn=True)
    monkeypatch.delenv("EGM_CONV_IMPL")
    vb = b.init(jax.random.key(1), x, False)
    refb = b.apply(vb, x, False)
    monkeypatch.setenv("EGM_CONV_IMPL", "pallas")
    outb = b.apply(vb, x, False)
    np.testing.assert_allclose(np.asarray(outb), np.asarray(refb),
                               rtol=1e-5, atol=1e-4)


def test_egm_conv_sites_filter(monkeypatch):
    """$EGM_CONV_SITES restricts the pallas routing to matching call sites."""
    import egm_unet_tpu.ops.pallas.conv3x3 as k
    from egm_unet_tpu.nn.layers import ConvBNReLU

    hits = []
    real = k.conv3x3_gemm
    monkeypatch.setattr(k, "conv3x3_gemm",
                        lambda *a, **kw: hits.append(1) or real(*a, **kw))
    x = jnp.zeros((1, 8, 8, 64), jnp.float32)
    m = ConvBNReLU(64, fold_bn=True)
    v = m.init(jax.random.key(0), x, False)

    monkeypatch.setenv("EGM_CONV_IMPL", "pallas")
    monkeypatch.setenv("EGM_CONV_SITES", "down1/conv2")  # no match: top level
    m.apply(v, x, False)
    assert not hits
    monkeypatch.setenv("EGM_CONV_SITES", "")  # empty = all sites
    m.apply(v, x, False)
    assert hits


def _pair_ref(x, w1, b1, w2, b2):
    y = _ref(x, w1, b1, True)
    return _ref(y, w2, b2, True)


@pytest.mark.parametrize("shape,cm,co", [
    ((2, 16, 16, 32), 64, 64),     # down1 pair (C 32 -> 64 -> 64)
    ((1, 8, 8, 64), 128, 128),     # down2 pair
    ((1, 8, 10, 64), 32, 32),      # W not sublane-aligned
    ((1, 12, 16, 128), 64, 96),    # rb=4 row blocks, Cm != Co
])
def test_conv3x3_pair_parity(shape, cm, co):
    from egm_unet_tpu.ops.pallas.conv3x3 import (conv3x3_pair_gemm,
                                                 conv3x3_pair_supported)

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((3, 3, shape[-1], cm)) * 0.1,
                     jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((cm,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((3, 3, cm, co)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((co,)) * 0.1, jnp.float32)
    assert conv3x3_pair_supported(shape, cm, co, jnp.float32)
    out = conv3x3_pair_gemm(x, w1, b1, w2, b2, interpret=True)
    ref = _pair_ref(x, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_conv3x3_pair_supported_guard():
    from egm_unet_tpu.ops.pallas.conv3x3 import conv3x3_pair_supported

    assert not conv3x3_pair_supported((1, 7, 8, 64), 64, 64, jnp.float32)
    assert not conv3x3_pair_supported((1, 8, 8, 3), 32, 32, jnp.float32)
    assert not conv3x3_pair_supported((8, 8, 64), 64, 64, jnp.float32)


def test_egm_conv_pair_env_route(monkeypatch):
    """$EGM_CONV_IMPL=pallas-pair fuses a folded DoubleConv with an
    identical param tree and matching outputs."""
    import egm_unet_tpu.ops.pallas.conv3x3 as k
    from egm_unet_tpu.nn.layers import DoubleConv

    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 32)), jnp.float32)
    m = DoubleConv(64, fold_bn=True)
    v = m.init(jax.random.key(0), x, False)
    ref = m.apply(v, x, False)

    hits = []
    real = k.conv3x3_pair_gemm
    monkeypatch.setattr(k, "conv3x3_pair_gemm",
                        lambda *a, **kw: hits.append(1) or real(*a, **kw))
    monkeypatch.setenv("EGM_CONV_IMPL", "pallas-pair")
    v2 = m.init(jax.random.key(0), x, False)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)
    out = m.apply(v, x, False)
    assert hits
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_egm_conv_pair_decoder_route(monkeypatch):
    """pallas-pair on a decoder Up stage: XLA upsample+concat feeding the
    fused conv pair matches the unfused folded graph."""
    import egm_unet_tpu.ops.pallas.conv3x3 as k
    from egm_unet_tpu.models.unet import Up

    rng = np.random.default_rng(9)
    x1 = jnp.asarray(rng.standard_normal((1, 8, 8, 32)), jnp.float32)
    x2 = jnp.asarray(rng.standard_normal((1, 16, 16, 32)), jnp.float32)
    m = Up(32, bilinear=True, fold_bn=True)
    v = m.init(jax.random.key(0), x1, x2, False)
    ref = m.apply(v, x1, x2, False)

    hits = []
    real = k.conv3x3_pair_gemm
    monkeypatch.setattr(k, "conv3x3_pair_gemm",
                        lambda *a, **kw: hits.append(1) or real(*a, **kw))
    monkeypatch.setenv("EGM_CONV_IMPL", "pallas-pair")
    out = m.apply(v, x1, x2, False)
    assert hits
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("relu", [False, True])
def test_conv3x3_dots_parity(relu):
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 9, 11, 16)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 16, 24)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((24,)) * 0.1, jnp.float32)
    np.testing.assert_allclose(
        np.asarray(conv3x3_dots(x, w, b, relu=relu)),
        np.asarray(_ref(x, w, b, relu)), rtol=1e-5, atol=1e-4)
