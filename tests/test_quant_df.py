"""int8 *dataflow* storage quantization (ops/quant.py requant_store/qstore).

Serving-only, off-parity mode ``int8df``: every full-size stage tensor is
stored in HBM as int8/uint8 behind an optimization_barrier and dequantized
inline in consumers; compute stays bf16/f32.  The reference has no
quantized path at all (fp16 ``.half()`` only, ref: predict.py:35-44).
These tests pin the scheme invariants on CPU; throughput and the
full-graph mask agreement are measured on TPU by ``bench.py --mode int8df``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egm_unet_tpu.ops.quant import (calibrate_quant_scales, quantized,
                                    requant_store)


def test_requant_store_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    # unsigned (post-ReLU) site
    x = jnp.asarray(np.abs(rng.standard_normal((4, 8, 8, 4))), jnp.float32)
    s = jnp.asarray(float(jnp.max(x)) / 255.0, jnp.float32)
    y = requant_store(x, s, signed=False)
    assert float(jnp.max(jnp.abs(y - x))) <= float(s) * 0.5 + 1e-6
    # signed site
    xs = jnp.asarray(rng.standard_normal((4, 8, 8, 4)), jnp.float32)
    ss = jnp.asarray(float(jnp.max(jnp.abs(xs))) / 127.0, jnp.float32)
    ys = requant_store(xs, ss, signed=True)
    assert float(jnp.max(jnp.abs(ys - xs))) <= float(ss) * 0.5 + 1e-6


def test_qstore_identity_outside_quant_mode():
    """Outside int8df/calibrate the site hook is a no-op returning the same
    object (callers detect an inactive site with ``is``)."""
    from egm_unet_tpu.nn.layers import ConvBNReLU

    m = ConvBNReLU(8, fold_bn=True)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 8, 8, 4)),
                    jnp.float32)
    v = m.init(jax.random.key(0), x, False)
    ref = m.apply(v, x, False)
    assert np.isfinite(np.asarray(ref)).all()


def test_int8df_double_conv_agreement_and_param_tree():
    from egm_unet_tpu.nn.layers import DoubleConv

    m = DoubleConv(8, fold_bn=True)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 4)), jnp.float32)
    v = m.init(jax.random.key(0), x, False)
    scales = calibrate_quant_scales(m, v, [x], train=False)
    ref = m.apply(v, x, False)
    with quantized("int8df"):
        q = m.apply({**v, "quant_scales": scales}, x, False)
        v2 = m.init(jax.random.key(0), x, False)
    rel = float(jnp.max(jnp.abs(q - ref))) / (float(jnp.max(jnp.abs(ref))) + 1e-9)
    # storage quantization error only (convs are exact bf16/f32)
    assert rel < 0.05, rel
    # the checkpoint is mode-agnostic
    assert (jax.tree_util.tree_structure(v2)
            == jax.tree_util.tree_structure(v))


def test_int8df_full_egm_graph_mask_agreement():
    """Calibrate + int8df over the full A+B+C graph (tiny config): argmax
    masks agree with the full-precision graph on nearly all pixels.
    CPU-safe: int8df keeps convs bf16/f32 (no XLA-CPU int8 conv lowering)."""
    from egm_unet_tpu.models.egm_unet import EGMUNet

    m = EGMUNet(base_c=8, num_classes=2, fold_bn=True)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    v = m.init(jax.random.key(0), x, False)
    scales = calibrate_quant_scales(m, v, [x], train=False)
    n_scales = len(jax.tree_util.tree_leaves(scales))
    assert n_scales > 20, n_scales  # conv inputs + storage sites graph-wide

    ref = m.apply(v, x, False)["out"]
    with quantized("int8df"):
        q = m.apply({**v, "quant_scales": scales}, x, False)["out"]
    agree = float((jnp.argmax(ref, -1) == jnp.argmax(q, -1)).mean())
    assert agree > 0.95, agree


def test_qstore_site_selection(monkeypatch):
    """$EGM_QSTORE_SITES restricts which storage sites quantize: with a
    non-matching spec the int8df output is bit-identical to full precision;
    with 'all' it differs (quantization applied)."""
    from egm_unet_tpu.nn.layers import DoubleConv

    m = DoubleConv(8, fold_bn=True)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 4)), jnp.float32)
    v = m.init(jax.random.key(0), x, False)
    scales = calibrate_quant_scales(m, v, [x], train=False)
    ref = m.apply(v, x, False)

    monkeypatch.setenv("EGM_QSTORE_SITES", "no-such-site")
    with quantized("int8df"):
        q_off = m.apply({**v, "quant_scales": scales}, x, False)
    np.testing.assert_array_equal(np.asarray(q_off), np.asarray(ref))

    monkeypatch.setenv("EGM_QSTORE_SITES", "all")
    with quantized("int8df"):
        q_on = m.apply({**v, "quant_scales": scales}, x, False)
    assert float(jnp.max(jnp.abs(q_on - ref))) > 0.0


def test_up_split_matches_concat(monkeypatch):
    """EGM_UP_SPLIT=1: conv(cat([x2, up2x(x1)])) computed as two partial
    convs with summed accumulators — the same linear operator, so outputs
    match the concat form to float tolerance."""
    from egm_unet_tpu.nn.layers import ConvBNReLU

    rng = np.random.default_rng(4)
    x1 = jnp.asarray(rng.standard_normal((2, 8, 8, 16)), jnp.float32)
    x2 = jnp.asarray(rng.standard_normal((2, 16, 16, 8)), jnp.float32)
    m = ConvBNReLU(12, fold_bn=True)
    v = m.init(jax.random.key(0), None, False, up_pair=(x2, x1))
    monkeypatch.delenv("EGM_UP_SPLIT", raising=False)
    ref = m.apply(v, None, False, up_pair=(x2, x1))
    monkeypatch.setenv("EGM_UP_SPLIT", "1")
    split = m.apply(v, None, False, up_pair=(x2, x1))
    np.testing.assert_allclose(np.asarray(split), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_apply_ship_sites_default(monkeypatch):
    """Serving entry points default $EGM_QSTORE_SITES to the validated
    selective-site config (all-sites measured -7%); explicit env wins."""
    from egm_unet_tpu.ops.quant import (SHIP_QSTORE_SITES, SHIP_UP_SPLIT,
                                        apply_ship_sites_default)

    monkeypatch.delenv("EGM_QSTORE_SITES", raising=False)
    monkeypatch.delenv("EGM_UP_SPLIT", raising=False)
    apply_ship_sites_default()
    import os

    assert os.environ["EGM_QSTORE_SITES"] == SHIP_QSTORE_SITES
    assert os.environ["EGM_UP_SPLIT"] == SHIP_UP_SPLIT
    monkeypatch.setenv("EGM_QSTORE_SITES", "custom:")
    apply_ship_sites_default()
    assert os.environ["EGM_QSTORE_SITES"] == "custom:"
