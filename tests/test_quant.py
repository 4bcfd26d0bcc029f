"""int8 serving quantization (ops/quant.py) — scheme invariants and the
off-parity contract on a small EGM graph.

The reference has no quantized path (fp16 ``.half()`` only, ref:
predict.py:35-44); this is a beyond-reference serving mode, so the test
asserts *agreement statistics*, not numerical parity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egm_unet_tpu.ops.quant import (current_quant_mode, int8_conv, quantized,
                                    quantize_weight_per_channel)


def test_weight_quantization_roundtrip():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((3, 3, 8, 16)), jnp.float32)
    wq, scale = quantize_weight_per_channel(w)
    assert wq.dtype == jnp.int8 and scale.shape == (16,)
    # per-channel max maps to +-127 and dequantization error < 1 step
    deq = wq.astype(jnp.float32) * scale
    assert float(jnp.max(jnp.abs(deq - w))) <= float(jnp.max(scale)) * 0.5 + 1e-6
    assert int(jnp.max(jnp.abs(wq.astype(jnp.int32)))) == 127


def test_int8_conv_close_to_f32():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 8)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 8, 16)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((16,)) * 0.1, jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    out = int8_conv(x, w, b, padding=((1, 1), (1, 1)))
    # dynamic per-tensor int8: relative error ~1% of the activation scale
    rel = float(jnp.max(jnp.abs(out - ref))) / float(jnp.max(jnp.abs(ref)))
    assert rel < 0.05, rel


def test_quant_context_scoping():
    assert current_quant_mode() is None
    with quantized("int8"):
        assert current_quant_mode() == "int8"
    assert current_quant_mode() is None


def test_double_conv_agrees_under_int8():
    """Module-level int8-vs-f32 agreement + identical param tree.

    Kept at DoubleConv granularity: XLA's *CPU* backend lowers int8 convs
    pathologically slowly (minutes per conv), so the full-graph agreement
    check lives in bench.py --mode int8 on the TPU (where it compiles fine)
    — verified there with >99.9% pixel agreement (PERF.md round 3)."""
    from egm_unet_tpu.nn.layers import DoubleConv

    m = DoubleConv(8, fold_bn=True)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 16, 16, 4)),
                    jnp.float32)
    v = m.init(jax.random.key(0), x, False)
    ref = m.apply(v, x, False)
    with quantized("int8"):
        q = m.apply(v, x, False)
        v2 = m.init(jax.random.key(0), x, False)
    rel = float(jnp.max(jnp.abs(q - ref))) / (float(jnp.max(jnp.abs(ref))) + 1e-9)
    assert rel < 0.1, rel
    # param tree must be identical between the two paths (same checkpoint)
    assert (jax.tree_util.tree_structure(v2)
            == jax.tree_util.tree_structure(v))


def test_calibrated_static_scales():
    """calibrate_quant_scales produces a quant_scales tree that the int8
    path consumes (static per-site scales; quantize fuses into producers on
    TPU — the shipping serving config)."""
    from egm_unet_tpu.nn.layers import DoubleConv
    from egm_unet_tpu.ops.quant import calibrate_quant_scales

    m = DoubleConv(8, fold_bn=True)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 4)), jnp.float32)
    v = m.init(jax.random.key(0), x, False)
    scales = calibrate_quant_scales(m, v, [x], train=False)
    leaves = jax.tree_util.tree_leaves(scales)
    # 2 conv input scales (act_scale) + 2 qstore output-storage scales
    # (out_scale, the int8df sites) per DoubleConv
    assert len(leaves) == 4 and all(float(s) > 0 for s in leaves)

    ref = m.apply(v, x, False)
    with quantized("int8"):
        q = m.apply({**v, "quant_scales": scales}, x, False)
    rel = float(jnp.max(jnp.abs(q - ref))) / (float(jnp.max(jnp.abs(ref))) + 1e-9)
    assert rel < 0.1, rel
    # a fresh batch within the calibrated range also works (static scales)
    x2 = jnp.asarray(rng.standard_normal((2, 16, 16, 4)) * 0.5, jnp.float32)
    with quantized("int8"):
        q2 = m.apply({**v, "quant_scales": scales}, x2, False)
    assert np.isfinite(np.asarray(q2)).all()
