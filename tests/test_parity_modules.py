"""Module-level numeric parity: flax (NHWC) vs the torch oracle (NCHW).

Every EGM building block is initialized in flax, its weights (and randomized
BN running stats) are exported into the torch oracle, and eval-mode forwards
are compared.  This is the acceptance test for TPU-vs-reference formula
fidelity (SURVEY.md §4).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from egm_unet_tpu.models.egm_unet import EGMUNet
from egm_unet_tpu.nn.attention import MCAGate, MCALayer, RecursiveGatedAttention
from egm_unet_tpu.nn.grfb import GRFB, EdgeEnhancedGRFB, FusionConv
from egm_unet_tpu.nn.layers import EdgeAwareFeatureEnhancer

from tests import torch_oracle as T

torch.set_grad_enabled(False)


def randomize_stats(variables, seed=1):
    """Randomize BN running stats & affine params so eval-mode comparisons
    exercise the normalization math."""
    rng = np.random.default_rng(seed)

    def rand_like(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        a = np.asarray(leaf)
        if name == "var":
            return jnp.asarray(rng.uniform(0.5, 2.0, a.shape).astype(a.dtype))
        if name == "mean":
            return jnp.asarray(rng.normal(0, 0.3, a.shape).astype(a.dtype))
        if name == "scale":
            return jnp.asarray(rng.uniform(0.7, 1.3, a.shape).astype(a.dtype))
        return leaf

    return jax.tree_util.tree_map_with_path(rand_like, variables)


def nhwc(x):
    return jnp.asarray(x)


def to_torch(x):
    return torch.from_numpy(np.ascontiguousarray(np.transpose(x, (0, 3, 1, 2))))


def from_torch(t):
    return np.transpose(t.numpy(), (0, 2, 3, 1))


def check(fx_out, t_out, rtol=2e-4, atol=2e-4):
    np.testing.assert_allclose(np.asarray(fx_out), from_torch(t_out), rtol=rtol, atol=atol)


@pytest.mark.parametrize("axis", [1, 2, 3])
def test_mcagate(rng, axis):
    c, h, w = 16, 10, 12
    x = rng.standard_normal((2, h, w, c), dtype=np.float32)
    m = MCAGate(axis=axis, k_size=3)
    v = m.init(jax.random.key(0), nhwc(x))
    out = m.apply(v, nhwc(x))

    t = T.TMCAGate(3)
    T.set_mcagate(t, v["params"])
    tx = to_torch(x)
    # torch oracle gates along dim 1 of its input; permute to put `axis` there
    perm = {1: (0, 2, 1, 3), 2: (0, 3, 2, 1), 3: (0, 1, 2, 3)}[axis]
    if axis == 1:
        ref = t(tx.permute(0, 2, 1, 3)).permute(0, 2, 1, 3)
    elif axis == 2:
        ref = t(tx.permute(0, 3, 2, 1)).permute(0, 3, 2, 1)
    else:
        ref = t(tx)
    check(out, ref)


def test_mcagate_native_math(rng, monkeypatch):
    """EGM_GATE_MATH=native (serving knob, PERF.md round 3) computes the
    pooled statistics in the activation dtype; the gate must stay close to
    the f32 reference — loose bf16-level tolerance, exact shape/finite."""
    c, h, w = 16, 10, 12
    x = rng.standard_normal((2, h, w, c), dtype=np.float32)
    m = MCAGate(axis=3, k_size=3)
    v = m.init(jax.random.key(0), nhwc(x))
    ref = m.apply(v, nhwc(x))
    xb = jnp.asarray(nhwc(x), dtype=jnp.bfloat16)
    monkeypatch.setenv("EGM_GATE_MATH", "native")
    out = m.apply(v, xb)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, dtype=np.float32),
                               np.asarray(ref), rtol=0.05, atol=0.05)


def test_mcalayer(rng):
    c = 32
    x = rng.standard_normal((2, 12, 12, c), dtype=np.float32)
    m = MCALayer()
    v = m.init(jax.random.key(0), nhwc(x))
    out = m.apply(v, nhwc(x))
    t = T.TMCALayer(c)
    T.set_mca(t, v["params"])
    check(out, t(to_torch(x)))


def test_rga(rng):
    dim = 64
    x = rng.standard_normal((2, 8, 8, dim), dtype=np.float32)
    m = RecursiveGatedAttention(dim=dim)
    v = m.init(jax.random.key(0), nhwc(x))
    out = m.apply(v, nhwc(x))
    t = T.TRGA(dim)
    T.set_rga(t, v["params"])
    check(out, t(to_torch(x)))


def test_edge_aware(rng):
    x = rng.standard_normal((2, 14, 14, 8), dtype=np.float32)
    m = EdgeAwareFeatureEnhancer()
    v = randomize_stats(m.init(jax.random.key(0), nhwc(x)))
    out = m.apply(v, nhwc(x))
    t = T.TEdgeAware(8)
    t.eval()
    T.set_edge_aware(t, v["params"], v["batch_stats"])
    check(out, t(to_torch(x)))


def test_fusion_conv(rng):
    cin, cout = 20, 16
    x1 = rng.standard_normal((2, 9, 9, cin), dtype=np.float32)
    m = FusionConv(cout)
    v = m.init(jax.random.key(0), nhwc(x1), nhwc(x1))
    out = m.apply(v, nhwc(x1), nhwc(x1))
    t = T.TFusionConv(cin, cout)
    t.eval()
    T.set_fusion(t, v["params"])
    check(out, t(to_torch(x1), to_torch(x1)))


def test_edge_enhanced_grfb(rng):
    c = 32
    x = rng.standard_normal((1, 16, 16, c), dtype=np.float32)
    m = EdgeEnhancedGRFB(features=c, visual=2)  # small dilation for 16x16
    v = randomize_stats(m.init(jax.random.key(0), nhwc(x), train=True))
    out = m.apply(v, nhwc(x))
    t = T.TEGRFB(c, c, visual=2)
    t.eval()
    T.set_egrfb(t, v["params"], v["batch_stats"])
    check(out, t(to_torch(x)), rtol=5e-4, atol=5e-4)


def test_grfb(rng):
    c = 32
    x = rng.standard_normal((1, 16, 16, c), dtype=np.float32)
    m = GRFB(features=c, visual=2)
    v = randomize_stats(m.init(jax.random.key(0), nhwc(x), train=True))
    out = m.apply(v, nhwc(x))
    t = T.TGRFB(c, c, visual=2)
    t.eval()
    T.set_grfb(t, v["params"], v["batch_stats"])
    check(out, t(to_torch(x)), rtol=5e-4, atol=5e-4)


@pytest.mark.parametrize("cfg", [
    dict(block="edge", use_rga=True, use_mca=True),   # EGM-UNet A+B+C
    dict(block="grfb", use_rga=False, use_mca=False),  # GRFB-UNet baseline
])
def test_full_egm_unet_parity(rng, cfg):
    """End-to-end eval-mode forward of the full model vs the torch oracle."""
    base_c = 16
    x = rng.standard_normal((1, 64, 64, 3), dtype=np.float32)
    m = EGMUNet(base_c=base_c, **cfg)
    v = randomize_stats(m.init(jax.random.key(0), nhwc(x), train=True))
    out = m.apply(v, nhwc(x))["out"]

    t = T.TEGMUNet(base_c=base_c, **cfg)
    t.eval()
    T.set_egm_unet(t, v)
    ref = t(to_torch(x))["out"]
    check(out, ref, rtol=1e-3, atol=1e-3)
