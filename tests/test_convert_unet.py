"""EGM-UNet torch-checkpoint converter: structural round trip.

Builds a fake state dict with the reference's module naming/shapes
(src/EGM-UNet.py tree), converts it, and checks the resulting variables
match ``EGMUNet.init``'s tree exactly and run a forward.  (Numeric parity
against real reference weights needs the Baidu-pan checkpoints, which ship
out-of-band — the per-module oracle tests cover the math.)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from egm_unet_tpu.models import create_model
from egm_unet_tpu.utils.convert_unet import egm_unet_from_torch


def fake_reference_state_dict(base_c=16, in_ch=3, num_classes=2, use_mca=True):
    """Enumerate the reference's state-dict keys with correct shapes."""
    rng = np.random.default_rng(0)
    sd = {}

    def conv(key, cin, cout, k=3, bias=False):
        sd[f"{key}.weight"] = rng.standard_normal((cout, cin, k, k)).astype(np.float32) * 0.05
        if bias:
            sd[f"{key}.bias"] = rng.standard_normal((cout,)).astype(np.float32) * 0.05

    def grouped(key, cin, cout, groups, k=3):
        sd[f"{key}.weight"] = rng.standard_normal(
            (cout, cin // groups, k, k)).astype(np.float32) * 0.05

    def bn(key, c):
        sd[f"{key}.weight"] = rng.uniform(0.7, 1.3, c).astype(np.float32)
        sd[f"{key}.bias"] = rng.standard_normal(c).astype(np.float32) * 0.05
        sd[f"{key}.running_mean"] = rng.standard_normal(c).astype(np.float32) * 0.1
        sd[f"{key}.running_var"] = rng.uniform(0.5, 2.0, c).astype(np.float32)

    def basic(key, cin, cout, k=3, groups=1):
        if groups > 1:
            grouped(f"{key}.conv", cin, cout, groups, k)
        else:
            conv(f"{key}.conv", cin, cout, k)
        bn(f"{key}.bn", cout)

    def double_conv(prefix, cin, cout, mid=None):
        mid = mid or cout
        conv(f"{prefix}.0", cin, mid)
        bn(f"{prefix}.1", mid)
        conv(f"{prefix}.3", mid, cout)
        bn(f"{prefix}.4", cout)

    def edge_aware(prefix, c):
        conv(f"{prefix}.weight_generator.0", c, c, 1, bias=True)
        bn(f"{prefix}.weight_generator.1", c)

    def mcagate(prefix, k):
        sd[f"{prefix}.conv.weight"] = rng.standard_normal((1, 1, 1, k)).astype(np.float32)
        sd[f"{prefix}.weight"] = rng.random(2).astype(np.float32)

    def mca(prefix, c):
        import math
        temp = round(abs((math.log2(c) - 1) / 1.5))
        k = max(temp if temp % 2 else temp - 1, 1)
        mcagate(f"{prefix}.h_cw", 3)
        mcagate(f"{prefix}.w_hc", 3)
        mcagate(f"{prefix}.c_hw", k)

    def fusion(prefix, cin, cout):
        dim = cout // 4
        conv(f"{prefix}.down", 2 * cin, dim, 1, bias=True)
        conv(f"{prefix}.conv_3x3", dim, dim, 3, bias=True)
        conv(f"{prefix}.conv_5x5", dim, dim, 5, bias=True)
        conv(f"{prefix}.conv_7x7", dim, dim, 7, bias=True)
        conv(f"{prefix}.spatial_attention.conv1", 2, 1, 7)
        conv(f"{prefix}.channel_attention.fc.0", dim, dim // 4, 1)
        conv(f"{prefix}.channel_attention.fc.2", dim // 4, dim, 1)
        conv(f"{prefix}.up", dim, cout, 1, bias=True)

    def egrfb(prefix, cin, cout):
        i = max(cin // 8, 4)
        edge_aware(f"{prefix}.edge_enhancer", cin)
        basic(f"{prefix}.branch_dir.0", cin, 2 * i, 1)
        basic(f"{prefix}.branch_dir.1", 2 * i, 2 * i, 3)
        basic(f"{prefix}.branch_dir.2", 2 * i, 2 * i, 1)
        basic(f"{prefix}.branch_edge.0", cin, i, 1)
        edge_aware(f"{prefix}.branch_edge.1", i)
        basic(f"{prefix}.branch_edge.2", i, 2 * i, 3, groups=i)
        basic(f"{prefix}.branch_edge.3", 2 * i, 2 * i, 3)
        basic(f"{prefix}.branch_edge.4", 2 * i, 2 * i, 1)
        basic(f"{prefix}.branch_ctx.0", cin, i, 3)
        basic(f"{prefix}.branch_ctx.1", i, 2 * i, 3, groups=2)
        basic(f"{prefix}.branch_ctx.2", 2 * i, 2 * i, 3)
        basic(f"{prefix}.branch_ctx.3", 2 * i, 2 * i, 1)
        fusion(f"{prefix}.fusion_conv", cin + 6 * i, cout)
        basic(f"{prefix}.shortcut", cin, cout, 1)
        conv(f"{prefix}.target_enhancer.0", cout, 3, 3, bias=True)

    def rga(prefix, dim):
        split = [dim // 2, dim // 2]
        conv(f"{prefix}.proj_in", dim, split[0] + sum(split), 1, bias=True)
        grouped(f"{prefix}.dwconv", sum(split), sum(split), sum(split), 3)
        sd[f"{prefix}.dwconv.bias"] = rng.standard_normal(sum(split)).astype(np.float32) * 0.05
        sd[f"{prefix}.scale"] = np.float32(1.0)
        for i2, s in enumerate(split):
            hid = max(s // 8, 8)
            conv(f"{prefix}.gate_convs.{i2}.0", s, hid, 1, bias=True)
            conv(f"{prefix}.gate_convs.{i2}.2", hid, 1, 1, bias=True)
        conv(f"{prefix}.transform_convs.0", split[0], split[1], 1, bias=True)
        conv(f"{prefix}.proj_out", split[-1], dim, 1, bias=True)

    c = base_c
    double_conv("in_conv", in_ch, c)
    chans = [(c, 2 * c), (2 * c, 4 * c), (4 * c, 8 * c), (8 * c, 8 * c)]
    for k, (ci, co) in enumerate(chans, start=1):
        prefix = f"down{k}.1"
        conv(f"{prefix}.0", ci, co)
        bn(f"{prefix}.1", co)
        mca(f"{prefix}.3", co)
        conv(f"{prefix}.4", co, co)
        bn(f"{prefix}.5", co)
        egrfb(f"{prefix}.7", co, co)
    rga("attn1", 8 * c)
    ups = [(16 * c, 4 * c), (8 * c, 2 * c), (4 * c, c), (2 * c, c)]
    for k, (ci, co) in enumerate(ups, start=1):
        double_conv(f"up{k}.conv", ci, co, mid=ci // 2)
    conv("out_conv.0", c, num_classes, 1, bias=True)
    return sd


def tree_paths(tree, prefix=""):
    out = set()
    for k, v in tree.items():
        if isinstance(v, dict):
            out |= tree_paths(v, f"{prefix}{k}/")
        else:
            out.add(f"{prefix}{k}:{tuple(np.asarray(v).shape)}")
    return out


def test_converter_tree_matches_init():
    base_c = 16
    sd = fake_reference_state_dict(base_c=base_c)
    params, stats = egm_unet_from_torch(sd)

    model = create_model("egm_unet", base_c=base_c)
    ref = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)), train=True)

    assert tree_paths(params) == tree_paths(ref["params"])
    assert tree_paths(stats) == tree_paths(ref["batch_stats"])

    out = model.apply({"params": params, "batch_stats": stats},
                      jnp.ones((1, 64, 64, 3)), train=False)
    assert out["out"].shape == (1, 64, 64, 2)
    assert np.isfinite(np.asarray(out["out"])).all()
