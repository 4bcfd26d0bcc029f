"""GRFB/EGM-UNet checkpoint converter: the reference's torch ``.pth`` state
dicts (saved by ref train.py:152-156 as ``{'model': state_dict, ...}``) ->
our flax variables.

Reference module tree (names as produced by src/EGM-UNet.py):
  in_conv.{0,1,3,4}                 DoubleConv: conv/bn/relu x2
  down{k}.1.{0,1,4,5}               DoubleConv1 conv/bn (Sequential idx)
  down{k}.1.3.(h_cw|w_hc|c_hw)      MCALayer gates (conv, weight)
  down{k}.1.7.*                     EdgeEnhancedGRFB
  attn1.*                           RecursiveGatedAttention
  up{k}.conv.{0,1,3,4}              decoder DoubleConv
  out_conv.0                        1x1 conv

Layout maps: conv OIHW -> HWIO, conv1d MCA gate (1,1,1,k) -> (k,).
Also provides the reverse check used by tests (shape-compatible fake dicts).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def _t(w):
    return np.asarray(w, np.float32)


def _conv(sd, key):
    out = {"Conv_0": {"kernel": _t(sd[f"{key}.weight"]).transpose(2, 3, 1, 0)}}
    if f"{key}.bias" in sd:
        out["Conv_0"]["bias"] = _t(sd[f"{key}.bias"])
    return out


def _bn_params(sd, key):
    return {"BatchNorm_0": {"scale": _t(sd[f"{key}.weight"]),
                            "bias": _t(sd[f"{key}.bias"])}}


def _bn_stats(sd, key):
    return {"BatchNorm_0": {"mean": _t(sd[f"{key}.running_mean"]),
                            "var": _t(sd[f"{key}.running_var"])}}


def _convbnrelu(sd, conv_key, bn_key):
    p = {"Conv_0": _conv(sd, conv_key), "BatchNorm_0": _bn_params(sd, bn_key)}
    s = {"BatchNorm_0": _bn_stats(sd, bn_key)}
    return p, s


def _double_conv(sd, prefix):
    p1, s1 = _convbnrelu(sd, f"{prefix}.0", f"{prefix}.1")
    p2, s2 = _convbnrelu(sd, f"{prefix}.3", f"{prefix}.4")
    return ({"ConvBNReLU_0": p1, "ConvBNReLU_1": p2},
            {"ConvBNReLU_0": s1, "ConvBNReLU_1": s2})


def _basic_conv(sd, prefix):
    p, s = _convbnrelu(sd, f"{prefix}.conv", f"{prefix}.bn")
    return p, s


def _edge_aware(sd, prefix):
    p = {"Conv_0": _conv(sd, f"{prefix}.weight_generator.0"),
         "BatchNorm_0": _bn_params(sd, f"{prefix}.weight_generator.1")}
    s = {"BatchNorm_0": _bn_stats(sd, f"{prefix}.weight_generator.1")}
    return p, s


def _mcagate(sd, prefix):
    # torch conv (1,1,1,k) -> our (k,)
    k = _t(sd[f"{prefix}.conv.weight"]).reshape(-1)
    return {"conv": k, "weight": _t(sd[f"{prefix}.weight"])}


def _mca(sd, prefix):
    return {"h_cw": _mcagate(sd, f"{prefix}.h_cw"),
            "w_hc": _mcagate(sd, f"{prefix}.w_hc"),
            "c_hw": _mcagate(sd, f"{prefix}.c_hw")}


def _fusion(sd, prefix):
    def raw(key):
        return _t(sd[f"{key}.weight"]).transpose(2, 3, 1, 0)

    return {
        "down_kernel": raw(f"{prefix}.down"),
        "down_bias": _t(sd[f"{prefix}.down.bias"]),
        "conv3_kernel": raw(f"{prefix}.conv_3x3"),
        "conv3_bias": _t(sd[f"{prefix}.conv_3x3.bias"]),
        "conv5_kernel": raw(f"{prefix}.conv_5x5"),
        "conv5_bias": _t(sd[f"{prefix}.conv_5x5.bias"]),
        "conv7_kernel": raw(f"{prefix}.conv_7x7"),
        "conv7_bias": _t(sd[f"{prefix}.conv_7x7.bias"]),
        "spatial": {"Conv_0": _conv(sd, f"{prefix}.spatial_attention.conv1")},
        "channel": {"fc_down": _conv(sd, f"{prefix}.channel_attention.fc.0"),
                    "fc_up": _conv(sd, f"{prefix}.channel_attention.fc.2")},
        "up": _conv(sd, f"{prefix}.up"),
    }


def _egrfb(sd, prefix):
    p: Dict = {}
    s: Dict = {}
    p["edge_enhancer"], s["edge_enhancer"] = _edge_aware(sd, f"{prefix}.edge_enhancer")
    branch_map = {
        "dir0": f"{prefix}.branch_dir.0", "dir1": f"{prefix}.branch_dir.1",
        "dir2": f"{prefix}.branch_dir.2",
        "edge0": f"{prefix}.branch_edge.0",
        "edge1": f"{prefix}.branch_edge.2", "edge2": f"{prefix}.branch_edge.3",
        "edge3": f"{prefix}.branch_edge.4",
        "ctx0": f"{prefix}.branch_ctx.0", "ctx1": f"{prefix}.branch_ctx.1",
        "ctx2": f"{prefix}.branch_ctx.2", "ctx3": f"{prefix}.branch_ctx.3",
        "shortcut": f"{prefix}.shortcut",
    }
    for ours, theirs in branch_map.items():
        p[ours], s[ours] = _basic_conv(sd, theirs)
    p["edge_eafe"], s["edge_eafe"] = _edge_aware(sd, f"{prefix}.branch_edge.1")
    p["fusion"] = _fusion(sd, f"{prefix}.fusion_conv")
    p["target_enhancer"] = _conv(sd, f"{prefix}.target_enhancer.0")
    return p, s


def _rga(sd, prefix, order: int = 2):
    p = {"proj_in": _conv(sd, f"{prefix}.proj_in"),
         "dwconv": _conv(sd, f"{prefix}.dwconv"),
         "proj_out": _conv(sd, f"{prefix}.proj_out"),
         # reference scale is a 0-d tensor; tolerate (1,) exports too
         "scale": _t(sd[f"{prefix}.scale"]).reshape(())}
    for i in range(order):
        p[f"gate{i}_down"] = _conv(sd, f"{prefix}.gate_convs.{i}.0")
        p[f"gate{i}_up"] = _conv(sd, f"{prefix}.gate_convs.{i}.2")
        if i < order - 1:
            p[f"transform{i}"] = _conv(sd, f"{prefix}.transform_convs.{i}")
    return p


def egm_unet_from_torch(sd: Dict[str, np.ndarray],
                        block: Optional[str] = "edge",
                        use_rga: bool = True,
                        use_mca: bool = True):
    """Full GRFBUNet state dict -> (params, batch_stats) for EGMUNet."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params: Dict = {}
    stats: Dict = {}

    params["in_conv"], stats["in_conv"] = _double_conv(sd, "in_conv")

    for k in range(1, 5):
        prefix = f"down{k}.1"
        p1, s1 = _convbnrelu(sd, f"{prefix}.0", f"{prefix}.1")
        if use_mca:
            idx_c2, idx_b2, idx_block = 4, 5, 7
        else:  # yuan variant: Sequential(conv,bn,relu,conv,bn,relu,block)
            idx_c2, idx_b2, idx_block = 3, 4, 6
        p2, s2 = _convbnrelu(sd, f"{prefix}.{idx_c2}", f"{prefix}.{idx_b2}")
        dp = {"conv1": p1, "conv2": p2}
        ds = {"conv1": s1, "conv2": s2}
        if use_mca:
            dp["mca"] = _mca(sd, f"{prefix}.3")
        if block == "edge":
            dp["egrfb"], ds["egrfb"] = _egrfb(sd, f"{prefix}.{idx_block}")
        params[f"down{k}"] = dp
        stats[f"down{k}"] = ds

    if use_rga:
        params["attn1"] = _rga(sd, "attn1")

    for k in range(1, 5):
        p, s = _double_conv(sd, f"up{k}.conv")
        params[f"up{k}"] = {"DoubleConv_0": p}
        stats[f"up{k}"] = {"DoubleConv_0": s}

    params["out_conv"] = _conv(sd, "out_conv.0")
    return params, stats


def load_egm_checkpoint(path: str, **kwargs):
    """Load a reference ``.pth`` (train.py checkpoint dict or bare state
    dict) -> (params, batch_stats)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    return egm_unet_from_torch(sd, **kwargs)
