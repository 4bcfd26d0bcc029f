"""Inference-time BatchNorm folding (conv+BN+act -> conv+bias+act).

The reference runs BN at eval as a per-channel scale/shift after every conv
(src/EGM-UNet.py DoubleConv/BasicConv graphs).  On TPU those scale/shifts
cost extra HBM param loads plus (under mixed precision) bf16<->f32 convert
fusions around the f32 BN params (PERF.md).  At inference BN is affine in
its input, so it folds exactly into the preceding conv:

    y = ((x*W + b) - mean) * gamma/sqrt(var+eps) + beta
      =  x * (W * f) + ((b - mean) * f + beta),   f = gamma/sqrt(var+eps)

``fold_bn_variables`` performs that transform on a variables pytree produced
by the standard (BN) graph, returning params for the ``fold_bn=True`` graph
(see ``create_model``), which contains no BN ops at all.  The pairing rule
matches how every conv+BN site in this package is built: inside one parent
module the flax auto-names are ``Conv_i`` / ``BatchNorm_i`` (nn/layers.py
ConvBNReLU, BasicConv, EdgeAwareFeatureEnhancer).
"""

from __future__ import annotations

from typing import Any, Mapping

import jax.numpy as jnp


def _fold_pair(conv_params: Mapping[str, Any], bn_params: Mapping[str, Any],
               bn_stats: Mapping[str, Any], eps: float):
    """Fold one BN (scale,bias,mean,var) into one conv (kernel[,bias])."""
    factor = bn_params["scale"] / jnp.sqrt(bn_stats["var"] + eps)
    kernel = conv_params["kernel"] * factor  # HWIO: broadcasts over O
    bias = conv_params.get("bias", 0.0)
    bias = (bias - bn_stats["mean"]) * factor + bn_params["bias"]
    return {"kernel": kernel, "bias": bias}


def fold_bn_variables(variables: Mapping[str, Any], eps: float = 1e-5):
    """variables {'params', 'batch_stats'} of a BN graph -> {'params'} for
    the matching ``fold_bn=True`` graph.  Both BN epsilons in this package
    (default and BasicConv) are 1e-5 (ref: torch nn.BatchNorm2d default)."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})

    def fold(p, s):
        if not isinstance(p, Mapping):
            return p
        out = {}
        bn_keys = [k for k in p if k.startswith("BatchNorm_")]
        for k, node in p.items():
            if k in bn_keys:
                continue
            out[k] = fold(node, s.get(k, {}) if isinstance(s, Mapping) else {})
        for k in bn_keys:
            conv_key = "Conv_" + k.split("_", 1)[1]
            if conv_key not in p:
                raise ValueError(
                    f"BatchNorm {k!r} has no sibling {conv_key!r} to fold "
                    "into — fold_bn_variables only supports the conv+BN "
                    "module layouts in egm_unet_tpu.nn.layers")
            # both are wrapper modules holding one flax core module each
            conv_inner = dict(out[conv_key]["Conv_0"])
            out[conv_key] = {"Conv_0": _fold_pair(
                conv_inner, p[k]["BatchNorm_0"], s[k]["BatchNorm_0"], eps)}
        return out

    return {"params": fold(params, stats)}
