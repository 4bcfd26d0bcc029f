"""GRFB blocks: the original receptive-field block and the edge-enhanced
variant (module "A") with its FusionConv dual-attention fusion.

ref: src/EGM-UNet.py:977-1023 (GRFB), :1202-1236 (FusionConv),
:1238-1323 (EdgeEnhancedGRFB).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from egm_unet_tpu.nn.attention import ChannelAttention, SpatialAttention
from egm_unet_tpu.nn.layers import BasicConv, Conv, EdgeAwareFeatureEnhancer


class FusionConv(nn.Module):
    """concat -> 1x1 down to out/4 -> (3x3+5x5+7x7 summed) x spatial-attn,
    combined with channel attention: up(res + s*c)
    (ref: src/EGM-UNet.py:1202-1236).

    TPU rewrites (bit-equivalent, parameters keep the reference shapes):
    - when x1 is x2 (the only live call pattern, ref: src/EGM-UNet.py:1312
      passes concat_feat twice), ``cat([x,x]) @ W == x @ (W_top + W_bot)`` —
      the 2C concat is never materialized;
    - ``conv3(x)+conv5(x)+conv7(x)`` folds into ONE 7x7 conv whose kernel is
      ``W7 + pad(W5) + pad(W3)`` (SAME padding makes the sums align exactly)
      — one MXU pass instead of three.
    """

    features: int
    factor: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x1, x2):
        from egm_unet_tpu.nn.layers import torch_bias_init, torch_kernel_init
        from egm_unet_tpu.ops.conv import conv2d

        dim = int(self.features // self.factor)
        cin = x1.shape[-1] + x2.shape[-1]

        w_down = self.param("down_kernel", torch_kernel_init, (1, 1, cin, dim),
                            jnp.float32)
        b_down = self.param(
            "down_bias",
            lambda k, s, d=jnp.float32: torch_bias_init(k, s, d, fan_in=cin),
            (dim,))
        if x1 is x2:
            half = x1.shape[-1]
            w_eff = (w_down[:, :, :half] + w_down[:, :, half:]).astype(x1.dtype)
            x = conv2d(x1, w_eff) + b_down.astype(x1.dtype)
        else:
            xcat = jnp.concatenate([x1, x2], axis=-1)
            x = conv2d(xcat, w_down.astype(xcat.dtype)) + b_down.astype(xcat.dtype)
        res = x

        fan = lambda k: dim * k * k
        w3 = self.param("conv3_kernel", torch_kernel_init, (3, 3, dim, dim), jnp.float32)
        b3 = self.param("conv3_bias",
                        lambda k, s, d=jnp.float32: torch_bias_init(k, s, d, fan(3)),
                        (dim,))
        w5 = self.param("conv5_kernel", torch_kernel_init, (5, 5, dim, dim), jnp.float32)
        b5 = self.param("conv5_bias",
                        lambda k, s, d=jnp.float32: torch_bias_init(k, s, d, fan(5)),
                        (dim,))
        w7 = self.param("conv7_kernel", torch_kernel_init, (7, 7, dim, dim), jnp.float32)
        b7 = self.param("conv7_bias",
                        lambda k, s, d=jnp.float32: torch_bias_init(k, s, d, fan(7)),
                        (dim,))
        w_merged = (w7
                    + jnp.pad(w5, ((1, 1), (1, 1), (0, 0), (0, 0)))
                    + jnp.pad(w3, ((2, 2), (2, 2), (0, 0), (0, 0))))
        s = conv2d(x, w_merged.astype(x.dtype), padding=3) + (
            b3 + b5 + b7).astype(x.dtype)

        s = s * SpatialAttention(dtype=self.dtype, name="spatial")(s)
        c = ChannelAttention(dtype=self.dtype, name="channel")(x)
        from egm_unet_tpu.ops.quant import qstore

        return qstore(
            self,
            Conv(self.features, 1, dtype=self.dtype, name="up")(res + s * c),
            "out", signed=True)


class EdgeEnhancedGRFB(nn.Module):
    """Edge-enhanced GRFB (module "A"), ref: src/EGM-UNet.py:1238-1323.

    input edge-enhance -> three dilated branches (d = visual, 2*visual,
    3*visual) -> concat with input -> FusionConv(concat, concat) ->
    scale-residual -> ReLU -> target enhancer (3-ch sigmoid map,
    out *= 1 + map.mean(channels)).
    """

    features: int
    stride: int = 1
    scale: float = 0.1
    visual: int = 12
    fusion_factor: float = 4.0
    dtype: Any = jnp.float32
    fold_bn: bool = False
    # checkpoint each branch (dir/edge/ctx) so the backward pass holds one
    # branch's conv intermediates at a time instead of all ~12 at once —
    # at bs 128/480px those are 225 MB each and were the remaining OOM
    # after per-conv remat elsewhere (PERF.md round 3).  Param paths are
    # unchanged (lifted fn remat, not a wrapper module).
    fine_remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        import functools

        inter = max(x.shape[-1] // 8, 4)
        v = self.visual
        identity = x
        BC = functools.partial(BasicConv, dtype=self.dtype, fold_bn=self.fold_bn)

        import os

        from egm_unet_tpu.ops.quant import qstore

        xe = EdgeAwareFeatureEnhancer(dtype=self.dtype, fold_bn=self.fold_bn,
                                      name="edge_enhancer")(x, train)
        stored = qstore(self, xe, "xe")  # int8df: 8-bit storage + barrier
        if stored is xe and os.environ.get("EGM_MCA_BARRIER", "1") == "1":
            # materialize the sigmoid-gate chain once instead of per window
            # tap of the 3x3 ctx0 consumer (same pathology as the MCA
            # combine, nn/attention.py)
            stored = jax.lax.optimization_barrier(stored)
        xe = stored

        def dir_branch(mdl, xin, tr):
            d = BC(2 * inter, 1, name="dir0")(xin, tr)
            d = BC(2 * inter, 3, padding=v, dilation=v, relu=False,
                   name="dir1")(d, tr)
            return BC(2 * inter, 1, name="dir2")(d, tr)

        def edge_branch(mdl, xin, tr):
            e = BC(inter, 1, name="edge0")(xin, tr)
            e = EdgeAwareFeatureEnhancer(dtype=mdl.dtype, fold_bn=mdl.fold_bn,
                                         name="edge_eafe")(e, tr)
            e = BC(2 * inter, 3, stride=mdl.stride, padding=1, groups=inter,
                   name="edge1")(e, tr)
            e = BC(2 * inter, 3, padding=2 * v, dilation=2 * v, relu=False,
                   name="edge2")(e, tr)
            return BC(2 * inter, 1, name="edge3")(e, tr)

        def ctx_branch(mdl, xin, tr):
            c = BC(inter, 3, padding=1, name="ctx0")(xin, tr)
            c = BC(2 * inter, 3, stride=mdl.stride, padding=1, groups=2,
                   name="ctx1")(c, tr)
            c = BC(2 * inter, 3, padding=3 * v, dilation=3 * v, relu=False,
                   name="ctx2")(c, tr)
            return BC(2 * inter, 1, name="ctx3")(c, tr)

        if self.fine_remat:
            dir_branch = nn.remat(dir_branch, static_argnums=(2,))
            edge_branch = nn.remat(edge_branch, static_argnums=(2,))
            ctx_branch = nn.remat(ctx_branch, static_argnums=(2,))

        d = dir_branch(self, xe, train)
        e = edge_branch(self, xe, train)
        c = ctx_branch(self, xe, train)

        concat = jnp.concatenate([x, d, e, c], axis=-1)
        out = FusionConv(self.features, self.fusion_factor, dtype=self.dtype,
                         name="fusion")(concat, concat)

        short = BC(self.features, 1, stride=self.stride, relu=False,
                   name="shortcut")(identity, train)
        out = nn.relu(out * self.scale + short)
        stored = qstore(self, out, "res")
        if stored is out and os.environ.get("EGM_MCA_BARRIER", "1") == "1":
            # same: the scale-residual-relu tail otherwise recomputes inside
            # the 3x3 target_enhancer conv's window taps
            stored = jax.lax.optimization_barrier(stored)
        out = stored

        tw = Conv(3, 3, padding=1, dtype=self.dtype, name="target_enhancer")(out)
        tw = nn.sigmoid(tw)
        # the stage output feeds both the encoder pool and the skip concat —
        # the highest-traffic tensors in the graph
        return qstore(self, out * (1.0 + jnp.mean(tw, axis=-1, keepdims=True)),
                      "enh")


class GRFB(nn.Module):
    """Original GRFB block (kept for the GRFB-UNet baseline),
    ref: src/EGM-UNet.py:977-1023."""

    features: int
    stride: int = 1
    scale: float = 0.1
    visual: int = 12
    dtype: Any = jnp.float32
    fold_bn: bool = False
    fine_remat: bool = False  # per-branch checkpointing; see EdgeEnhancedGRFB

    @nn.compact
    def __call__(self, x, train: bool = False):
        import functools

        inter = x.shape[-1] // 8
        v = self.visual
        s = self.stride
        BC = functools.partial(BasicConv, dtype=self.dtype, fold_bn=self.fold_bn)

        def branch0(mdl, xin, tr):
            b0 = BC(2 * inter, 1, stride=s, name="b0_0")(xin, tr)
            b0 = BC(2 * inter, 3, padding=v, dilation=v, relu=False,
                    name="b0_1")(b0, tr)
            return BC(2 * inter, 1, stride=s, name="b0_2")(b0, tr)

        def branch1(mdl, xin, tr):
            b1 = BC(inter, 1, name="b1_0")(xin, tr)
            b1 = BC(2 * inter, 3, stride=s, padding=1, groups=inter,
                    name="b1_1")(b1, tr)
            b1 = BC(2 * inter, 1, stride=s, name="b1_2")(b1, tr)
            b1 = BC(2 * inter, 3, padding=2 * v, dilation=2 * v, relu=False,
                    name="b1_3")(b1, tr)
            return BC(2 * inter, 1, name="b1_4")(b1, tr)

        def branch2(mdl, xin, tr):
            b2 = BC(inter, 1, name="b2_0")(xin, tr)
            b2 = BC(2 * inter, 3, padding=1, groups=inter, name="b2_1")(b2, tr)
            b2 = BC(2 * inter, 1, stride=s, name="b2_2")(b2, tr)
            b2 = BC(2 * inter, 3, stride=s, padding=1, groups=2 * inter,
                    name="b2_3")(b2, tr)
            b2 = BC(2 * inter, 1, stride=s, name="b2_4")(b2, tr)
            b2 = BC(2 * inter, 3, padding=3 * v, dilation=3 * v, relu=False,
                    name="b2_5")(b2, tr)
            return BC(2 * inter, 1, stride=s, name="b2_6")(b2, tr)

        if self.fine_remat:
            branch0 = nn.remat(branch0, static_argnums=(2,))
            branch1 = nn.remat(branch1, static_argnums=(2,))
            branch2 = nn.remat(branch2, static_argnums=(2,))

        b0 = branch0(self, x, train)
        b1 = branch1(self, x, train)
        b2 = branch2(self, x, train)

        out = jnp.concatenate([x, b0, b1, b2], axis=-1)
        out = BC(self.features, 1, relu=False, name="conv_linear")(out, train)
        short = BC(self.features, 1, stride=s, relu=False, name="shortcut")(x, train)
        from egm_unet_tpu.ops.quant import qstore

        return qstore(self, nn.relu(out * self.scale + short), "out")
