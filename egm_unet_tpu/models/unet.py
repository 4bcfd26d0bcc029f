"""Vanilla UNet (ref: src/unet.py:7-96) — the minimum end-to-end model.

NHWC, bilinear(align_corners=True) decoder by default, returns
``{"out": logits}`` like the reference.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from egm_unet_tpu.nn.layers import Conv, DoubleConv, pad_to_match  # noqa: F401
from egm_unet_tpu.ops.conv import conv_transpose2d_nonoverlap
from egm_unet_tpu.ops.pooling import max_pool2d
from egm_unet_tpu.ops.resize import upsample2x_bilinear_align_corners


class Up(nn.Module):
    """Upsample + pad + concat skip + DoubleConv (ref: src/unet.py:24-47).

    When x2 is exactly 2x x1 (every even input size), the upsample+concat
    happen *inside* the first ConvBNReLU (nn/layers.py up_pair) so remat
    boundaries save (x2, x1) instead of the full-width concat; on folded-BN
    inference graphs ``up_impl='pallas'`` (or ``$EGM_UP_IMPL=pallas``) fuses
    the stage into one Pallas kernel (ops/pallas/upconv.py) there."""

    features: int
    bilinear: bool = True
    dtype: Any = jnp.float32
    fold_bn: bool = False
    up_impl: Optional[str] = None
    fine_remat: bool = False

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        if (self.bilinear and x2.shape[1] == 2 * x1.shape[1]
                and x2.shape[2] == 2 * x1.shape[2]):
            mid = (x1.shape[-1] + x2.shape[-1]) // 2
            conv = DoubleConv(self.features, mid_features=mid,
                              dtype=self.dtype, fold_bn=self.fold_bn,
                              up_impl=self.up_impl, fine_remat=self.fine_remat)
            return conv(None, train, up_pair=(x2, x1))
        if self.bilinear:
            x1 = upsample2x_bilinear_align_corners(x1)
            conv = DoubleConv(self.features, mid_features=(x1.shape[-1] + x2.shape[-1]) // 2,
                              dtype=self.dtype, fold_bn=self.fold_bn,
                              fine_remat=self.fine_remat)
        else:
            cin = x1.shape[-1]
            w = self.param("up_kernel", nn.initializers.variance_scaling(
                1.0 / 3.0, "fan_in", "uniform"), (cin, 2, 2, cin // 2), jnp.float32)
            x1 = conv_transpose2d_nonoverlap(x1, w.astype(x1.dtype))
            conv = DoubleConv(self.features, dtype=self.dtype, fold_bn=self.fold_bn,
                              fine_remat=self.fine_remat)
        x1 = pad_to_match(x1, x2)
        x = jnp.concatenate([x2, x1], axis=-1)
        return conv(x, train)


class UNet(nn.Module):
    in_channels: int = 3
    num_classes: int = 2
    bilinear: bool = True
    base_c: int = 64
    dtype: Any = jnp.float32
    fold_bn: bool = False
    up_impl: Optional[str] = None  # None = respect $EGM_UP_IMPL

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.base_c
        factor = 2 if self.bilinear else 1
        fb = self.fold_bn
        ui = self.up_impl

        def dc(feats, name):
            return DoubleConv(feats, dtype=self.dtype, fold_bn=fb, name=name)

        x1 = dc(c, "in_conv")(x, train)
        x2 = dc(c * 2, "down1")(max_pool2d(x1), train)
        x3 = dc(c * 4, "down2")(max_pool2d(x2), train)
        x4 = dc(c * 8, "down3")(max_pool2d(x3), train)
        x5 = dc(c * 16 // factor, "down4")(max_pool2d(x4), train)
        x = Up(c * 8 // factor, self.bilinear, self.dtype, fb, ui, name="up1")(x5, x4, train)
        x = Up(c * 4 // factor, self.bilinear, self.dtype, fb, ui, name="up2")(x, x3, train)
        x = Up(c * 2 // factor, self.bilinear, self.dtype, fb, ui, name="up3")(x, x2, train)
        x = Up(c, self.bilinear, self.dtype, fb, ui, name="up4")(x, x1, train)
        logits = Conv(self.num_classes, 1, dtype=self.dtype, name="out_conv")(x)
        return {"out": logits.astype(jnp.float32)}
