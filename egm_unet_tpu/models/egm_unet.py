"""EGM-UNet / GRFB-UNet family with composable A/B/C ablation modules.

ref: src/EGM-UNet.py:1503-1541 (full A+B+C graph), src/yuanGRFBUNet.py (A+B
variant: DoubleConv1 without MCALayer).

Modules (named as in the reference's record/ ablation logs, SURVEY.md §6):

- A ``block='edge'``  — EdgeEnhancedGRFB appended to each encoder DoubleConv1.
- A' ``block='grfb'`` — original GRFB block instead (GRFB-UNet baseline).
- B ``use_rga``       — RecursiveGatedAttention at the bottleneck.
- C ``use_mca``       — enhanced MCALayer between the two convs of each
  encoder DoubleConv1.

Encoder stages use DoubleConv1 = conv-BN-ReLU [-MCA-] conv-BN-ReLU [-GRFB]
(ref: src/EGM-UNet.py:888-904); the stem and decoder use plain DoubleConv.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from egm_unet_tpu.nn.attention import MCALayer, RecursiveGatedAttention
from egm_unet_tpu.nn.grfb import GRFB, EdgeEnhancedGRFB
from egm_unet_tpu.nn.layers import Conv, ConvBNReLU, DoubleConv, site_barrier
from egm_unet_tpu.models.unet import Up
from egm_unet_tpu.ops.pooling import max_pool2d


class DoubleConv1(nn.Module):
    """Encoder DoubleConv with optional MCA (C) and GRFB (A) modules
    (ref: src/EGM-UNet.py:888-904)."""

    features: int
    mid_features: Optional[int] = None
    block: Optional[str] = "edge"  # 'edge' | 'grfb' | None
    use_mca: bool = True
    dtype: Any = jnp.float32
    fold_bn: bool = False
    mca_impl: Optional[str] = None  # None = respect $EGM_MCA_IMPL
    fine_remat: bool = False  # checkpoint each ConvBNReLU (see DoubleConv)

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = self.mid_features or self.features
        CBR = (nn.remat(ConvBNReLU, static_argnums=(2,)) if self.fine_remat
               else ConvBNReLU)
        x = CBR(mid, self.dtype, fold_bn=self.fold_bn, name="conv1")(x, train)
        if self.use_mca:
            x = MCALayer(dtype=self.dtype, impl=self.mca_impl, name="mca")(x)
        x = CBR(self.features, self.dtype, fold_bn=self.fold_bn,
                name="conv2")(x, train)
        if self.block == "edge":
            x = EdgeEnhancedGRFB(self.features, stride=1, scale=0.1, visual=12,
                                 dtype=self.dtype, fold_bn=self.fold_bn,
                                 fine_remat=self.fine_remat,
                                 name="egrfb")(x, train)
        elif self.block == "grfb":
            x = GRFB(self.features, stride=1, scale=0.1, visual=12,
                     dtype=self.dtype, fold_bn=self.fold_bn,
                     fine_remat=self.fine_remat, name="grfb")(x, train)
        return x


class EGMUNet(nn.Module):
    """The flagship model; ``block='edge', use_rga=True, use_mca=True`` is
    the published A+B+C config (mIoU 93.8 on TP-928, BASELINE.md)."""

    in_channels: int = 3
    num_classes: int = 2
    bilinear: bool = True
    base_c: int = 32
    block: Optional[str] = "edge"
    use_rga: bool = True
    use_mca: bool = True
    dtype: Any = jnp.float32
    fold_bn: bool = False
    # rematerialize stages in the backward pass (jax.checkpoint):
    #   True/'stage' — checkpoint each encoder/decoder stage: ~1/3 more
    #     FLOPs for O(stage) activation memory (bs>=64 at 480px OOMs
    #     without it);
    #   'fine' — additionally checkpoint each ConvBNReLU inside the stages
    #     with the upsample+concat folded into the first decoder conv, so
    #     the backward holds one conv-wide temp at a time (unlocks bs 128).
    # The reference has no equivalent (torch keeps all activations).
    remat: Any = False  # False | True | 'stage' | 'fine'
    mca_impl: Optional[str] = None  # None = respect $EGM_MCA_IMPL
    up_impl: Optional[str] = None  # None = respect $EGM_UP_IMPL

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.base_c
        factor = 2 if self.bilinear else 1
        fine = self.remat == "fine"
        DC1 = nn.remat(DoubleConv1, static_argnums=(2,)) if self.remat else DoubleConv1
        DC = nn.remat(DoubleConv, static_argnums=(2,)) if self.remat else DoubleConv
        UpM = nn.remat(Up, static_argnums=(3,)) if self.remat else Up

        def down(feats, name):
            return DC1(feats, block=self.block, use_mca=self.use_mca,
                       dtype=self.dtype, fold_bn=self.fold_bn,
                       mca_impl=self.mca_impl, fine_remat=fine, name=name)

        def pool(v, tag):
            # $EGM_POOL_BARRIER=pool1,... materializes the pooled map instead
            # of letting the 2x2 max re-evaluate inside the consumer conv's
            # window taps (per-site experiment switch, see nn.layers).
            # qstore: in int8df serving the pooled map is stored 8-bit
            # (max-pool of a quantized tensor takes values from the same
            # grid, so the requantization is near-exact).
            from egm_unet_tpu.ops.quant import qstore

            return site_barrier(self, qstore(self, max_pool2d(v), tag),
                                tag, env="EGM_POOL_BARRIER")

        x1 = DC(c, dtype=self.dtype, fold_bn=self.fold_bn, fine_remat=fine,
                name="in_conv")(x, train)
        x2 = down(c * 2, "down1")(pool(x1, "pool1"), train)
        x3 = down(c * 4, "down2")(pool(x2, "pool2"), train)
        x4 = down(c * 8, "down3")(pool(x3, "pool3"), train)
        x5 = down(c * 16 // factor, "down4")(pool(x4, "pool4"), train)

        if self.use_rga:
            x5 = RecursiveGatedAttention(dim=c * 16 // factor, dtype=self.dtype,
                                         name="attn1")(x5)

        fb = self.fold_bn
        ui = self.up_impl
        x = UpM(c * 8 // factor, self.bilinear, self.dtype, fb, ui, fine, name="up1")(x5, x4, train)
        x = UpM(c * 4 // factor, self.bilinear, self.dtype, fb, ui, fine, name="up2")(x, x3, train)
        x = UpM(c * 2 // factor, self.bilinear, self.dtype, fb, ui, fine, name="up3")(x, x2, train)
        x = UpM(c, self.bilinear, self.dtype, fb, ui, fine, name="up4")(x, x1, train)
        logits = Conv(self.num_classes, 1, dtype=self.dtype, name="out_conv")(x)
        return {"out": logits.astype(jnp.float32)}
