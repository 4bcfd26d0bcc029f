"""Model registry covering every config in the reference's record/ logs
(BASELINE.md): vanilla UNet, GRFB-UNet baseline, EGM-UNet, and the A/B/C
ablation grid."""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from egm_unet_tpu.models.egm_unet import EGMUNet
from egm_unet_tpu.models.unet import UNet

# name -> EGMUNet module kwargs (block, use_rga, use_mca)
MODEL_CONFIGS = {
    "egm_unet": dict(block="edge", use_rga=True, use_mca=True),  # A+B+C
    "egm_unet_a": dict(block="edge", use_rga=False, use_mca=False),
    "egm_unet_b": dict(block=None, use_rga=True, use_mca=False),
    "egm_unet_c": dict(block=None, use_rga=False, use_mca=True),
    "egm_unet_ab": dict(block="edge", use_rga=True, use_mca=False),  # == yuanGRFBUNet
    "egm_unet_ac": dict(block="edge", use_rga=False, use_mca=True),
    "egm_unet_bc": dict(block=None, use_rga=True, use_mca=True),
    "grfb_unet": dict(block="grfb", use_rga=False, use_mca=False),
}


def create_model(
    name: str = "egm_unet",
    in_channels: int = 3,
    num_classes: int = 2,
    base_c: int = 32,
    bilinear: bool = True,
    dtype: Any = jnp.float32,
    fold_bn: bool = False,
    remat: bool = False,
    mca_impl=None,
    up_impl=None,
):
    """Build a model by name (ref: train.py:57-60 create_model).

    ``fold_bn=True`` builds the inference-specialized graph (no BatchNorm
    ops; convs carry folded biases) — pair with
    ``models.fold_bn.fold_bn_variables``.  ``remat=True`` (EGM family)
    checkpoints each stage for large-batch training.  ``mca_impl`` /
    ``up_impl`` select kernel implementations per-instance (None = respect
    the $EGM_MCA_IMPL / $EGM_UP_IMPL env defaults at trace time).
    """
    if name == "unet":
        return UNet(in_channels=in_channels, num_classes=num_classes,
                    bilinear=bilinear, base_c=base_c, dtype=dtype,
                    fold_bn=fold_bn, up_impl=up_impl)
    if name in MODEL_CONFIGS:
        return EGMUNet(in_channels=in_channels, num_classes=num_classes,
                       bilinear=bilinear, base_c=base_c, dtype=dtype,
                       fold_bn=fold_bn, remat=remat, mca_impl=mca_impl,
                       up_impl=up_impl, **MODEL_CONFIGS[name])
    raise ValueError(f"unknown model {name!r}; choose from "
                     f"{['unet', *MODEL_CONFIGS]}")
