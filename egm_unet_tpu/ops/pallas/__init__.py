"""Pallas TPU kernels for the hot ops."""

from egm_unet_tpu.ops.pallas.csa import csa_attention  # noqa: F401
