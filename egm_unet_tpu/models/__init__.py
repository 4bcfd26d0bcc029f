"""Model zoo: UNet family + CLIP/CLIPSeg text-prompted path."""

from egm_unet_tpu.models.unet import UNet  # noqa: F401
from egm_unet_tpu.models.egm_unet import EGMUNet  # noqa: F401
from egm_unet_tpu.models.registry import create_model, MODEL_CONFIGS  # noqa: F401
