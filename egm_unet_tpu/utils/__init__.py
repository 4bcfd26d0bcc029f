"""Utilities: checkpointing, logging, color maps, torch-ckpt conversion."""

from egm_unet_tpu.utils.checkpoint import CheckpointManager  # noqa: F401
from egm_unet_tpu.utils.logging import MetricLogger, ResultsWriter  # noqa: F401
