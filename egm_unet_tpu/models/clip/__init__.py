"""CLIP stack: BPE tokenizer, Long-CLIP text encoder, CSA ViT."""

from egm_unet_tpu.models.clip.tokenizer import SimpleTokenizer, tokenize  # noqa: F401
from egm_unet_tpu.models.clip.model import (  # noqa: F401
    CLIP,
    CLIPConfig,
    VIT_B16,
    VIT_B32,
    stretch_positional_embedding,
)
