"""Vanilla-CLIP + CSA — the standalone ``clipcsa`` package's capability
(ref: clipcsa/clip.py, clipcsa/model.py; SURVEY.md §2.7): standard OpenAI
77-token text encoding and the CSA image path on vanilla CLIP weights.

Same CLIP class, different config — the reference keeps two near-identical
packages for this; here it's one model family.
"""

from __future__ import annotations

import dataclasses
from typing import List, Union

import numpy as np

from egm_unet_tpu.models.clip.model import CLIP, CLIPConfig, VIT_B16
from egm_unet_tpu.models.clip.tokenizer import SimpleTokenizer
from egm_unet_tpu.models.clip.tokenizer import tokenize as _tokenize

VANILLA_CSA_B16 = dataclasses.replace(VIT_B16, context_length=77, long_clip=False)
VANILLA_CSA_B32 = dataclasses.replace(VANILLA_CSA_B16, vision_patch_size=32)


def tokenize77(texts: Union[str, List[str]], truncate: bool = False,
               tokenizer: SimpleTokenizer | None = None) -> np.ndarray:
    """Standard 77-token CLIP tokenization (ref: clipcsa/clip.py:198)."""
    return _tokenize(texts, context_length=77, truncate=truncate,
                     tokenizer=tokenizer)


def build_vanilla_csa(checkpoint_path: str | None = None, dtype=None):
    """(CLIP module, params|None) for the vanilla 77-ctx CSA configuration;
    loads an OpenAI-format checkpoint when given (without the Long-CLIP
    positional stretch)."""
    import jax.numpy as jnp

    cfg = VANILLA_CSA_B16
    params = None
    if checkpoint_path:
        from egm_unet_tpu.utils.convert import load_clip_checkpoint

        cfg_kw, params = load_clip_checkpoint(checkpoint_path, stretch_to_long=False)
        cfg = CLIPConfig(**cfg_kw)
    model = CLIP(cfg, dtype=dtype or jnp.float32)
    return model, params
