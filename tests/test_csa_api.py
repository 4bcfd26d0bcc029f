"""clipcsa-equivalent API: vanilla 77-ctx CLIP with CSA."""

import numpy as np

import jax
import jax.numpy as jnp

from egm_unet_tpu.models.clip.csa_api import VANILLA_CSA_B16, build_vanilla_csa


def test_vanilla_config():
    assert VANILLA_CSA_B16.context_length == 77
    assert not VANILLA_CSA_B16.long_clip


def test_vanilla_encode_paths(rng):
    import dataclasses

    from egm_unet_tpu.models.clip.model import CLIP

    tiny = dataclasses.replace(VANILLA_CSA_B16, embed_dim=32, image_resolution=32,
                               vision_layers=2, vision_width=64,
                               context_length=12, vocab_size=128,
                               transformer_width=64, transformer_heads=2,
                               transformer_layers=2)
    model = CLIP(tiny)
    img = jnp.asarray(rng.standard_normal((2, 32, 32, 3), dtype=np.float32))
    txt = jnp.asarray(rng.integers(1, 120, (3, 12)).astype(np.int32))
    v = model.init(jax.random.key(0), img, txt)
    # single positional embedding, no _res (vanilla text side)
    assert "positional_embedding_res" not in v["params"]
    t = model.apply(v, txt, method=CLIP.encode_text)
    i = model.apply(v, img, method=CLIP.encode_image)
    assert t.shape == (3, 32) and i.shape == (2, 32)
