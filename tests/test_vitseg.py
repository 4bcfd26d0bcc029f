"""vitseg variant + attention-map extraction tests."""

import numpy as np

import jax
import jax.numpy as jnp

from egm_unet_tpu.models.clip.model import CLIP, CLIPConfig, get_attn
from egm_unet_tpu.models.vitseg import VITDensePredT

TINY = CLIPConfig(embed_dim=32, image_resolution=32, vision_layers=3,
                  vision_width=64, vision_patch_size=16, context_length=24,
                  vocab_size=512, transformer_width=64, transformer_heads=2,
                  transformer_layers=3, long_clip=True)


def test_vitseg_forward(rng):
    model = VITDensePredT(extract_layers=(0, 1, 2), reduce_dim=16, cond_dim=8,
                          vit_width=32, vit_layers=3, vit_heads=2, resolution=64)
    img = jnp.asarray(rng.standard_normal((1, 48, 48, 3), dtype=np.float32))
    cond = jnp.asarray(rng.standard_normal((1, 8), dtype=np.float32))
    v = model.init(jax.random.key(0), img, cond)
    (logits,) = model.apply(v, img, cond)
    # inputs are resized to the backbone resolution (ref: vitseg.py:48)
    assert logits.shape == (1, 64, 64, 1)
    assert np.isfinite(np.asarray(logits)).all()


def test_vitseg_backbone_frozen(rng):
    model = VITDensePredT(extract_layers=(0, 1), reduce_dim=8, cond_dim=8,
                          vit_width=32, vit_layers=2, vit_heads=2, resolution=32)
    img = jnp.asarray(rng.standard_normal((1, 32, 32, 3), dtype=np.float32))
    cond = jnp.asarray(rng.standard_normal((1, 8), dtype=np.float32))
    v = model.init(jax.random.key(0), img, cond)

    def loss(p):
        (logits,) = model.apply({"params": p}, img, cond)
        return jnp.sum(logits**2)

    grads = jax.grad(loss)(v["params"])
    vit_grads = jax.tree_util.tree_leaves(grads["vit"])
    assert all(float(jnp.abs(g).max()) == 0.0 for g in vit_grads)


def test_get_attn_shapes(rng):
    model = CLIP(TINY)
    img = jnp.asarray(rng.standard_normal((2, 32, 32, 3), dtype=np.float32))
    v = {"params": model.init(jax.random.key(0), img,
                              jnp.zeros((1, 24), jnp.int32))["params"]}
    final = get_attn(model, v, img, layer="final")
    s = (32 // 16) ** 2 + 1
    assert final.shape == (2, TINY.vision_heads, s, s)
    # CSA attention rows sum to 2 (two softmaxes)
    np.testing.assert_allclose(np.asarray(final.sum(-1)), 2.0, rtol=1e-4)
    all_maps = get_attn(model, v, img, layer="all")
    assert len(all_maps) == TINY.vision_layers
    # non-CSA layers are row-stochastic
    np.testing.assert_allclose(np.asarray(all_maps[0].sum(-1)), 1.0, rtol=1e-4)
