"""CLIPSeg variant tests: masked one-shot conditioning, single-layer
baseline, multi-label wrapper, attention mult-masks."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from egm_unet_tpu.models.clip.model import CLIPConfig
from egm_unet_tpu.models.clipseg import (
    PASCAL_VOC_CLASSES,
    CLIPDenseBaseline,
    CLIPDensePredTMasked,
    clipseg_multilabel,
)
from egm_unet_tpu.ops.attention import multi_head_attention

TINY = CLIPConfig(embed_dim=32, image_resolution=32, vision_layers=3,
                  vision_width=64, vision_patch_size=16, context_length=24,
                  vocab_size=512, transformer_width=64, transformer_heads=2,
                  transformer_layers=3, long_clip=True)


def test_mult_mask_matches_torch_semantics(rng):
    """'cls_token' / 'all' masks scale post-softmax weights
    (ref: models/clipseg.py:111-119)."""
    b, s, d, h = 2, 6, 16, 2
    q = rng.standard_normal((b, s, d), dtype=np.float32)
    k = rng.standard_normal((b, s, d), dtype=np.float32)
    v = rng.standard_normal((b, s, d), dtype=np.float32)
    mask = rng.random((b, s - 1)).astype(np.float32)

    def torch_ref(mask_type):
        tq = torch.from_numpy(q).view(b, s, h, d // h).transpose(1, 2)
        tk = torch.from_numpy(k).view(b, s, h, d // h).transpose(1, 2)
        tv = torch.from_numpy(v).view(b, s, h, d // h).transpose(1, 2)
        w = torch.softmax(tq @ tk.transpose(-1, -2) * (d // h) ** -0.5, -1)
        m = torch.from_numpy(mask)[:, None]
        if mask_type == "cls_token":
            w[:, :, 0, 1:] = w[:, :, 0, 1:] * m
        else:
            w[:, :, 1:, 1:] = w[:, :, 1:, 1:] * m[:, :, None]
        return (w @ tv).transpose(1, 2).reshape(b, s, d)

    for mask_type in ("cls_token", "all"):
        got = multi_head_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                                   h, mult_mask=(mask_type, jnp.asarray(mask)))
        np.testing.assert_allclose(np.asarray(got), torch_ref(mask_type).numpy(),
                                   rtol=2e-4, atol=2e-5, err_msg=mask_type)


def test_masked_one_shot_conditioning(rng):
    model = CLIPDensePredTMasked(clip_cfg=TINY, extract_layers=(0, 1, 2),
                                 reduce_dim=16)
    img_q = jnp.asarray(rng.standard_normal((1, 32, 32, 3), dtype=np.float32))
    img_s = jnp.asarray(rng.standard_normal((1, 32, 32, 3), dtype=np.float32))
    seg_s = jnp.zeros((1, 32, 32)).at[:, 8:24, 8:24].set(1.0)
    v = model.init(jax.random.key(0), img_q, img_s, seg_s)
    (logits,) = model.apply(v, img_q, img_s, seg_s)
    assert logits.shape == (1, 32, 32, 1)
    # different support mask -> different conditioning -> different output
    (logits2,) = model.apply(v, img_q, img_s, 1.0 - seg_s)
    assert float(jnp.abs(logits - logits2).max()) > 1e-6


def test_baseline_forward(rng):
    model = CLIPDenseBaseline(clip_cfg=TINY, extract_layer=2,
                              reduce_dim=16, reduce2_dim=8)
    img = jnp.asarray(rng.standard_normal((2, 32, 32, 3), dtype=np.float32))
    cond = jnp.asarray(rng.standard_normal((2, 32), dtype=np.float32))
    v = model.init(jax.random.key(0), img, cond)
    (logits,) = model.apply(v, img, cond)
    assert logits.shape == (2, 32, 32, 1)


def test_multilabel_wrapper(rng):
    from egm_unet_tpu.models.clipseg import CLIPDensePredT

    assert len(PASCAL_VOC_CLASSES) == 21
    model = CLIPDensePredT(clip_cfg=TINY, extract_layers=(0, 1, 2), reduce_dim=16)
    img = jnp.asarray(rng.standard_normal((1, 32, 32, 3), dtype=np.float32))
    conds = jnp.asarray(rng.standard_normal((3, 32), dtype=np.float32))  # 3 classes
    v = model.init(jax.random.key(0), img, conds[:1])
    out = clipseg_multilabel(model, v, img, conds)
    assert out.shape == (1, 32, 32, 3)
    # base -10 + sigmoid*fac: background channel has 3x range
    assert float(out.min()) >= -10.0 and float(out.max()) <= -10.0 + 3.0
