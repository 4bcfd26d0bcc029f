"""CLIPSeg decoder tests: shapes, TorchEncoderLayer parity, converter merge,
and the fusion alpha-search engine."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from egm_unet_tpu.engine.fusion import (
    fuse_logits,
    load_alpha,
    save_alpha,
    search_best_alpha,
)
from egm_unet_tpu.models.clip.model import CLIPConfig
from egm_unet_tpu.models.clipseg import CLIPDensePredT, TorchEncoderLayer, get_prompt_list

torch.set_grad_enabled(False)

TINY = CLIPConfig(embed_dim=32, image_resolution=32, vision_layers=3,
                  vision_width=64, vision_patch_size=16, context_length=24,
                  vocab_size=512, transformer_width=64, transformer_heads=2,
                  transformer_layers=3, long_clip=True)


def test_torch_encoder_layer_parity(rng):
    """Our decoder block == stock nn.TransformerEncoderLayer (post-norm,
    ReLU, ff=2048; ref: models/clipseg.py:421)."""
    d, h = 16, 4
    x = rng.standard_normal((2, 6, d), dtype=np.float32)

    layer = TorchEncoderLayer(d, h, dim_feedforward=32)
    v = layer.init(jax.random.key(0), jnp.asarray(x))

    t = torch.nn.TransformerEncoderLayer(d, h, dim_feedforward=32,
                                         batch_first=True, dropout=0.0)
    t.eval()
    p = v["params"]
    t.self_attn.in_proj_weight.data = torch.from_numpy(np.asarray(p["in_proj"]["kernel"]).T.copy())
    t.self_attn.in_proj_bias.data = torch.from_numpy(np.asarray(p["in_proj"]["bias"]).copy())
    t.self_attn.out_proj.weight.data = torch.from_numpy(np.asarray(p["out_proj"]["kernel"]).T.copy())
    t.self_attn.out_proj.bias.data = torch.from_numpy(np.asarray(p["out_proj"]["bias"]).copy())
    t.linear1.weight.data = torch.from_numpy(np.asarray(p["linear1"]["kernel"]).T.copy())
    t.linear1.bias.data = torch.from_numpy(np.asarray(p["linear1"]["bias"]).copy())
    t.linear2.weight.data = torch.from_numpy(np.asarray(p["linear2"]["kernel"]).T.copy())
    t.linear2.bias.data = torch.from_numpy(np.asarray(p["linear2"]["bias"]).copy())
    t.norm1.weight.data = torch.from_numpy(np.asarray(p["norm1"]["scale"]).copy())
    t.norm1.bias.data = torch.from_numpy(np.asarray(p["norm1"]["bias"]).copy())
    t.norm2.weight.data = torch.from_numpy(np.asarray(p["norm2"]["scale"]).copy())
    t.norm2.bias.data = torch.from_numpy(np.asarray(p["norm2"]["bias"]).copy())

    got = layer.apply(v, jnp.asarray(x))
    ref = t(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=2e-4, atol=2e-4)


def test_clipseg_forward_shapes(rng):
    model = CLIPDensePredT(clip_cfg=TINY, extract_layers=(0, 1, 2), reduce_dim=16)
    img = jnp.asarray(rng.standard_normal((2, 32, 32, 3), dtype=np.float32))
    cond = jnp.asarray(rng.standard_normal((2, 32), dtype=np.float32))
    v = model.init(jax.random.key(0), img, cond)
    (logits,) = model.apply(v, img, cond)
    assert logits.shape == (2, 32, 32, 1)
    assert np.isfinite(np.asarray(logits)).all()


def test_clipseg_token_conditioning(rng):
    model = CLIPDensePredT(clip_cfg=TINY, extract_layers=(0, 1, 2), reduce_dim=16)
    img = jnp.asarray(rng.standard_normal((2, 32, 32, 3), dtype=np.float32))
    tokens = jnp.asarray(rng.integers(1, 500, (2, TINY.context_length)).astype(np.int32))
    v = model.init(jax.random.key(0), img, tokens)
    (logits,) = model.apply(v, img, tokens)
    assert logits.shape == (2, 32, 32, 1)


def test_clipseg_complex_trans_conv(rng):
    model = CLIPDensePredT(clip_cfg=TINY, extract_layers=(0, 1, 2), reduce_dim=16,
                           complex_trans_conv=True)
    img = jnp.asarray(rng.standard_normal((1, 32, 32, 3), dtype=np.float32))
    cond = jnp.asarray(rng.standard_normal((1, 32), dtype=np.float32))
    v = model.init(jax.random.key(0), img, cond)
    (logits,) = model.apply(v, img, cond)
    assert logits.shape == (1, 32, 32, 1)


def test_clip_tower_is_frozen(rng):
    """stop_gradient on the tower: grads wrt clip params must be zero
    (ref: models/clipseg.py:155-156 requires_grad_(False))."""
    model = CLIPDensePredT(clip_cfg=TINY, extract_layers=(0, 1, 2), reduce_dim=16)
    img = jnp.asarray(rng.standard_normal((1, 32, 32, 3), dtype=np.float32))
    cond = jnp.asarray(rng.standard_normal((1, 32), dtype=np.float32))
    v = model.init(jax.random.key(0), img, cond)

    def loss(params):
        (logits,) = model.apply({"params": params}, img, cond)
        return jnp.sum(logits**2)

    grads = jax.grad(loss)(v["params"])
    clip_grads = jax.tree_util.tree_leaves(grads["clip"])
    assert all(float(jnp.abs(g).max()) == 0.0 for g in clip_grads)
    dec_grads = jax.tree_util.tree_leaves(
        {k: v for k, v in grads.items() if k != "clip"})
    assert any(float(jnp.abs(g).max()) > 0.0 for g in dec_grads)


def test_prompt_list():
    assert get_prompt_list("fixed") == ["a photo of a {}."]
    assert len(get_prompt_list("shuffle+")) == 9


# ------------------------------------------------------------------- fusion
def test_alpha_search_recovers_optimal_window():
    """Constructed case where fusion is fully correct only for
    alpha in (3.33, 4.17): pixel group A (label 1) needs 0.3*alpha > 1,
    group B (label 0) needs 0.12*alpha < 0.5."""
    h = 8
    labels = np.zeros((1, h, h), np.int32)
    labels[:, : h // 2] = 1
    clip = np.zeros((1, h, h, 2), np.float32)
    unet = np.zeros((1, h, h, 2), np.float32)
    clip[:, : h // 2, :, 1] = -1.0   # A: clip wrong by 1
    unet[:, : h // 2, :, 1] = 0.3    # A: unet mildly right
    clip[:, h // 2 :, :, 0] = 0.5    # B: clip right by 0.5
    unet[:, h // 2 :, :, 1] = 0.12   # B: unet mildly wrong

    best_alpha, best_miou, mious = search_best_alpha(
        [(jnp.asarray(clip), jnp.asarray(unet), jnp.asarray(labels))])
    assert 3.3 < best_alpha < 4.2, best_alpha
    assert best_miou == 1.0
    # outside the window the mIoU is strictly worse
    assert float(mious[0]) < 1.0 and float(mious[-1]) < 1.0


def test_alpha_file_roundtrip(tmp_path):
    p = str(tmp_path / "best_alpha.txt")
    save_alpha(10.0, p)
    assert load_alpha(p) == 10.0
    assert load_alpha(str(tmp_path / "missing.txt")) == 0.5  # ref default


def test_fuse_logits():
    c = jnp.ones((1, 2, 2, 2))
    u = jnp.full((1, 2, 2, 2), 2.0)
    np.testing.assert_allclose(np.asarray(fuse_logits(c, u, 10.0)), 21.0)
