"""CLIP stack tests: tokenizer goldens, CSA attention, converter round trip,
encode_text/encode_image parity vs the torch oracle, Long-CLIP stretch."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from egm_unet_tpu.models.clip.model import (
    CLIP,
    CLIPConfig,
    stretch_positional_embedding,
)
from egm_unet_tpu.models.clip.tokenizer import SimpleTokenizer, bytes_to_unicode, tokenize
from egm_unet_tpu.ops.attention import multi_head_attention
from egm_unet_tpu.utils.convert import clip_from_torch

from tests.torch_clip_oracle import TinyCLIP

torch.set_grad_enabled(False)

TINY = CLIPConfig(embed_dim=32, image_resolution=32, vision_layers=3,
                  vision_width=64, vision_patch_size=16, context_length=24,
                  vocab_size=512, transformer_width=64, transformer_heads=2,
                  transformer_layers=3, long_clip=True)


def make_pair(seed=0):
    torch.manual_seed(seed)
    oracle = TinyCLIP()
    oracle.eval()
    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
    params = clip_from_torch(sd, TINY.vision_layers, TINY.transformer_layers)
    model = CLIP(TINY)
    return oracle, model, {"params": params}


# ------------------------------------------------------------------ attention
def test_csa_attention_formula(rng):
    b, s, d, h = 2, 10, 32, 4
    q = rng.standard_normal((b, s, d), dtype=np.float32)
    k = rng.standard_normal((b, s, d), dtype=np.float32)
    v = rng.standard_normal((b, s, d), dtype=np.float32)
    out = multi_head_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), h, csa=True)

    # torch reference formula (ref: clip/model.py:295-301)
    def split(t):
        return torch.from_numpy(t).view(b, s, h, d // h).transpose(1, 2)

    scale = (d // h) ** -0.5
    qh, kh, vh = split(q), split(k), split(v)
    w = torch.softmax(qh @ qh.transpose(-1, -2) * scale, -1) + \
        torch.softmax(kh @ kh.transpose(-1, -2) * scale, -1)
    ref = (w @ vh).transpose(1, 2).reshape(b, s, d)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=2e-4, atol=2e-5)
    # CSA weights are not row-stochastic: rows sum to 2
    np.testing.assert_allclose(w.sum(-1).numpy(), 2.0, rtol=1e-5)


def test_causal_attention_matches_torch(rng):
    b, s, d, h = 2, 9, 32, 4
    q = rng.standard_normal((b, s, d), dtype=np.float32)
    k = rng.standard_normal((b, s, d), dtype=np.float32)
    v = rng.standard_normal((b, s, d), dtype=np.float32)
    bias = jnp.triu(jnp.full((s, s), -jnp.inf), k=1)
    out = multi_head_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), h,
                               attn_bias=bias)
    ref = torch.nn.functional.scaled_dot_product_attention(
        torch.from_numpy(q).view(b, s, h, d // h).transpose(1, 2),
        torch.from_numpy(k).view(b, s, h, d // h).transpose(1, 2),
        torch.from_numpy(v).view(b, s, h, d // h).transpose(1, 2),
        is_causal=True).transpose(1, 2).reshape(b, s, d)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=2e-4, atol=2e-5)


# ------------------------------------------------------------------ tokenizer
def toy_tokenizer():
    # toy merge table: enough to exercise the BPE merge loop
    merges = [("h", "e"), ("l", "l"), ("he", "ll"), ("hell", "o</w>"),
              ("w", "o"), ("r", "l"), ("d", "</w>"), ("wo", "rl")]
    return SimpleTokenizer(merges=merges)


def test_bytes_to_unicode_reversible():
    m = bytes_to_unicode()
    assert len(m) == 256 and len(set(m.values())) == 256


def test_toy_bpe_merges():
    tok = toy_tokenizer()
    ids = tok.encode("hello hello")
    assert len(ids) == 2 and ids[0] == ids[1]
    assert tok.decode(ids).strip() == "hello hello"


def test_tokenize_frame_and_truncate():
    tok = toy_tokenizer()
    out = tokenize(["hello"], context_length=8, tokenizer=tok)
    sot, eot = tok.encoder["<|startoftext|>"], tok.encoder["<|endoftext|>"]
    assert out.shape == (1, 8)
    assert out[0, 0] == sot and eot in out[0]
    # truncation keeps EOT last (ref: clip/clip.py:344-351)
    long = tokenize(["hello " * 50], context_length=8, truncate=True, tokenizer=tok)
    assert long[0, -1] == eot
    with pytest.raises(RuntimeError):
        tokenize(["hello " * 50], context_length=8, tokenizer=tok)


def test_default_context_is_248():
    from egm_unet_tpu.models.clip.tokenizer import LONG_CONTEXT

    assert LONG_CONTEXT == 77 * 4 - 60 == 248


# ------------------------------------------------------------- converter+CLIP
def test_encode_text_parity(rng):
    oracle, model, variables = make_pair()
    text = rng.integers(1, 500, size=(3, TINY.context_length)).astype(np.int32)
    text[:, 0] = 0
    text[:, -1] = 511  # EOT = max id
    ref = oracle.encode_text(torch.from_numpy(text.astype(np.int64)))
    got = model.apply(variables, jnp.asarray(text), method=CLIP.encode_text)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=2e-4, atol=2e-4)


def test_encode_image_parity_with_csa(rng):
    oracle, model, variables = make_pair()
    img = rng.standard_normal((2, 32, 32, 3), dtype=np.float32)
    ref = oracle.encode_image(torch.from_numpy(np.transpose(img, (0, 3, 1, 2))))
    got = model.apply(variables, jnp.asarray(img), method=CLIP.encode_image)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=5e-4, atol=5e-4)


def test_dense_forward_parity(rng):
    oracle, model, variables = make_pair()
    img = rng.standard_normal((2, 32, 32, 3), dtype=np.float32)
    ref_pooled, ref_acts = oracle.visual.forward_dense(
        torch.from_numpy(np.transpose(img, (0, 3, 1, 2))), extract_layers=[0, 1])
    got_pooled, got_acts = model.apply(variables, jnp.asarray(img), [0, 1],
                                       method=CLIP.visual_forward_dense)
    np.testing.assert_allclose(np.asarray(got_pooled), ref_pooled.numpy(),
                               rtol=5e-4, atol=5e-4)
    for g, r in zip(got_acts, ref_acts):
        np.testing.assert_allclose(np.asarray(g), r.numpy(), rtol=5e-4, atol=5e-4)


def test_pos_embedding_interpolation_shapes(rng):
    """Non-224 inputs rescale the patch pos-emb bicubically
    (ref: clip/model.py:263-281)."""
    oracle, model, variables = make_pair()
    img = rng.standard_normal((1, 64, 64, 3), dtype=np.float32)  # 4x4 grid vs 2x2
    got = model.apply(variables, jnp.asarray(img), method=CLIP.encode_image)
    assert got.shape == (1, 32)
    assert np.isfinite(np.asarray(got)).all()


def test_longclip_stretch_formula():
    """Exact parity with the loop in ref: clip/clip.py:230-251."""
    rng = np.random.default_rng(0)
    pe = rng.standard_normal((77, 8)).astype(np.float32)
    out = stretch_positional_embedding(pe, keep_len=20)
    assert out.shape == (4 * 77 - 3 * 20, 8)
    np.testing.assert_array_equal(out[:20], pe[:20])
    np.testing.assert_array_equal(out[20], pe[20])
    np.testing.assert_allclose(out[21], 0.75 * pe[20] + 0.25 * pe[21], rtol=1e-6)
    np.testing.assert_allclose(out[22], 0.5 * pe[20] + 0.5 * pe[21], rtol=1e-6)
    # extrapolated tail
    d = pe[76] - pe[75]
    np.testing.assert_allclose(out[-1], pe[76] + 3 * d / 4, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(out[-4], pe[76], rtol=1e-6)


def test_contrastive_forward_shapes(rng):
    _, model, variables = make_pair()
    img = jnp.asarray(rng.standard_normal((2, 32, 32, 3), dtype=np.float32))
    txt = jnp.asarray(rng.integers(1, 500, size=(3, TINY.context_length)).astype(np.int32))
    li, lt = model.apply(variables, img, txt)
    assert li.shape == (2, 3) and lt.shape == (3, 2)
