"""CLIPSeg dense prediction head (TPU rebuild of models/clipseg.py).

``CLIPDensePredT``: frozen CLIP ViT encoder run densely with CSA attention,
activations extracted at layers (3, 6, 9), reduced 768 -> reduce_dim,
accumulated in reverse, FiLM-conditioned on the text embedding at layer 0,
refined by 3 torch-style TransformerEncoderLayers, and upsampled to pixels by
a 16x16-stride transposed conv (ref: models/clipseg.py:359-496).

TPU-first notes:
- multi-prompt inference is a batched forward (vmap over prompts) instead of
  the reference's image-repeat trick (ref: eval_CLIPseg.py:879);
- the transposed conv with stride == kernel is a per-token matmul +
  pixel-shuffle (ops.conv.conv_transpose2d_nonoverlap) — pure MXU work;
- the CLIP tower runs under ``jax.lax.stop_gradient`` (the reference freezes
  it, ref: models/clipseg.py:155-156).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from egm_unet_tpu.models.clip.model import CLIP, CLIPConfig, VIT_B16
from egm_unet_tpu.ops.attention import multi_head_attention
from egm_unet_tpu.ops.conv import conv_transpose2d_nonoverlap


def sample_prompts(words, prompt_list, rng=None):
    """Random template per word (ref: models/clipseg.py:258-264)."""
    import numpy as np

    rng = rng or np.random.default_rng()
    idx = rng.integers(0, len(prompt_list), size=len(words))
    return [prompt_list[i].format(w) for i, w in zip(idx, words)]


def get_prompt_list(prompt: str):
    """ref: models/clipseg.py:10-22."""
    if prompt == "plain":
        return ["{}"]
    if prompt == "fixed":
        return ["a photo of a {}."]
    if prompt == "shuffle":
        return ["a photo of a {}.", "a photograph of a {}.", "an image of a {}.", "{}."]
    if prompt == "shuffle+":
        return ["a photo of a {}.", "a photograph of a {}.", "an image of a {}.", "{}.",
                "a cropped photo of a {}.", "a good photo of a {}.",
                "a photo of one {}.", "a bad photo of a {}.", "a photo of the {}."]
    raise ValueError(f"unknown prompt mode {prompt!r}")


class TorchEncoderLayer(nn.Module):
    """torch nn.TransformerEncoderLayer defaults: post-norm, ReLU,
    dim_feedforward=2048 (the reference uses the stock module,
    ref: models/clipseg.py:421)."""

    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        qkv = nn.Dense(3 * self.d_model, dtype=self.dtype, param_dtype=jnp.float32,
                       name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        attn = multi_head_attention(q, k, v, self.nhead)
        attn = nn.Dense(self.d_model, dtype=self.dtype, param_dtype=jnp.float32,
                        name="out_proj")(attn)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32,
                         name="norm1")(x + attn)
        h = nn.Dense(self.dim_feedforward, dtype=self.dtype, param_dtype=jnp.float32,
                     name="linear1")(x)
        h = nn.relu(h)
        h = nn.Dense(self.d_model, dtype=self.dtype, param_dtype=jnp.float32,
                     name="linear2")(h)
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32,
                            name="norm2")(x + h)


class CLIPDensePredT(nn.Module):
    """FiLM-conditioned dense decoder over a frozen CLIP ViT."""

    clip_cfg: CLIPConfig = VIT_B16
    extract_layers: Tuple[int, ...] = (3, 6, 9)
    cond_layer: int = 0
    reduce_dim: int = 64
    n_heads: int = 4
    prompt: str = "fixed"
    extra_blocks: int = 0
    rev_activations: bool = False
    complex_trans_conv: bool = False
    attn_impl: str = "auto"  # 'pallas' = fused CSA kernel on TPU (default there)
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.clip_cfg
        self.clip = CLIP(cfg, dtype=self.dtype, attn_impl=self.attn_impl,
                         name="clip")
        depth = len(self.extract_layers)
        self.reduces = [
            nn.Dense(self.reduce_dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name=f"reduce{i}")
            for i in range(depth)
        ]
        self.blocks = [
            TorchEncoderLayer(self.reduce_dim, self.n_heads, dtype=self.dtype,
                              name=f"block{i}")
            for i in range(depth)
        ]
        self.extras = [
            TorchEncoderLayer(self.reduce_dim, self.n_heads, dtype=self.dtype,
                              name=f"extra{i}")
            for i in range(self.extra_blocks)
        ]
        self.film_mul = nn.Dense(self.reduce_dim, dtype=self.dtype,
                                 param_dtype=jnp.float32, name="film_mul")
        self.film_add = nn.Dense(self.reduce_dim, dtype=self.dtype,
                                 param_dtype=jnp.float32, name="film_add")
        ks = {32: 32, 16: 16}[cfg.vision_patch_size]
        if not self.complex_trans_conv:
            self.trans_conv_kernel = self.param(
                "trans_conv_kernel",
                nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
                (self.reduce_dim, ks, ks, 1), jnp.float32)
            self.trans_conv_bias = self.param(
                "trans_conv_bias", nn.initializers.zeros, (1,), jnp.float32)
        else:
            tk = ks // 4
            self.tc_conv = nn.Conv(self.reduce_dim, (3, 3), padding=1,
                                   dtype=self.dtype, param_dtype=jnp.float32,
                                   name="tc_conv")
            self.tc_k1 = self.param(
                "tc_k1", nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
                (self.reduce_dim, tk, tk, self.reduce_dim // 2), jnp.float32)
            self.tc_b1 = self.param("tc_b1", nn.initializers.zeros,
                                    (self.reduce_dim // 2,), jnp.float32)
            self.tc_k2 = self.param(
                "tc_k2", nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
                (self.reduce_dim // 2, tk, tk, 1), jnp.float32)
            self.tc_b2 = self.param("tc_b2", nn.initializers.zeros, (1,), jnp.float32)

    def compute_conditional(self, tokens: jax.Array) -> jax.Array:
        """Text conditioning via Long-CLIP encode_text on pre-tokenized
        [N, 248] ids (ref: models/clipseg.py:308-332; tokenization is host
        code, see clip.tokenizer.tokenize)."""
        return jax.lax.stop_gradient(self.clip.encode_text(tokens))

    def __call__(self, image: jax.Array, cond: jax.Array,
                 return_features: bool = False):
        """``image``: [B, H, W, 3] (CLIP-normalized); ``cond``: either [B, 512]
        embeddings or [B, ctx] int tokens."""
        if jnp.issubdtype(cond.dtype, jnp.integer):
            cond = self.compute_conditional(cond)

        visual_q, activations = self.clip.visual_forward_dense(
            image, extract_layers=[0] + list(self.extract_layers))
        visual_q = jax.lax.stop_gradient(visual_q)
        activations = [jax.lax.stop_gradient(a) for a in activations]
        activation1, activations = activations[0], activations[1:]

        _activations = activations[::-1] if not self.rev_activations else activations

        a = None
        for i, (act, block, reduce) in enumerate(
                zip(_activations, self.blocks, self.reduces)):
            a = reduce(act) if a is None else reduce(act) + a
            if i == self.cond_layer:
                a = self.film_mul(cond)[:, None, :] * a + self.film_add(cond)[:, None, :]
            a = block(a)

        for block in self.extras:
            a = a + block(a)

        a = a[:, 1:, :]  # strip CLS
        bs, n_tok, d = a.shape
        size = int(math.sqrt(n_tok))
        a = a.reshape(bs, size, size, d)

        if not self.complex_trans_conv:
            a = conv_transpose2d_nonoverlap(
                a, self.trans_conv_kernel.astype(a.dtype)) + self.trans_conv_bias
        else:
            a = nn.relu(self.tc_conv(a))
            a = nn.relu(conv_transpose2d_nonoverlap(
                a, self.tc_k1.astype(a.dtype)) + self.tc_b1)
            a = conv_transpose2d_nonoverlap(a, self.tc_k2.astype(a.dtype)) + self.tc_b2

        logits = a.astype(jnp.float32)  # [B, H, W, 1]
        if return_features:
            return logits, visual_q, cond, [activation1] + activations
        return (logits,)

    def visual_forward_masked(self, img_s, seg_s):
        """Pooled embedding of a support image under a visual-prompt
        attention mask (ref: models/clipseg.py:512-513: mask type
        'cls_token' applied at all layers)."""
        pooled = self.clip.visual(img_s, csa=True, dense=True,
                                  mask=("cls_token", seg_s))
        return jax.lax.stop_gradient(pooled)


class CLIPDensePredTMasked(CLIPDensePredT):
    """One-shot variant: conditioning comes from a masked support image
    instead of text (ref: models/clipseg.py:500-525)."""

    def __call__(self, img_q, cond_or_img_s, seg_s=None, return_features=False):
        if seg_s is not None:
            cond = self.visual_forward_masked(cond_or_img_s, seg_s)
        else:
            cond = cond_or_img_s
        return super().__call__(img_q, cond, return_features=return_features)


class CLIPDenseBaseline(nn.Module):
    """Single-extract-layer baseline: reduce -> FiLM -> reduce2 MLP ->
    trans_conv, no transformer decoder blocks
    (ref: models/clipseg.py:529-589)."""

    clip_cfg: CLIPConfig = VIT_B16
    extract_layer: int = 9
    reduce_dim: int = 128
    reduce2_dim: int = 64
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.clip_cfg
        self.clip = CLIP(cfg, dtype=self.dtype, name="clip")
        self.reduce = nn.Dense(self.reduce_dim, dtype=self.dtype,
                               param_dtype=jnp.float32, name="reduce")
        self.reduce2a = nn.Dense(self.reduce2_dim, dtype=self.dtype,
                                 param_dtype=jnp.float32, name="reduce2a")
        self.reduce2b = nn.Dense(self.reduce_dim, dtype=self.dtype,
                                 param_dtype=jnp.float32, name="reduce2b")
        self.film_mul = nn.Dense(self.reduce_dim, dtype=self.dtype,
                                 param_dtype=jnp.float32, name="film_mul")
        self.film_add = nn.Dense(self.reduce_dim, dtype=self.dtype,
                                 param_dtype=jnp.float32, name="film_add")
        ks = {32: 32, 16: 16}[cfg.vision_patch_size]
        self.trans_conv_kernel = self.param(
            "trans_conv_kernel",
            nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
            (self.reduce_dim, ks, ks, 1), jnp.float32)
        self.trans_conv_bias = self.param(
            "trans_conv_bias", nn.initializers.zeros, (1,), jnp.float32)

    def __call__(self, image, cond, return_features=False):
        if jnp.issubdtype(cond.dtype, jnp.integer):
            cond = jax.lax.stop_gradient(self.clip.encode_text(cond))
        visual_q, activations = self.clip.visual_forward_dense(
            image, extract_layers=[self.extract_layer])
        a = jax.lax.stop_gradient(activations[0])
        a = self.reduce(a)
        a = self.film_mul(cond)[:, None, :] * a + self.film_add(cond)[:, None, :]
        a = self.reduce2b(nn.relu(self.reduce2a(a)))
        a = a[:, 1:, :]
        bs, n_tok, d = a.shape
        size = int(math.sqrt(n_tok))
        a = a.reshape(bs, size, size, d)
        a = conv_transpose2d_nonoverlap(
            a, self.trans_conv_kernel.astype(a.dtype)) + self.trans_conv_bias
        logits = a.astype(jnp.float32)
        if return_features:
            return logits, visual_q, cond, activations
        return (logits,)


# Pascal-VOC classes (the reference ships these as datasets/pascal_classes.json)
PASCAL_VOC_CLASSES = (
    "background", "aeroplane", "bicycle", "bird", "boat", "bottle", "bus",
    "car", "cat", "chair", "cow", "diningtable", "dog", "horse", "motorbike",
    "person", "pottedplant", "sheep", "sofa", "train", "tvmonitor",
)


def clipseg_multilabel(model: CLIPDensePredT, variables, image: jax.Array,
                       class_conds: jax.Array,
                       background_factor: float = 3.0) -> jax.Array:
    """Pascal-VOC multi-class wrapper (ref: models/clipseg.py:592-625):
    per-class sigmoid maps stacked onto a -10 base, background scaled 3x.

    ``class_conds``: [21, cond] pre-encoded class-name embeddings (or
    [21, ctx] tokens).  Returns [B, H, W, 21]."""
    bs = image.shape[0]
    maps = []
    for class_id in range(class_conds.shape[0]):
        cond = jnp.broadcast_to(class_conds[class_id][None],
                                (bs, class_conds.shape[1])).astype(class_conds.dtype)
        (logits,) = model.apply(variables, image, cond)
        fac = background_factor if class_id == 0 else 1.0
        maps.append(jax.nn.sigmoid(logits[..., 0]) * fac)
    # base -10 + per-class prediction (ref: models/clipseg.py:611-620)
    return jnp.stack(maps, axis=-1) - 10.0
