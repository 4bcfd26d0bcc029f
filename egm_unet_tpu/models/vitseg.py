"""VITDensePredT — the CLIPSeg decoder over a *plain* (timm-style) ViT
backbone instead of CLIP's visual tower (ref: models/vitseg.py:144-286;
vestigial in the reference — referenced only by experiments/phrasecut.yaml's
vit64-uni configs).

Differences from the CLIP ViT, mirrored here: exact GELU (not QuickGELU),
patch-embed conv WITH bias, no ln_pre (timm applies norm at the end), inputs
resized to 384 (ref: models/vitseg.py:48).  Text conditioning still comes
from a CLIP text encoder or precomputed vectors (ref: models/vitseg.py:152).
"""

from __future__ import annotations

import math
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from egm_unet_tpu.models.clip.model import LayerNormF32
from egm_unet_tpu.models.clipseg import TorchEncoderLayer
from egm_unet_tpu.ops.attention import multi_head_attention
from egm_unet_tpu.ops.conv import conv_transpose2d_nonoverlap
from egm_unet_tpu.ops.resize import resize_bilinear


class ViTBlock(nn.Module):
    """timm-style pre-norm block with exact GELU."""

    width: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = LayerNormF32(name="norm1")(x)
        qkv = nn.Dense(3 * self.width, dtype=self.dtype, param_dtype=jnp.float32,
                       name="qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        attn = multi_head_attention(q, k, v, self.heads)
        x = x + nn.Dense(self.width, dtype=self.dtype, param_dtype=jnp.float32,
                         name="proj")(attn)
        h = LayerNormF32(name="norm2")(x)
        h = nn.Dense(4 * self.width, dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.width, dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc2")(h)
        return x + h


class PlainViT(nn.Module):
    """vit_base_patch16_384-shaped backbone with activation extraction."""

    width: int = 768
    layers: int = 12
    heads: int = 12
    patch: int = 16
    resolution: int = 384
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, extract_layers=()):
        b, h, w, _ = x.shape
        p = self.patch
        patches = nn.Conv(self.width, (p, p), strides=(p, p), use_bias=True,
                          dtype=self.dtype, param_dtype=jnp.float32,
                          name="patch_embed")(x)
        tokens = patches.reshape(b, -1, self.width)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, self.width),
                         jnp.float32)
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(tokens.dtype), (b, 1, self.width)), tokens],
            axis=1)
        n_pos = (self.resolution // p) ** 2 + 1
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (n_pos, self.width), jnp.float32)
        tokens = tokens + pos.astype(tokens.dtype)[None, : tokens.shape[1]]

        acts = []
        for i in range(self.layers):
            tokens = ViTBlock(self.width, self.heads, self.dtype,
                              name=f"block{i}")(tokens)
            if i in extract_layers:
                acts.append(tokens)
        tokens = LayerNormF32(name="norm")(tokens)
        return tokens, acts


class VITDensePredT(nn.Module):
    """Same FiLM decoder pattern as CLIPDensePredT over PlainViT activations
    (ref: models/vitseg.py:144-286).  ``cond`` is a [B, cond_dim] embedding
    (precomputed prompt vectors or a CLIP text encoding)."""

    extract_layers: Tuple[int, ...] = (3, 6, 9)
    cond_layer: int = 0
    reduce_dim: int = 64
    n_heads: int = 4
    cond_dim: int = 512
    vit_width: int = 768
    vit_layers: int = 12
    vit_heads: int = 12
    resolution: int = 384
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image, cond, return_features: bool = False):
        # inputs interpolated to the backbone resolution (ref: vitseg.py:48)
        if image.shape[1] != self.resolution or image.shape[2] != self.resolution:
            image = resize_bilinear(image, (self.resolution, self.resolution),
                                    align_corners=True)
        vit = PlainViT(self.vit_width, self.vit_layers, self.vit_heads,
                       resolution=self.resolution, dtype=self.dtype, name="vit")
        _, activations = vit(image, extract_layers=list(self.extract_layers))
        activations = [jax.lax.stop_gradient(a) for a in activations]

        a = None
        for i, act in enumerate(activations[::-1]):
            red = nn.Dense(self.reduce_dim, dtype=self.dtype,
                           param_dtype=jnp.float32, name=f"reduce{i}")(act)
            a = red if a is None else red + a
            if i == self.cond_layer:
                mul = nn.Dense(self.reduce_dim, dtype=self.dtype,
                               param_dtype=jnp.float32, name="film_mul")(cond)
                add = nn.Dense(self.reduce_dim, dtype=self.dtype,
                               param_dtype=jnp.float32, name="film_add")(cond)
                a = mul[:, None, :] * a + add[:, None, :]
            a = TorchEncoderLayer(self.reduce_dim, self.n_heads, dtype=self.dtype,
                                  name=f"block{i}")(a)

        a = a[:, 1:, :]
        bs, n_tok, d = a.shape
        size = int(math.sqrt(n_tok))
        a = a.reshape(bs, size, size, d)
        kern = self.param("trans_conv_kernel",
                          nn.initializers.variance_scaling(1.0 / 3.0, "fan_in",
                                                           "uniform"),
                          (self.reduce_dim, 16, 16, 1), jnp.float32)
        bias = self.param("trans_conv_bias", nn.initializers.zeros, (1,), jnp.float32)
        a = conv_transpose2d_nonoverlap(a, kern.astype(a.dtype)) + bias
        return (a.astype(jnp.float32),)
