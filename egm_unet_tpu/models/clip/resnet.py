"""ModifiedResNet CLIP vision tower (ref: clip/model.py:14-157).

No live reference script instantiates this tower (every EGM/CLIPSeg path is
ViT-only), but it IS reachable through the reference's ``clip.load`` on RN
checkpoints ("RN50", "RN101", ...), so parity carries it.  Differences from
the torchvision ResNet, per the reference docstring: a 3-conv stem with an
avg-pool, anti-aliased strided convs (avg-pool prepended to stride>1 convs),
and a QKV attention pool instead of the final average pool.

TPU-native shape: NHWC activations; the attention pool rides the shared
einsum ``ops.attention.multi_head_attention``.  BatchNorms are *inference
BNs*: running statistics live in the ``params`` collection as non-trainable
constants (the tower is only reachable for inference via checkpoint loading
— the reference never trains it), so the CLIP ``apply({"params": ...})``
contract stays collection-free.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from egm_unet_tpu.ops.attention import multi_head_attention
from egm_unet_tpu.ops.pooling import avg_pool2d


class InferenceBatchNorm(nn.Module):
    """Eval-mode BatchNorm2d with (scale, bias, mean, var) all in params
    (torch eps default 1e-5)."""

    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        mean = self.param("mean", nn.initializers.zeros, (c,), jnp.float32)
        var = self.param("var", nn.initializers.ones, (c,), jnp.float32)
        inv = scale / jnp.sqrt(var + self.epsilon)
        return (x.astype(jnp.float32) * inv + (bias - mean * inv)).astype(x.dtype)


def _conv(features: int, kernel: int, stride: int = 1, name: str = None):
    pad = (kernel - 1) // 2
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding=((pad, pad), (pad, pad)), use_bias=False,
                   param_dtype=jnp.float32, name=name)


class Bottleneck(nn.Module):
    """ref: clip/model.py:14-57.  All convs stride 1; stride>1 becomes an
    avg-pool after conv2 (anti-aliasing), mirrored in the downsample path."""

    planes: int
    stride: int = 1
    dtype: Any = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x):
        out = nn.relu(InferenceBatchNorm(dtype=self.dtype, name="bn1")(
            _conv(self.planes, 1, name="conv1")(x)))
        out = nn.relu(InferenceBatchNorm(dtype=self.dtype, name="bn2")(
            _conv(self.planes, 3, name="conv2")(out)))
        if self.stride > 1:
            out = avg_pool2d(out, self.stride, self.stride, 0)
        out = InferenceBatchNorm(dtype=self.dtype, name="bn3")(
            _conv(self.planes * self.expansion, 1, name="conv3")(out))

        identity = x
        if self.stride > 1 or x.shape[-1] != self.planes * self.expansion:
            identity = avg_pool2d(x, self.stride, self.stride, 0) \
                if self.stride > 1 else x
            identity = InferenceBatchNorm(dtype=self.dtype, name="ds_bn")(
                _conv(self.planes * self.expansion, 1, name="ds_conv")(identity))
        return nn.relu(out + identity)


class AttentionPool2d(nn.Module):
    """QKV attention pool (ref: clip/model.py:60-103): prepend the spatial
    mean as a query token, add learned positional embeddings, one MHA layer
    with separate q/k/v projections, return the pooled (first) token."""

    spacial_dim: int
    embed_dim: int
    num_heads: int
    output_dim: int = 0  # 0 = embed_dim
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, return_all_tokens: bool = False):
        b, h, w, c = x.shape
        tokens = x.reshape(b, h * w, c)
        tokens = jnp.concatenate(
            [jnp.mean(tokens, axis=1, keepdims=True), tokens], axis=1)
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(self.embed_dim ** -0.5),
            (self.spacial_dim ** 2 + 1, self.embed_dim), jnp.float32)
        tokens = tokens + pos.astype(tokens.dtype)[None]

        dense = lambda f, name: nn.Dense(f, dtype=self.dtype,
                                         param_dtype=jnp.float32, name=name)
        q = dense(self.embed_dim, "q_proj")(tokens)
        k = dense(self.embed_dim, "k_proj")(tokens)
        v = dense(self.embed_dim, "v_proj")(tokens)
        out = multi_head_attention(q, k, v, self.num_heads)
        out = dense(self.output_dim or self.embed_dim, "c_proj")(out)
        return out if return_all_tokens else out[:, 0]


class ModifiedResNet(nn.Module):
    """ref: clip/model.py:106-157.  ``layers`` is the per-stage Bottleneck
    count, e.g. (3, 4, 6, 3) for RN50."""

    layers: Tuple[int, ...]
    output_dim: int
    heads: int
    input_resolution: int = 224
    width: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, csa: bool = True, return_all: bool = False, **_):
        # ``csa`` is accepted for vision-tower API uniformity and ignored:
        # the reference RN tower has no CSA path (CSA lives in the ViT's
        # final block only, ref: clip/model.py:247-251)
        del csa
        w = self.width
        x = x.astype(self.dtype)
        for i, (feats, stride) in enumerate(
                [(w // 2, 2), (w // 2, 1), (w, 1)]):
            x = nn.relu(InferenceBatchNorm(dtype=self.dtype, name=f"stem_bn{i + 1}")(
                _conv(feats, 3, stride, name=f"stem_conv{i + 1}")(x)))
        x = avg_pool2d(x, 2, 2, 0)

        for stage, (planes, blocks, stride) in enumerate(
                [(w, self.layers[0], 1), (w * 2, self.layers[1], 2),
                 (w * 4, self.layers[2], 2), (w * 8, self.layers[3], 2)]):
            for blk in range(blocks):
                x = Bottleneck(planes, stride if blk == 0 else 1, self.dtype,
                               name=f"layer{stage + 1}_{blk}")(x)

        return AttentionPool2d(self.input_resolution // 32, w * 32, self.heads,
                               self.output_dim, self.dtype, name="attnpool")(
            x, return_all_tokens=return_all)
