"""Auxiliary modules the reference defines but never wires into the live
graph (ref: src/EGM-UNet.py:56-340; SURVEY.md §2.1 "defined-but-unused").
Implemented for inventory completeness so users porting experiments can use
them; none appears in the EGM-UNet forward.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from egm_unet_tpu.nn.layers import Conv, torch_kernel_init
from egm_unet_tpu.ops.conv import conv2d, depthwise_conv2d

SCHARR_X = jnp.array([[3.0, 0.0, -3.0], [10.0, 0.0, -10.0], [3.0, 0.0, -3.0]])
SCHARR_Y = jnp.array([[3.0, 10.0, 3.0], [0.0, 0.0, 0.0], [-3.0, -10.0, -3.0]])
SOBEL_KY = jnp.array([[1.0, 2.0, 1.0], [0.0, 0.0, 0.0], [-1.0, -2.0, -1.0]])


class ELA(nn.Module):
    """Efficient Local Attention (ref: src/EGM-UNet.py:56-79): per-axis mean
    squeeze -> shared depthwise 1-D conv -> GroupNorm(16) -> sigmoid gates
    multiplied along H and W."""

    kernel_size: int = 7
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # NHWC
        b, h, w, c = x.shape
        k = self.kernel_size
        kernel = self.param("conv", torch_kernel_init, (k, 1, 1, c), jnp.float32)
        gn = nn.GroupNorm(num_groups=16, epsilon=1e-5, dtype=jnp.float32,
                          param_dtype=jnp.float32, name="gn")

        def gate(v):  # [B, L, C] -> sigmoid(GN(dwconv1d(v)))
            y = jax.lax.conv_general_dilated(
                v.astype(jnp.float32), kernel.reshape(k, 1, c),  # (k,1,C) HIO
                window_strides=(1,), padding=((k // 2, k // 2),),
                dimension_numbers=("NHC", "HIO", "NHC"),
                feature_group_count=c).astype(v.dtype)
            return jax.nn.sigmoid(gn(y))

        x_h = gate(jnp.mean(x, axis=2))[:, :, None, :]  # gate along H
        x_w = gate(jnp.mean(x, axis=1))[:, None, :, :]  # gate along W
        return x * x_h * x_w


def scharr_conv(x: jax.Array) -> jax.Array:
    """Per-channel Scharr edge strength sqrt(gx^2 + gy^2)
    (ref: src/EGM-UNet.py:80-127)."""
    c = x.shape[-1]
    kx = jnp.broadcast_to(SCHARR_X[:, :, None, None], (3, 3, 1, c))
    ky = jnp.broadcast_to(SCHARR_Y[:, :, None, None], (3, 3, 1, c))
    gx = depthwise_conv2d(x, kx.astype(x.dtype), padding=1)
    gy = depthwise_conv2d(x, ky.astype(x.dtype), padding=1)
    return jnp.sqrt(gx**2 + gy**2)


def sobel_conv(x: jax.Array) -> jax.Array:
    """Sum of per-channel Sobel x/y responses.

    The reference expresses this through a Conv3d trick and then selects
    depth slice 0 (ref: src/EGM-UNet.py:146-147) — but with a depth-1 kernel
    and depth padding 1, slice 0 is the *zero-pad* window, so the reference
    module returns all zeros (dead code, and broken).  We implement the
    evident intent: the depthwise 2-D Sobel responses."""
    c = x.shape[-1]
    ky = jnp.broadcast_to(SOBEL_KY[:, :, None, None], (3, 3, 1, c))
    kx = jnp.broadcast_to(SOBEL_KY.T[:, :, None, None], (3, 3, 1, c))
    return (depthwise_conv2d(x, kx.astype(x.dtype), padding=1)
            + depthwise_conv2d(x, ky.astype(x.dtype), padding=1))


class WConv2d(nn.Module):
    """Density-weighted conv (ref: src/EGM-UNet.py:172-206): kernel
    elementwise-scaled by Phi = outer([den..., 1, rev(den)...]) and output
    scaled by a learnable alpha."""

    features: int
    kernel_size: int = 3
    den: Sequence[float] = (0.5,)
    stride: int = 1
    padding: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        cin = x.shape[-1]
        w = self.param("weight", nn.initializers.variance_scaling(
            2.0, "fan_out", "truncated_normal"), (k, k, cin, self.features),
            jnp.float32)
        alpha = self.param("alpha", nn.initializers.ones, ())
        den = jnp.asarray(self.den, jnp.float32)
        alfa = jnp.concatenate([den, jnp.ones((1,)), den[::-1]])
        assert alfa.shape[0] == k, f"den gives Phi {alfa.shape[0]} != kernel {k}"
        phi = jnp.outer(alfa, alfa)[:, :, None, None]
        return conv2d(x, (w * phi).astype(x.dtype), stride=self.stride,
                      padding=self.padding) * alpha.astype(x.dtype)


class HEGDC(nn.Module):
    """Hybrid Edge-Guided Double Conv (ref: src/EGM-UNet.py:210-340):
    frozen 4-kernel Scharr+Sobel edge bank on the channel mean, dynamic-norm
    fusion with gamma 0.5, 5->8->mid sigmoid edge weights, density-modulated
    first conv, edge-guided modulation, second conv+BN+ReLU."""

    features: int
    mid_features: Optional[int] = None
    den: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from egm_unet_tpu.nn.layers import BatchNorm

        mid = self.mid_features or self.features
        # frozen edge bank (normalized kernels, ref: :249-261)
        bank = jnp.stack([SCHARR_X / 16.0, SCHARR_Y / 16.0,
                          SOBEL_KY.T / 4.0, SOBEL_KY / 4.0], axis=-1)[:, :, None, :]
        x_mean = jnp.mean(x, axis=-1, keepdims=True)
        edges = jax.lax.stop_gradient(conv2d(x_mean, bank.astype(x.dtype), padding=1))
        sx, sy = edges[..., 0:1], edges[..., 1:2]
        gx, gy = edges[..., 2:3], edges[..., 3:4]

        def dynamic_norm_fusion(sx, sy, gx, gy):
            scharr = jnp.sqrt(sx**2 + sy**2 + 1e-6)
            scharr = (scharr - scharr.min()) / (scharr.max() - scharr.min() + 1e-6)
            scharr = jnp.power(scharr, 0.5)  # gamma correction
            sobel = jnp.abs(gx) + jnp.abs(gy)
            sobel = (sobel - sobel.min()) / (sobel.max() - sobel.min() + 1e-6)
            a = jax.nn.sigmoid(scharr.mean() - sobel.mean())
            return a * scharr + (1 - a) * sobel

        fused = jax.lax.stop_gradient(dynamic_norm_fusion(sx, sy, gx, gy))
        all_edges = jnp.concatenate([edges, fused], axis=-1)  # [B,H,W,5]

        ew = Conv(8, 1, dtype=self.dtype, name="edge_fusion0")(all_edges)
        ew = nn.relu(ew)
        ew = Conv(mid, 1, dtype=self.dtype, name="edge_fusion1")(ew)
        edge_weights = nn.sigmoid(ew)

        den = self.param("den", lambda *_: jnp.asarray([self.den], jnp.float32), )
        alpha = self.param("alpha", nn.initializers.ones, ())
        phi = jnp.full((3, 3, 1, 1), jax.nn.sigmoid(den[0]))
        w1 = self.param("conv1_kernel", torch_kernel_init,
                        (3, 3, x.shape[-1], mid), jnp.float32)
        y = conv2d(x, (w1 * phi).astype(x.dtype), padding=1)
        y = BatchNorm(dtype=self.dtype, name="bn1")(y, train)
        y = nn.relu(y)
        y = y * edge_weights * alpha.astype(y.dtype)
        y = Conv(self.features, 3, padding=1, use_bias=False,
                 dtype=self.dtype, name="conv2")(y)
        y = BatchNorm(dtype=self.dtype, name="bn2")(y, train)
        return nn.relu(y)


def soft_pooling_2d(x: jax.Array) -> jax.Array:
    """Global exponential-weighted (soft) pool over H,W: [B,H,W,C] ->
    [B,1,1,C] of sum(e^x * x) / sum(e^x) (ref: src/EGM-UNet.py:804-826
    SoftPooling2D — dead code; nothing in the reference instantiates it).

    Computed via a shifted log-sum-exp so large activations don't overflow:
    softpool(x) = sum(softmax(x) * x) over the spatial axes.
    """
    xf = x.astype(jnp.float32)
    b, h, w, c = x.shape
    flat = xf.reshape(b, h * w, c)
    weights = jax.nn.softmax(flat, axis=1)
    out = jnp.sum(weights * flat, axis=1)
    return out.reshape(b, 1, 1, c).astype(x.dtype)
