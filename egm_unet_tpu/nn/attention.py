"""Attention modules of the EGM-UNet family (flax.linen, NHWC).

The reference expresses the three MCA gates by physically permuting NCHW
tensors and running (1,k) convs through a permute trick
(ref: src/EGM-UNet.py:686-791,836-869).  Here each gate is an *axis-generic*
squeeze op: reduce the other axes to a vector, run a length-k 1-D conv along
the gated axis, sigmoid, and broadcast-multiply — no data movement, and XLA
fuses the whole gate into one VPU pass.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from egm_unet_tpu.nn.layers import Conv, torch_kernel_init
from egm_unet_tpu.ops.fft import fft_magnitude_enhance
from egm_unet_tpu.ops.pooling import avg_pool2d, max_pool2d, min_pool2d
from egm_unet_tpu.ops.shuffle import channel_shuffle


def mca_kernel_size(channels: int) -> int:
    """k = round(|log2(C) - 1| / 1.5) forced odd (ref: src/EGM-UNet.py:694-697)."""
    temp = round(abs((math.log2(channels) - 1) / 1.5))
    k = temp if temp % 2 else temp - 1
    return max(k, 1)


def _conv1d_same(v: jax.Array, kernel: jax.Array) -> jax.Array:
    """1-D conv along the last axis of [B, L], SAME zero padding, no bias."""
    k = kernel.shape[0]
    pad = (k - 1) // 2
    out = lax.conv_general_dilated(
        v[:, :, None].astype(jnp.float32),  # N L C
        kernel[:, None, None].astype(jnp.float32),  # H I O
        window_strides=(1,),
        padding=((pad, pad),),
        dimension_numbers=("NHC", "HIO", "NHC"),
    )
    return out[:, :, 0].astype(v.dtype)


class MCAGate(nn.Module):
    """One multi-dimension-coordinate-attention gate along ``axis``.

    For the gated axis a (1=H, 2=W, 3=C of NHWC x):
      avg/std pooled over the other two axes -> [B, L];
      blend 0.5*(avg+std) + sigmoid(w0)*avg + sigmoid(w1)*std  (w ~ U[0,1));
      1-D conv of size k (SAME, no bias); sigmoid; multiply along a.
    ref: src/EGM-UNet.py:836-869 (incl. the torch.rand(2) blend weights).
    """

    axis: int
    k_size: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, return_gate: bool = False):
        import os

        reduce_axes = tuple(a for a in (1, 2, 3) if a != self.axis)
        # centered second moment (mean pass, then E[(x-mean)²] pass): the
        # single-pass E[x²]-E[x]² form loses ~log2(mean²/var) bits to
        # cancellation on post-ReLU activations whose mean dwarfs the spread,
        # which can flip the sigmoid gate vs the torch oracle.  Both reduces
        # still fuse tensor-wide; the extra read of x is ~2 GB/s-level noise
        # next to the conv traffic (PERF.md).
        # EGM_GATE_MATH=native: serving-only knob that keeps the pooled
        # statistics in the activation dtype (drops the f32 convert islands
        # the round-1 profile flagged); off-parity, argmax masks measured
        # insensitive — see PERF.md round 3.
        math_dt = (x.dtype if os.environ.get("EGM_GATE_MATH", "f32") ==
                   "native" else jnp.float32)
        xf = x.astype(math_dt)
        n = 1
        for a in reduce_axes:
            n *= x.shape[a]
        avg = jnp.mean(xf, axis=reduce_axes)
        keep = avg.reshape([x.shape[0]] + [x.shape[self.axis] if a == self.axis
                                           else 1 for a in (1, 2, 3)])
        var = jnp.mean((xf - keep) ** 2, axis=reduce_axes) * (n / max(n - 1, 1))
        std = jnp.sqrt(var)
        w = self.param("weight", nn.initializers.uniform(scale=1.0), (2,), jnp.float32)
        sw = jax.nn.sigmoid(w)
        blended = 0.5 * (avg + std) + sw[0] * avg + sw[1] * std

        kernel = self.param(
            "conv",
            lambda key, shape: torch_kernel_init(key, (shape[0], 1, 1, 1), jnp.float32)[:, 0, 0, 0],
            (self.k_size,),
        )
        gate = jax.nn.sigmoid(_conv1d_same(blended, kernel))  # [B, L]
        if return_gate:
            return gate
        shape = [x.shape[0], 1, 1, 1]
        shape[self.axis] = x.shape[self.axis]
        return x * gate.reshape(shape).astype(x.dtype)


class MCALayer(nn.Module):
    """Enhanced multi-dimension coordinate attention (module "C").

    x_out = mean of H/W/C gates; output = 0.4*x_out + 0.2*local_range
    + 0.2*local_variance + 0.1*freq_enhanced + 0.1*channel_shuffled
    (ref: src/EGM-UNet.py:686-791; the FFT term reduces to 1.1*x_out,
    see ops/fft.py).
    """

    no_spatial: bool = False
    dtype: Any = jnp.float32
    impl: Optional[str] = None  # 'xla' | 'pallas'; default $EGM_MCA_IMPL or xla

    @nn.compact
    def __call__(self, x):
        import os

        c = x.shape[-1]
        gate_h = MCAGate(axis=1, k_size=3, dtype=self.dtype, name="h_cw")
        gate_w = MCAGate(axis=2, k_size=3, dtype=self.dtype, name="w_hc")
        gate_c = MCAGate(axis=3, k_size=mca_kernel_size(c), dtype=self.dtype,
                         name="c_hw")

        impl = self.impl or os.environ.get("EGM_MCA_IMPL", "xla")
        if impl == "pallas" and not self.no_spatial and x.ndim == 4 \
                and c % 4 == 0:
            # one-pass fused enhancement kernel (ops/pallas/mca.py): the
            # gate vectors (tiny) come from XLA, everything downstream —
            # gating, range/variance pools, shuffle, combine — is one
            # HBM pass instead of ~8
            from egm_unet_tpu.ops.pallas.mca import mca_fused

            g_h = gate_h(x, return_gate=True)
            g_w = gate_w(x, return_gate=True)
            g_c = gate_c(x, return_gate=True)
            return mca_fused(x, g_h, g_w, g_c, groups=4)

        x_h = gate_h(x)
        x_w = gate_w(x)
        if not self.no_spatial:
            x_c = gate_c(x)
            x_out = (x_c + x_h + x_w) / 3.0
        else:
            x_out = (x_h + x_w) / 2.0

        from egm_unet_tpu.ops.quant import qstore

        # int8-dataflow storage site: x_out is read by five consumers
        # (range/mean/variance pools, shuffle, combine) — storing it 8-bit
        # halves all five reads (post-gate values are non-negative)
        x_out = qstore(self, x_out, "xout")

        local_range = max_pool2d(x_out, 3, 1, 1) - min_pool2d(x_out, 3, 1, 1)
        mean = avg_pool2d(x_out, 3, 1, 1)
        local_variance = avg_pool2d((x_out - mean) ** 2, 3, 1, 1)
        freq = fft_magnitude_enhance(x_out, 1.1)
        shuffled = channel_shuffle(x_out, groups=4)
        out = (
            0.4 * x_out
            + 0.2 * local_range
            + 0.2 * local_variance
            + 0.1 * freq
            + 0.1 * shuffled
        )
        stored = qstore(self, out, "out")
        if stored is out and os.environ.get("EGM_MCA_BARRIER", "1") == "1":
            # materialize the 5-term combine: without the barrier XLA fuses
            # this expensive producer into the consumer conv's input and
            # recomputes it per 3x3 window tap (profiled: down1/down2 conv2
            # run 2-4x off roofline; barrier measured +2.4% end to end,
            # bit-identical — PERF.md round 2).  In int8df mode the qstore
            # above already materializes the combine — as uint8, halving
            # the consumer conv's tap-amplified reads.
            stored = jax.lax.optimization_barrier(stored)
        return stored


class RecursiveGatedAttention(nn.Module):
    """Module "B": conv-based recursive gating at the bottleneck
    (ref: src/EGM-UNet.py:458-547; gnconv-style, order=2).

    split = [dim/2, dim/2]; proj_in dim -> dim/2 + dim; depthwise 3x3 on the
    gate half x learnable scale; per-order sigmoid gate maps
    (1x1 -> GELU -> 1x1 -> sigmoid) applied multiplicatively with 1x1
    transforms between orders; proj_out back to dim.
    """

    dim: int
    order: int = 2
    reduction: int = 8
    kernel_size: int = 3
    dtype: Any = jnp.float32

    def setup(self):
        split = [self.dim // (2**i) for i in range(1, self.order)]
        split.append(self.dim // (2 ** (self.order - 1)))
        split.reverse()
        if sum(split) > self.dim:
            split[-1] = self.dim - sum(split[:-1])
        self.split_sizes = tuple(split)

    @nn.compact
    def __call__(self, x):
        split = list(self.split_sizes)
        total = sum(split)
        fused = Conv(split[0] + total, 1, dtype=self.dtype, name="proj_in")(x)
        base, gates = fused[..., : split[0]], fused[..., split[0] :]

        scale = self.param("scale", nn.initializers.ones, (), jnp.float32)
        gates = Conv(total, self.kernel_size, padding=self.kernel_size // 2,
                     groups=total, dtype=self.dtype, name="dwconv")(gates)
        gates = gates * scale.astype(gates.dtype)

        out = base
        offset = 0
        for i, size in enumerate(split):
            g = gates[..., offset : offset + size]
            offset += size
            hidden = max(size // self.reduction, 8)
            gm = Conv(hidden, 1, dtype=self.dtype, name=f"gate{i}_down")(g)
            gm = nn.gelu(gm, approximate=False)
            gm = Conv(1, 1, dtype=self.dtype, name=f"gate{i}_up")(gm)
            gm = nn.sigmoid(gm)
            out = out * gm
            if i < len(split) - 1:
                out = Conv(split[i + 1], 1, dtype=self.dtype, name=f"transform{i}")(out)
        return Conv(self.dim, 1, dtype=self.dtype, name="proj_out")(out)


class ChannelAttention(nn.Module):
    """sigmoid(MLP(avgpool) + MLP(maxpool)), reduction 4, no biases
    (ref: src/EGM-UNet.py:1171-1187)."""

    reduction: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        avg = jnp.mean(x, axis=(1, 2), keepdims=True)
        mx = jnp.max(x, axis=(1, 2), keepdims=True)
        mlp_down = Conv(c // self.reduction, 1, use_bias=False, dtype=self.dtype, name="fc_down")
        mlp_up = Conv(c, 1, use_bias=False, dtype=self.dtype, name="fc_up")
        out = mlp_up(nn.relu(mlp_down(avg))) + mlp_up(nn.relu(mlp_down(mx)))
        return nn.sigmoid(out)


class SpatialAttention(nn.Module):
    """sigmoid(conv7x7([mean_c; max_c])) (ref: src/EGM-UNet.py:1189-1200)."""

    kernel_size: int = 7
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        avg = jnp.mean(x, axis=-1, keepdims=True)
        mx = jnp.max(x, axis=-1, keepdims=True)
        s = jnp.concatenate([avg, mx], axis=-1)
        s = Conv(1, self.kernel_size, padding=self.kernel_size // 2,
                 use_bias=False, dtype=self.dtype)(s)
        return nn.sigmoid(s)
