"""NHWC convolution primitives.

Thin, explicit wrappers over ``lax.conv_general_dilated`` so every model
layer in the framework uses identical dimension numbers — activations NHWC,
kernels HWIO — which XLA maps straight onto the MXU without layout copies.

Padding semantics follow the PyTorch reference: an integer pad ``p`` means
symmetric zero padding of ``p`` on both sides of H and W (ref:
src/EGM-UNet.py:958-975 BasicConv uses Conv2d(padding=p)).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax import lax

_DIMNUMS = ("NHWC", "HWIO", "NHWC")


def _pair(v) -> tuple[int, int]:
    if isinstance(v, (tuple, list)):
        a, b = v
        return int(a), int(b)
    return int(v), int(v)


def conv2d(
    x: jax.Array,
    w: jax.Array,
    *,
    stride: int | Sequence[int] = 1,
    padding: int | Sequence[int] = 0,
    dilation: int | Sequence[int] = 1,
    groups: int = 1,
) -> jax.Array:
    """2-D convolution, NHWC x HWIO -> NHWC.

    ``w`` has shape (kh, kw, in_ch // groups, out_ch).  Output is in the
    input dtype; for bf16 inputs the TPU MXU still accumulates in fp32
    internally.  (We deliberately do NOT pass preferred_element_type: its
    f32 upcast has a broken conv-transpose VJP with bf16 primals in
    jax 0.9 — 'requires arguments to have the same dtypes'.)
    """
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    dh, dw = _pair(dilation)
    return lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(sh, sw),
        padding=((ph, ph), (pw, pw)),
        rhs_dilation=(dh, dw),
        dimension_numbers=_DIMNUMS,
        feature_group_count=groups,
    )


def conv3x3_dots(x: jax.Array, w: jax.Array, b: jax.Array | None = None,
                 *, relu: bool = False) -> jax.Array:
    """3x3/stride-1/pad-1 conv written as nine shifted dot_generals.

    A microbench alternative to the conv primitive (tools/conv_bench.py):
    routes the contraction through XLA's dot emitter instead of the conv
    emitter to see which pipeline the TPU backend schedules better at the
    EGM encoder shapes.  Accumulates in f32 like the MXU conv path.
    """
    bsz, h, wd, _ = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = None
    for dy in range(3):
        for dx in range(3):
            a = lax.slice(xp, (0, dy, dx, 0), (bsz, dy + h, dx + wd, xp.shape[-1]))
            y = lax.dot_general(a, w[dy, dx].astype(x.dtype),
                                (((3,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
            acc = y if acc is None else acc + y
    if b is not None:
        acc = acc + b.astype(jnp.float32)
    if relu:
        acc = jnp.maximum(acc, 0.0)
    return acc.astype(x.dtype)


def depthwise_conv2d(
    x: jax.Array,
    w: jax.Array,
    *,
    stride: int | Sequence[int] = 1,
    padding: int | Sequence[int] = 0,
    dilation: int | Sequence[int] = 1,
) -> jax.Array:
    """Depthwise conv: ``w`` shape (kh, kw, 1, C); groups == C."""
    c = x.shape[-1]
    return conv2d(x, w, stride=stride, padding=padding, dilation=dilation, groups=c)


def conv_transpose2d_nonoverlap(x: jax.Array, w: jax.Array) -> jax.Array:
    """Transposed conv with stride == kernel size (non-overlapping patches).

    This is the only transposed-conv shape the reference uses (the CLIPSeg
    16x16-stride upsampling head, ref: models/clipseg.py:395-414), and with
    stride == k it degenerates to a per-pixel matmul + pixel-shuffle:

        out[b, i*k+di, j*k+dj, o] = sum_c x[b,i,j,c] * w[c, di, dj, o]

    which is a single MXU matmul instead of a scatter — the TPU-native way
    to express it.  ``w`` has shape (C_in, kh, kw, C_out).
    """
    b, h, wdt, c = x.shape
    cin, kh, kw, cout = w.shape
    assert c == cin, f"channel mismatch {c} != {cin}"
    y = jnp.einsum(
        "bhwc,cklo->bhwklo",
        x,
        w,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    y = y.transpose(0, 1, 3, 2, 4, 5)  # b, h, kh, w, kw, o
    return y.reshape(b, h * kh, wdt * kw, cout)
