"""Pooling ops with PyTorch-parity semantics, NHWC.

- ``max_pool2d`` matches ``nn.MaxPool2d`` (floor mode, -inf padding).
- ``avg_pool2d`` matches ``F.avg_pool2d`` with the PyTorch default
  ``count_include_pad=True`` — zero padding participates in the mean.  This
  matters at borders for the reference's edge extractor
  (``x - AvgPool3x3(x)``, ref: src/EGM-UNet.py:872-886) and the local
  variance op (ref: src/EGM-UNet.py:712-717).
- ``global_std_pool`` matches torch ``Tensor.std`` (unbiased, N-1 divisor;
  ref StdPool: src/EGM-UNet.py:827-834).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _pair(v):
    if isinstance(v, (tuple, list)):
        return int(v[0]), int(v[1])
    return int(v), int(v)


def max_pool2d(x: jax.Array, kernel=2, stride=None, padding=0,
               impl: str = "reduce_window") -> jax.Array:
    """Max pool, torch floor-mode semantics.

    Two implementations, measured on TPU v5e (EGM 512px inference):
    reduce_window costs layout-change copies around adjacent convs
    (~15 ms/iter) but the alternative 'slices' form (elementwise max over
    kh*kw shifted strided slices) measured even slower (+50 ms/iter — the
    taps don't fuse).  reduce_window stays the default; 'slices' is kept
    for experimentation.
    """
    kh, kw = _pair(kernel)
    sh, sw = _pair(stride if stride is not None else kernel)
    ph, pw = _pair(padding)
    neg = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min

    if impl == "slices":
        h, w = x.shape[1], x.shape[2]
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)),
                        constant_values=neg)
            h, w = h + 2 * ph, w + 2 * pw
        oh = (h - kh) // sh + 1
        ow = (w - kw) // sw + 1
        out = None
        for dy in range(kh):
            for dx in range(kw):
                tap = x[:, dy : dy + (oh - 1) * sh + 1 : sh,
                        dx : dx + (ow - 1) * sw + 1 : sw]
                out = tap if out is None else jnp.maximum(out, tap)
        return out

    if ph or pw:
        # Explicit pad instead of reduce_window padding — numerically
        # identical (the -inf rows are the max identity), but required for
        # spatial (H-axis) sharding correctness: when a -inf-padded
        # reduce_window and a zero-padded conv share an input in one
        # program, the GSPMD partitioner's halo materialization leaks the
        # -inf padding into the conv's global edge rows (repro:
        # tests/test_spatial_parallel.py::test_mca_pools_spatial_sharding;
        # max(v)-min(v) alongside avg_pool(v) under a 4-way 'spatial' mesh
        # returns inf at rows 0-1/H-2..H-1).  The separate pad op keeps the
        # two windows' halo paths distinct.
        x = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)),
                    constant_values=neg)
    return lax.reduce_window(
        x,
        neg,
        lax.max,
        window_dimensions=(1, kh, kw, 1),
        window_strides=(1, sh, sw, 1),
        padding=((0, 0), (0, 0), (0, 0), (0, 0)),
    )


def min_pool2d(x: jax.Array, kernel=3, stride=1, padding=1) -> jax.Array:
    """min-pool implemented as -max_pool(-x) (ref: src/EGM-UNet.py:709)."""
    return -max_pool2d(-x, kernel, stride, padding)


def avg_pool2d(x: jax.Array, kernel=3, stride=1, padding=1) -> jax.Array:
    """Average pool, count_include_pad=True (divide by constant k*k).

    Implemented as a depthwise conv with a constant 1/(k*k) kernel rather
    than reduce_window-sum: identical numerics, maps to the same TPU
    hardware path, and avoids a JAX 0.9 direct-linearize limitation where
    jit(value_and_grad) fails when a reduce_window-sum feeds an aux output
    (exactly the BN batch_stats pattern in our train step).
    """
    kh, kw = _pair(kernel)
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    c = x.shape[-1]
    w = jnp.full((kh, kw, 1, 1), 1.0 / (kh * kw), x.dtype)
    w = jnp.broadcast_to(w, (kh, kw, 1, c))
    # no preferred_element_type: f32 upcast has a broken conv VJP with bf16
    # primals in jax 0.9 (see ops/conv.py); MXU accumulates f32 regardless
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=(sh, sw),
        padding=((ph, ph), (pw, pw)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def global_avg_pool(x: jax.Array, axes=(1, 2), keepdims: bool = False) -> jax.Array:
    return jnp.mean(x, axis=axes, keepdims=keepdims)


def global_max_pool(x: jax.Array, axes=(1, 2), keepdims: bool = False) -> jax.Array:
    return jnp.max(x, axis=axes, keepdims=keepdims)


def global_std_pool(x: jax.Array, axes=(1, 2), keepdims: bool = False) -> jax.Array:
    """Unbiased std over ``axes`` (torch .std default, ddof=1)."""
    return jnp.std(x, axis=axes, ddof=1, keepdims=keepdims)
