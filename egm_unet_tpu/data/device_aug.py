"""Device-side paired augmentation — the TPU-native fast path.

The reference augments per-sample on the host with PIL (random short-side
resize in [0.5, 1.2]x565, flips, 480 crop; ref: transforms.py + train.py
presets).  Equivalent semantics expressed as ONE jitted gather program over a
fixed-size source batch: for each sample, draw (scale, crop offset, flips),
build the affine source coordinates of the 480x480 output, and bilinearly
sample the image / nearest-sample the mask.  Out-of-bounds source coords
reproduce the pad fills (image 0, mask 0 — ref: transforms.py:72-73).

Distribution-equivalent, not bit-identical to PIL resampling (documented in
PARITY.md); the host-side `data/transforms.py` path keeps exact reference
semantics for parity runs.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _sample_bilinear(img: jax.Array, ys: jax.Array, xs: jax.Array,
                     fill: float) -> jax.Array:
    """img [H, W, C]; ys/xs [h, w] float source coords; OOB -> fill."""
    h, w = img.shape[:2]
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    fy = (ys - y0)[..., None]
    fx = (xs - x0)[..., None]
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    def tap(yi, xi):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        v = img[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
        return jnp.where(valid[..., None], v, fill)

    top = tap(y0i, x0i) * (1 - fx) + tap(y0i, x0i + 1) * fx
    bot = tap(y0i + 1, x0i) * (1 - fx) + tap(y0i + 1, x0i + 1) * fx
    return top * (1 - fy) + bot * fy


def _sample_nearest(mask: jax.Array, ys: jax.Array, xs: jax.Array,
                    fill: int) -> jax.Array:
    h, w = mask.shape[:2]
    yi = jnp.floor(ys).astype(jnp.int32)  # PIL NEAREST: floor of center coords
    xi = jnp.floor(xs).astype(jnp.int32)
    valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
    v = mask[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
    return jnp.where(valid, v, fill)


@functools.partial(jax.jit, static_argnames=("crop_size", "min_size", "max_size"))
def augment_batch(
    key: jax.Array,
    images: jax.Array,  # [B, H, W, 3] float (already /255)
    masks: jax.Array,  # [B, H, W] int
    mean: jax.Array,
    std: jax.Array,
    crop_size: int = 480,
    min_size: int = 282,
    max_size: int = 678,
) -> Tuple[jax.Array, jax.Array]:
    """One fused program: random short-side scale -> random crop -> random
    h/v flips -> normalize.  Returns ([B, crop, crop, 3], [B, crop, crop])."""
    b, h, w, _ = images.shape
    short = min(h, w)

    k_scale, k_cy, k_cx, k_hf, k_vf = jax.random.split(key, 5)
    # random.randint is inclusive on both ends (ref: transforms.py:39)
    sizes = jax.random.randint(k_scale, (b,), min_size, max_size + 1)
    scales = sizes.astype(jnp.float32) / short  # scaled short side == sizes
    scaled_h = h * scales
    scaled_w = w * scales

    # crop offsets within the (padded-to-crop) scaled image
    max_oy = jnp.maximum(scaled_h - crop_size, 0.0)
    max_ox = jnp.maximum(scaled_w - crop_size, 0.0)
    oy = jax.random.uniform(k_cy, (b,)) * max_oy
    ox = jax.random.uniform(k_cx, (b,)) * max_ox
    hflip = jax.random.uniform(k_hf, (b,)) < 0.5
    vflip = jax.random.uniform(k_vf, (b,)) < 0.5

    ys_out = jnp.arange(crop_size, dtype=jnp.float32)
    xs_out = jnp.arange(crop_size, dtype=jnp.float32)
    grid_y, grid_x = jnp.meshgrid(ys_out, xs_out, indexing="ij")

    def one(img, mask, scale, oy, ox, hf, vf):
        gy = jnp.where(vf, crop_size - 1 - grid_y, grid_y)
        gx = jnp.where(hf, crop_size - 1 - grid_x, grid_x)
        # output pixel center -> scaled coords -> source coords
        src_y = (gy + oy + 0.5) / scale - 0.5
        src_x = (gx + ox + 0.5) / scale - 0.5
        img_o = _sample_bilinear(img, src_y, src_x, fill=0.0)
        mask_o = _sample_nearest(mask, src_y, src_x, fill=0)
        return img_o, mask_o

    imgs_o, masks_o = jax.vmap(one)(images, masks, scales, oy, ox, hflip, vflip)
    imgs_o = (imgs_o - mean) / std
    return imgs_o.astype(images.dtype), masks_o
