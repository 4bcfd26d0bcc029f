"""Fixed 3x3 edge stencils (Laplacian / Sobel) as tiny NHWC convolutions.

These back the reference's edge-aware training losses
(ref: train_utils/dice_coefficient_loss.py:59-108):

- ``LAPLACE4``: 4-neighbour Laplacian used by ``laplace_loss``.
- ``LAPLACE8``: 8-neighbour Laplacian used by ``lap_loss``.
- ``SOBEL_X`` / ``SOBEL_Y``: Sobel responses used by ``sobel_loss``.

All are applied with zero padding 1 on a single channel; XLA fuses them with
the surrounding abs/mean reductions, so no Pallas kernel is needed here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from egm_unet_tpu.ops.conv import conv2d

LAPLACE4 = jnp.array([[0.0, 1.0, 0.0], [1.0, -4.0, 1.0], [0.0, 1.0, 0.0]], jnp.float32)
LAPLACE8 = jnp.array([[-1.0, -1.0, -1.0], [-1.0, 8.0, -1.0], [-1.0, -1.0, -1.0]], jnp.float32)
SOBEL_X = jnp.array([[1.0, 0.0, -1.0], [2.0, 0.0, -2.0], [1.0, 0.0, -1.0]], jnp.float32)
SOBEL_Y = jnp.array([[1.0, 2.0, 1.0], [0.0, 0.0, 0.0], [-1.0, -2.0, -1.0]], jnp.float32)


def stencil2d(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """Apply a 3x3 single-channel stencil with zero pad 1.

    ``x``: (..., H, W) with an implicit single channel, or NHWC with C==1.
    Returns the same shape.
    """
    squeeze = False
    if x.ndim == 3:  # (B, H, W) -> NHWC
        x = x[..., None]
        squeeze = True
    elif x.ndim == 2:
        x = x[None, ..., None]
        squeeze = "hw"
    assert x.shape[-1] == 1, "stencil2d expects a single channel"
    w = kernel.astype(jnp.float32)[:, :, None, None]  # HWIO
    y = conv2d(x.astype(jnp.float32), w, padding=1)
    if squeeze == "hw":
        return y[0, ..., 0]
    if squeeze:
        return y[..., 0]
    return y
