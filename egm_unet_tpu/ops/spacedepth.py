"""Space-to-depth rewrite of stride-1 3x3 convs (exact).

At 512² the EGM stem and last decoder stage run convs with C=3..64 — far
below the TPU's 128-lane width, so the MXU runs at 25-50% utilization and
XLA's layout choices flip-flop (PERF.md).  A stride-1 3x3 conv on [H, W, C]
is *exactly* expressible on the 2x2-cell space-to-depth tensor
[H/2, W/2, 4C] as a 3x3 conv with a sparse rearranged kernel
[3, 3, 4C, 4Cout]:

    out[2i+a, 2j+b, co] = conv(x, W)[2i+a, 2j+b, co]
                        = conv_cells(s2d(x), W')[i, j, (2a+b)·Cout + co]
    W'[di, dj, (2p+q)·Cin + ci, (2a+b)·Cout + co] = W[u, v, ci, co]
        with u = 2·di + p - a - 1, v = 2·dj + q - b - 1 when both in [0, 3)
        (zero otherwise)

4x the MACs (the zeros are multiplied too) at ~4x better lane utilization
for Cout <= 32 — whether it wins is layout-dependent, so it ships as a
measurable impl switch, not a default.  ``double_conv_s2d`` keeps a whole
(conv+bias+relu) x2 block in cell space to amortize the two relayouts.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def space_to_depth(x: jax.Array) -> jax.Array:
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space(x: jax.Array) -> jax.Array:
    b, h2, w2, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h2, w2, 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, 2 * h2, 2 * w2, c)


def s2d_kernel(w: jax.Array) -> jax.Array:
    """[3, 3, Cin, Cout] HWIO -> the cell-space [3, 3, 4Cin, 4Cout] kernel."""
    assert w.shape[:2] == (3, 3), w.shape
    cin, cout = w.shape[2], w.shape[3]
    taps = []  # (di, dj, in_block, out_block, u, v)
    for a in range(2):
        for b in range(2):
            for p in range(2):
                for q in range(2):
                    for di in range(3):
                        u = 2 * di + p - a - 1
                        if not 0 <= u < 3:
                            continue
                        for dj in range(3):
                            v = 2 * dj + q - b - 1
                            if 0 <= v < 3:
                                taps.append((di, dj, 2 * p + q, 2 * a + b, u, v))
    w4 = jnp.zeros((3, 3, 4 * cin, 4 * cout), w.dtype)
    for di, dj, ib, ob, u, v in taps:
        w4 = w4.at[di, dj, ib * cin : (ib + 1) * cin,
                   ob * cout : (ob + 1) * cout].set(w[u, v])
    return w4


def conv3x3_s2d(x: jax.Array, w: jax.Array, bias=None) -> jax.Array:
    """Exact stride-1 pad-1 3x3 conv via cell space (even H and W)."""
    y = conv3x3_cells(space_to_depth(x), w, bias)
    return depth_to_space(y)


def conv3x3_cells(cells: jax.Array, w: jax.Array, bias=None) -> jax.Array:
    """The cell-space conv itself: [B, H/2, W/2, 4Cin] -> [B, H/2, W/2, 4Cout]."""
    w4 = s2d_kernel(w).astype(cells.dtype)
    y = lax.conv_general_dilated(
        cells, w4, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        y = y + jnp.tile(bias.astype(y.dtype), 4)
    return y


def double_conv_s2d(x: jax.Array, w1, b1, w2, b2) -> jax.Array:
    """relu(conv(relu(conv(x, w1) + b1), w2) + b2) entirely in cell space —
    one s2d and one d2s relayout for the whole folded DoubleConv."""
    cells = space_to_depth(x)
    cells = jax.nn.relu(conv3x3_cells(cells, w1, b1))
    cells = jax.nn.relu(conv3x3_cells(cells, w2, b2))
    return depth_to_space(cells)
