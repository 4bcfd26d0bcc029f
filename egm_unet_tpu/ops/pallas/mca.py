"""Fused MCALayer enhancement kernel (module "C" hot path).

The XLA form of the enhanced MCALayer (nn/attention.py, ref:
src/EGM-UNet.py:686-791) costs ~8 full HBM passes over the activation per
layer: three gate multiplies, max/min/avg 3x3 pools, the local-variance
chain, the channel shuffle, and the weighted combine.  This kernel computes
everything downstream of the (tiny) gate vectors in ONE pass:

    x_out = x * (g_h + g_w + g_c) / 3                       (gate broadcast)
    out   = 0.4 x_out
          + 0.2 (max3(x_out) - min3(x_out))                 (local range)
          + 0.2 avg3((x_out - avg3(x_out))^2)               (local variance)
          + 0.1 (1.1 x_out)                                 (freq, ops/fft.py)
          + 0.1 shuffle4(x_out)                             (channel shuffle)

Pooling semantics match ops/pooling.py exactly: 3x3 stride 1, zero padding
with count_include_pad=True for avg, -inf/+inf padding for max/min.  The
variance chain needs halo 2, so each grid program DMAs a (tile_h+4)-row slab
of the pre-padded input from HBM and writes a disjoint tile_h-row output
block.  Tile height adapts to keep the f32 working set inside VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 3.0e38  # -inf stand-in that survives f32 arithmetic


def _pool9(a, op):
    """3x3 stride-1 valid-window reduce: [P, Q, C] -> [P-2, Q-2, C]."""
    ph, qw = a.shape[0], a.shape[1]
    out = None
    for di in range(3):
        for dj in range(3):
            t = a[di : di + ph - 2, dj : dj + qw - 2, :]
            out = t if out is None else op(out, t)
    return out


def _mca_kernel(h: int, w: int, tile_h: int, groups: int, c_real: int,
                out_dtype, xp_hbm, out_ref, slab, sem):
    # slab rows hold the 8-aligned padded width (>= w+8); columns beyond
    # w+4 are junk dropped below
    th = tile_h
    b = pl.program_id(0)
    ht = pl.program_id(1)
    nb = pl.num_programs(0)
    nt = pl.num_programs(1)

    # double-buffered DMA: prefetch tile k+1 while computing tile k (the
    # grid runs sequentially on one core, so scratch persists across steps;
    # the serial start/wait version was 2x SLOWER than XLA end to end)
    def start(bi, hi, buf):
        pltpu.make_async_copy(xp_hbm.at[bi, pl.ds(hi * th, th + 4)],
                              slab.at[buf], sem.at[buf]).start()

    k = b * nt + ht
    cur = jax.lax.rem(k, 2)

    @pl.when(k == 0)
    def _first():
        start(b, ht, cur)

    @pl.when(k + 1 < nb * nt)
    def _prefetch():
        ht2 = ht + 1
        b2 = jnp.where(ht2 == nt, b + 1, b)
        start(b2, jnp.where(ht2 == nt, 0, ht2), jax.lax.rem(k + 1, 2))

    pltpu.make_async_copy(xp_hbm.at[b, pl.ds(ht * th, th + 4)],
                          slab.at[cur], sem.at[cur]).wait()

    # slab already holds x_out = x * (g_h+g_w+g_c)/3, gated on the XLA side
    # (the broadcast multiply fuses into the pad that produces xp — same HBM
    # traffic, and it sidesteps Mosaic's lane-alignment rules for dynamic
    # slices of the tiny gate vectors).  Zero at padded positions.  The slab
    # width is padded to w+8 (DMA slice shapes must be 8-aligned in the
    # second-to-minor dim); drop the 4 junk columns here.
    x_out = slab[cur].astype(jnp.float32)[:, : w + 4, :]  # [th+4, w+4, c]

    # validity: real-image pixels of the padded coordinate system (3-D iotas:
    # Mosaic can't reshape an i1 vector to add a minor dim, so build the mask
    # at its broadcast rank directly)
    rows = jax.lax.broadcasted_iota(jnp.int32, (th + 4, w + 4, 1), 0) + ht * th
    cols = jax.lax.broadcasted_iota(jnp.int32, (th + 4, w + 4, 1), 1)
    mask = (rows >= 2) & (rows < h + 2) & (cols >= 2) & (cols < w + 2)

    maxm = _pool9(jnp.where(mask, x_out, -_BIG), jnp.maximum)  # [th+2, w+2, c]
    minm = _pool9(jnp.where(mask, x_out, _BIG), jnp.minimum)
    mean = _pool9(x_out, jnp.add) / 9.0  # zero pad participates (torch default)

    d = x_out[1 : th + 3, 1 : w + 3, :] - mean
    d2 = jnp.where(mask[1 : th + 3, 1 : w + 3], d * d, 0.0)
    var = _pool9(d2, jnp.add) / 9.0  # [th, w, c]

    x_i = x_out[2 : th + 2, 2 : w + 2, :]
    range_i = (maxm - minm)[1 : th + 1, 1 : w + 1, :]
    cp = x_i.shape[-1]  # lane-padded channel count (>= c_real)
    # channel shuffle as a permutation matmul (Mosaic can't split the lane
    # dim with a reshape): shuf[j] = x[(j%g)*(c/g) + j/g]  (ops/shuffle.py);
    # the formula uses the REAL channel count — lanes >= c_real are junk the
    # caller slices off
    src_i = jax.lax.broadcasted_iota(jnp.int32, (cp, cp), 0)
    dst_j = jax.lax.broadcasted_iota(jnp.int32, (cp, cp), 1)
    src_of_dst = (dst_j % groups) * (c_real // groups) + dst_j // groups
    perm = (src_i == src_of_dst).astype(jnp.float32)
    shuf = jax.lax.dot_general(x_i, perm, (((2,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)

    out = (0.4 * x_i + 0.2 * range_i + 0.2 * var
           + 0.1 * (1.1 * x_i) + 0.1 * shuf)
    out_ref[0] = out.astype(out_dtype)


def _pick_tile(h: int, w: int, c: int) -> int:
    """Largest power-of-two divisor of h whose f32 slab stays ~<=2 MB."""
    budget = 2 * 1024 * 1024
    per_row = (w + 4) * c * 4
    cap = max(budget // per_row - 4, 4)
    th = 1
    while th * 2 <= min(h, cap) and h % (th * 2) == 0:
        th *= 2
    return th


def mca_fused(x: jax.Array, g_h: jax.Array, g_w: jax.Array, g_c: jax.Array,
              groups: int = 4, interpret: bool | None = None) -> jax.Array:
    """x: [B, H, W, C]; g_h/g_w/g_c: post-sigmoid gate vectors [B, H]/[B, W]/
    [B, C] (f32).  Returns the enhanced MCALayer output, one HBM pass."""
    b, h, w, c = x.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # DMA copy shapes must have a 128-multiple lane dim: pad channels (the
    # padded lanes carry zeros; output is sliced back on the XLA side)
    cp = c if interpret else -(-c // 128) * 128
    th = _pick_tile(h, w, cp)

    gsum = (g_h.astype(jnp.float32)[:, :, None, None]
            + g_w.astype(jnp.float32)[:, None, :, None]
            + g_c.astype(jnp.float32)[:, None, None, :]) / 3.0
    x_out = (x.astype(jnp.float32) * gsum).astype(x.dtype)
    # width 8-aligned (the DMA slice's second-to-minor dim must be a multiple
    # of 8 — pad the total padded width, not just w+8, so odd w works too),
    # channels lane-aligned.  The DMA source and the slab must have EQUAL
    # widths (Mosaic verifies copy shapes match): both are w + 4 + wr.
    wr = 4 + (-(w + 8) % 8)  # right pad >= 4; (w + 4 + wr) % 8 == 0
    xp = jnp.pad(x_out, ((0, 0), (2, 2), (2, wr + 2), (0, cp - c)))

    kernel = functools.partial(_mca_kernel, h, w, th, groups, c, x.dtype)
    grid = (b, h // th)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, w, cp), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # manual DMA
        ],
        out_specs=pl.BlockSpec((1, th, w, cp), lambda bi, hi: (bi, hi, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, th + 4, w + 4 + wr, cp), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=40 * b * h * w * cp, transcendentals=0,
            bytes_accessed=2 * b * h * w * cp * x.dtype.itemsize),
        interpret=interpret,
    )(xp)
    return out if cp == c else out[..., :c]

