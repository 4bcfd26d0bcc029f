"""Implicit-GEMM 3x3 convolution kernel (stride 1, pad 1, NHWC).

Why: the round-2/3 profiles put the encoder DoubleConv stages 2-4x off
roofline under XLA's conv emitter (down1/conv2 17.6 ms vs 7.9, down2/conv2
15.0 vs 3.9 at batch 128 — PERF.md).  The weak spot is the contraction
shape: XLA lowers these convs as per-tap passes whose K (= C_in) and N
(= C_out) underfill the 128-wide MXU for the C<=128 stages.  This kernel
rebuilds the conv as ONE deep GEMM per row block:

    A   = im2col(x window)            # (rb*Wp, 9*C)   lanes-aligned taps
    out = relu(A @ W' + b)            # W' = w.reshape(9*C, Co)

so the contraction depth is 9*C (e.g. 576 for C=64, 1152 for C=128) —
full systolic-array depth instead of nine shallow K=C passes.

Mechanics:
- the input is pre-padded on the XLA side to (B, H+2, Wp, C) where Wp
  rounds W+2 up to the sublane tile (16 for bf16), so every window the
  kernel reads is interior and every in-VMEM reshape (rb, Wp, C) ->
  (rb*Wp, C) is layout-free;
- each grid program (b, row-block) DMAs its (rb+2)-row halo window from
  HBM into a double-buffered VMEM slab (prefetching the next window while
  computing, same pattern as ops/pallas/mca.py);
- the nine taps are realised as row-slices (dy: untiled dim, free) plus
  lane-preserving width rolls (dx: ``pltpu.roll`` along the sublane axis;
  wrap columns land beyond W+1 and are never read back);
- the GEMM accumulates in f32 on the MXU, adds the (folded-BN) bias,
  applies the optional ReLU, and writes the (1, rb, W, Co) output block.

Targets the folded inference graph (conv+bias+relu); reference op:
src/EGM-UNet.py:44-55 (DoubleConv) lowered via nn/layers.py ConvBNReLU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _kernel(rb: int, wp: int, w_real: int, relu: bool, out_dtype,
            xp_hbm, w2_ref, b2_ref, out_ref, slab, sem):
    b = pl.program_id(0)
    ht = pl.program_id(1)
    nt = pl.num_programs(1)
    nb = pl.num_programs(0)

    def start(bi, hi, buf):
        pltpu.make_async_copy(xp_hbm.at[bi, pl.ds(hi * rb, rb + 2)],
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

    pltpu.make_async_copy(xp_hbm.at[b, pl.ds(ht * rb, rb + 2)],
                          slab.at[cur], sem.at[cur]).wait()

    window = slab[cur]  # (rb+2, wp, C)
    c = window.shape[-1]
    taps = []
    for dy in range(3):
        rows = window[dy:dy + rb]  # untiled leading dim: free slice
        for dx in range(3):
            # out[w] needs xp[w+dx]; roll(in, wp-dx)[w] == in[w+dx] (roll
            # shifts must be non-negative; wp-dx == -dx mod wp).  Wrap
            # columns land at w >= wp-dx > W+1 and are never read back.
            t = rows if dx == 0 else pltpu.roll(rows, wp - dx, 1)
            taps.append(t.reshape(rb * wp, c))
    a = jnp.concatenate(taps, axis=-1)  # (rb*wp, 9C)
    acc = jnp.dot(a, w2_ref[:], preferred_element_type=jnp.float32)
    acc = acc + b2_ref[:].astype(jnp.float32)
    if relu:
        acc = jnp.maximum(acc, 0.0)
    res = acc.astype(out_dtype).reshape(rb, wp, -1)
    out_ref[0] = res[:, :w_real, :]


def _pick_rb(h: int, wp: int, c: int, co: int, itemsize: int,
             budget: int = 10 * 1024 * 1024) -> int | None:
    for rb in (32, 16, 8, 4):
        if h % rb:
            continue
        slab = 2 * (rb + 2) * wp * c * itemsize
        a = rb * wp * 9 * c * itemsize
        acc = rb * wp * co * 4
        outb = 2 * rb * wp * co * itemsize
        if slab + a + acc + outb + 9 * c * co * itemsize <= budget:
            return rb
    return None


def conv3x3_gemm_supported(x_shape, c_out: int, dtype) -> bool:
    """Static routing predicate for the model-integration switch."""
    if len(x_shape) != 4:
        return False
    _, h, w, c = x_shape
    sub = 16 if dtype == jnp.bfloat16 else 8
    wp = _round_up(w + 2, sub)
    if c % 64 or c_out % 32 or h < 2:
        return False
    return _pick_rb(h, wp, c, c_out, jnp.dtype(dtype).itemsize) is not None


@functools.partial(jax.jit, static_argnames=("relu", "interpret"))
def conv3x3_gemm(x: jax.Array, w: jax.Array, b: jax.Array | None = None,
                 *, relu: bool = False,
                 interpret: bool | None = None) -> jax.Array:
    """3x3 / stride 1 / pad 1 convolution as one implicit GEMM per row block.

    x: (B, H, W, C); w: (3, 3, C, Co); b: (Co,) or None.  Exact (f32
    accumulation) vs ops.conv.conv2d(padding=1) up to dtype rounding.
    ``interpret=None`` compiles Mosaic on TPU, interprets elsewhere (CI).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bsz, h, wd, c = x.shape
    co = w.shape[-1]
    dt = x.dtype
    sub = 16 if dt == jnp.bfloat16 else 8
    wp = _round_up(wd + 2, sub)
    rb = _pick_rb(h, wp, c, co, jnp.dtype(dt).itemsize)
    if rb is None:
        raise ValueError(f"conv3x3_gemm: no row block fits for {x.shape}")

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, wp - wd - 1), (0, 0)))
    w2 = w.astype(dt).reshape(9 * c, co)
    b2 = (jnp.zeros((1, co), jnp.float32) if b is None
          else b.astype(jnp.float32).reshape(1, co))

    grid = (bsz, h // rb)
    flops = 2 * bsz * h * wd * 9 * c * co
    return pl.pallas_call(
        functools.partial(_kernel, rb, wp, wd, relu, dt),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # xp stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w2
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b2
        ],
        out_specs=pl.BlockSpec((1, rb, wd, co), lambda bi, hi: (bi, hi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, h, wd, co), dt),
        scratch_shapes=[
            pltpu.VMEM((2, rb + 2, wp, c), dt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(bsz * (h + 2) * wp * c + bsz * h * wd * co)
            * jnp.dtype(dt).itemsize,
            transcendentals=0),
        interpret=interpret,
    )(xp, w2, b2)
