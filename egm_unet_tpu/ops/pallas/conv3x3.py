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


def _pair_kernel(rb: int, wp: int, w_real: int, h_real: int, out_dtype,
                 xp_hbm, w1_ref, b1_ref, w2_ref, b2_ref, out_ref, slab, sem):
    b = pl.program_id(0)
    ht = pl.program_id(1)
    nt = pl.num_programs(1)
    nb = pl.num_programs(0)

    def start(bi, hi, buf):
        pltpu.make_async_copy(xp_hbm.at[bi, pl.ds(hi * rb, rb + 4)],
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

    pltpu.make_async_copy(xp_hbm.at[b, pl.ds(ht * rb, rb + 4)],
                          slab.at[cur], sem.at[cur]).wait()

    window = slab[cur]  # (rb+4, wp, C); xp row r <-> real row r-2
    c = window.shape[-1]
    cm = w1_ref.shape[-1]

    # stage 1: conv1+bias+relu on rb+2 halo rows.  y1[u, v] holds conv2's
    # INPUT at real (row r0+u-1, col v-1): the in-image conv1 value, or
    # zero where that position is conv2's zero padding (masked below) —
    # conv1 at pad positions is NOT zero (it sees real pixels through its
    # window), so the mask is what makes the fusion exact.
    taps = []
    for dy in range(3):
        rows = window[dy:dy + rb + 2]
        for dx in range(3):
            t = rows if dx == 0 else pltpu.roll(rows, wp - dx, 1)
            taps.append(t.reshape((rb + 2) * wp, c))
    a1 = jnp.concatenate(taps, axis=-1)  # ((rb+2)*wp, 9C)
    acc1 = jnp.dot(a1, w1_ref[:], preferred_element_type=jnp.float32)
    acc1 = jnp.maximum(acc1 + b1_ref[:].astype(jnp.float32), 0.0)
    y1 = acc1.reshape(rb + 2, wp, cm)
    # masks built at broadcast rank with 3-D iotas: Mosaic can't add a minor
    # dim to an i1 vector via reshape (round-2 mca.py lesson)
    r_real = (ht * rb - 1
              + jax.lax.broadcasted_iota(jnp.int32, (rb + 2, wp, 1), 0))
    v = jax.lax.broadcasted_iota(jnp.int32, (rb + 2, wp, 1), 1)
    keep = ((r_real >= 0) & (r_real < h_real)
            & (v >= 1) & (v <= w_real))
    y1 = jnp.where(keep, y1, 0.0).astype(out_dtype)

    # stage 2: conv2+bias+relu on the rb output rows, VMEM-resident input
    taps = []
    for dy in range(3):
        rows = y1[dy:dy + rb]
        for dx in range(3):
            t = rows if dx == 0 else pltpu.roll(rows, wp - dx, 1)
            taps.append(t.reshape(rb * wp, cm))
    a2 = jnp.concatenate(taps, axis=-1)  # (rb*wp, 9Cm)
    acc2 = jnp.dot(a2, w2_ref[:], preferred_element_type=jnp.float32)
    acc2 = jnp.maximum(acc2 + b2_ref[:].astype(jnp.float32), 0.0)
    res = acc2.astype(out_dtype).reshape(rb, wp, -1)
    out_ref[0] = res[:, :w_real, :]


def _pick_rb_pair(h: int, wp: int, c: int, cm: int, co: int, itemsize: int,
                  budget: int = 10 * 1024 * 1024) -> int | None:
    for rb in (16, 8, 4):
        if h % rb:
            continue
        slab = 2 * (rb + 4) * wp * c * itemsize
        a1 = (rb + 2) * wp * 9 * c * itemsize
        acc1 = (rb + 2) * wp * cm * 4
        y1 = (rb + 2) * wp * cm * itemsize
        a2 = rb * wp * 9 * cm * itemsize
        acc2 = rb * wp * co * 4
        outb = 2 * rb * wp * co * itemsize
        wgt = (9 * c * cm + 9 * cm * co) * itemsize
        if slab + a1 + acc1 + y1 + a2 + acc2 + outb + wgt <= budget:
            return rb
    return None


def conv3x3_pair_supported(x_shape, c_mid: int, c_out: int, dtype) -> bool:
    """Static routing predicate for the fused-DoubleConv switch."""
    if len(x_shape) != 4:
        return False
    _, h, w, c = x_shape
    sub = 16 if dtype == jnp.bfloat16 else 8
    wp = _round_up(w + 4, sub)
    if c % 32 or c_mid % 32 or c_out % 32 or h < 4:
        return False
    return _pick_rb_pair(h, wp, c, c_mid, c_out,
                         jnp.dtype(dtype).itemsize) is not None


@functools.partial(jax.jit, static_argnames=("interpret",))
def conv3x3_pair_gemm(x: jax.Array, w1: jax.Array, b1: jax.Array,
                      w2: jax.Array, b2: jax.Array, *,
                      interpret: bool | None = None) -> jax.Array:
    """Fused DoubleConv: relu(conv2(relu(conv1(x)+b1))+b2) in ONE kernel.

    Both convs are 3x3 / stride 1 / pad 1 (the folded-BN inference form of
    DoubleConv, ref src/EGM-UNet.py:44-55).  The conv1 output lives only in
    VMEM: vs two separate kernels this removes a full write+read of the
    (B, H, W, Cm) intermediate from HBM — the model is activation-bandwidth
    bound (PERF.md), so the pair's HBM traffic roughly halves.  Cost: the
    input window halo grows from 2 to 4 rows and conv1 runs on rb+2 rows
    per rb-row output block.

    x: (B,H,W,C); w1: (3,3,C,Cm); w2: (3,3,Cm,Co); b1/b2: biases (folded
    BN).  Exact (f32 accumulation, halo-masked padding) vs the two-op
    reference up to dtype rounding.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bsz, h, wd, c = x.shape
    cm = w1.shape[-1]
    co = w2.shape[-1]
    dt = x.dtype
    sub = 16 if dt == jnp.bfloat16 else 8
    wp = _round_up(wd + 4, sub)
    rb = _pick_rb_pair(h, wp, c, cm, co, jnp.dtype(dt).itemsize)
    if rb is None:
        raise ValueError(f"conv3x3_pair_gemm: no row block fits for {x.shape}")

    xp = jnp.pad(x, ((0, 0), (2, 2), (2, wp - wd - 2), (0, 0)))
    w1r = w1.astype(dt).reshape(9 * c, cm)
    w2r = w2.astype(dt).reshape(9 * cm, co)
    b1r = b1.astype(jnp.float32).reshape(1, cm)
    b2r = b2.astype(jnp.float32).reshape(1, co)

    grid = (bsz, h // rb)
    flops = 2 * bsz * h * wd * 9 * (c * cm + cm * co)
    return pl.pallas_call(
        functools.partial(_pair_kernel, rb, wp, wd, h, dt),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # xp stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w2
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b2
        ],
        out_specs=pl.BlockSpec((1, rb, wd, co), lambda bi, hi: (bi, hi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, h, wd, co), dt),
        scratch_shapes=[
            pltpu.VMEM((2, rb + 4, wp, c), dt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(bsz * (h + 4) * wp * c + bsz * h * wd * co)
            * jnp.dtype(dt).itemsize,
            transcendentals=0),
        interpret=interpret,
    )(xp, w1r, b1r, w2r, b2r)


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
