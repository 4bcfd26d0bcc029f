"""Implicit-GEMM 3x3 convolution kernel (stride 1, pad 1, NHWC).

Why: the round-2/3 profiles put the encoder DoubleConv stages 2-4x off
roofline under XLA's conv emitter (down1/conv2 17.6 ms vs 7.9, down2/conv2
15.0 vs 3.9 at batch 128 — PERF.md).  The weak spot is the contraction
shape: XLA lowers these convs as per-tap passes whose K (= C_in) and N
(= C_out) underfill the 128-wide MXU for the C<=128 stages.  This kernel
rebuilds the conv as ONE deep GEMM per row block:

    A      = im2col_dy(x window)      # (rb*Wp, 3*C)   dy row-taps only
    P[dx]  = A @ W'[dx]               # W'[dx] = w[:,dx].reshape(3*C, Co)
    out    = relu(P[0] + roll(P[1], -1) + roll(P[2], -2) + b)

so the contraction depth is 3*C (e.g. 192 for C=64, 384 for C=128) —
systolic-array depth 3x the per-tap K=C passes XLA emits — and the three
width taps are combined AFTER the GEMM by rotating the f32 partial sums.

Why post-GEMM rotates: Mosaic's ``tpu.dynamic_rotate`` is only implemented
for 32-bit element types, so rolling the bf16 input taps (the natural 9C
im2col) fails to compile ("Rotate with non-32-bit data"); rotating the f32
accumulators is the supported-and-equivalent form, and shrinks the A
matrix 3x as a bonus.  Algebra: out[w] = sum_dx P[dx][w+dx] and
``roll(P, wp-dx)[w] == P[w+dx mod wp]``; wrap columns land at
w >= wp-dx > W+1 and are never read back.

Mechanics:
- the input is pre-padded on the XLA side to (B, H+2, Wp, C) where Wp
  rounds W+2 up to the sublane tile (16 for bf16), so every window the
  kernel reads is interior and every in-VMEM reshape (rb, Wp, C) ->
  (rb*Wp, C) is layout-free;
- each grid program (b, row-block) DMAs its (rb+2)-row halo window from
  HBM into a double-buffered VMEM slab (prefetching the next window while
  computing, same pattern as ops/pallas/mca.py);
- the dy taps are row-slices on the untiled leading dim (free);
- the GEMMs accumulate in f32 on the MXU; the rotated partials, the
  (folded-BN) bias and the optional ReLU combine on the VPU, and the
  (1, rb, W, Co) output block is written back.

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


def _dx_accumulate(a, w_ref, nrows: int, wp: int, co: int):
    """sum_dx roll(a @ w_ref[dx], wp-dx) as an (nrows, wp, Co) f32 block.

    roll(P, wp-dx)[w] == P[w+dx mod wp], i.e. the width-tap gather done
    AFTER the GEMM on the 32-bit partials (the only dtype Mosaic's rotate
    supports); wrap columns land at w >= wp-dx > W+1, never read back.
    """
    acc = jnp.dot(a, w_ref[0], preferred_element_type=jnp.float32)
    acc = acc.reshape(nrows, wp, co)
    for dx in (1, 2):
        p = jnp.dot(a, w_ref[dx], preferred_element_type=jnp.float32)
        acc = acc + pltpu.roll(p.reshape(nrows, wp, co), wp - dx, 1)
    return acc


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
    # untiled leading dim: free slices
    a = jnp.concatenate([window[dy:dy + rb].reshape(rb * wp, c)
                         for dy in range(3)], axis=-1)  # (rb*wp, 3C)
    co = w2_ref.shape[-1]
    acc = _dx_accumulate(a, w2_ref, rb, wp, co)
    acc = acc + b2_ref[:].astype(jnp.float32).reshape(1, 1, co)
    if relu:
        acc = jnp.maximum(acc, 0.0)
    res = acc.astype(out_dtype)
    out_ref[0] = res[:, :w_real, :]


def _pick_rb(h: int, wp: int, c: int, co: int, itemsize: int,
             budget: int = 10 * 1024 * 1024) -> int | None:
    for rb in (32, 16, 8, 4):
        if h % rb:
            continue
        slab = 2 * (rb + 2) * wp * c * itemsize
        a = rb * wp * 3 * c * itemsize
        acc = 3 * rb * wp * co * 4  # running sum + one rotated partial live
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
    return _pick_rb(h, wp, _round_up(c, 128), _round_up(c_out, 128),
                    jnp.dtype(dtype).itemsize) is not None


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
    a1 = jnp.concatenate([window[dy:dy + rb + 2].reshape((rb + 2) * wp, c)
                          for dy in range(3)], axis=-1)  # ((rb+2)*wp, 3C)
    acc1 = _dx_accumulate(a1, w1_ref, rb + 2, wp, cm)
    y1 = jnp.maximum(acc1 + b1_ref[:].astype(jnp.float32).reshape(1, 1, cm),
                     0.0)
    # masks built at broadcast rank with 3-D iotas: Mosaic can't add a minor
    # dim to an i1 vector via reshape (round-2 mca.py lesson)
    r_real = (ht * rb - 1
              + jax.lax.broadcasted_iota(jnp.int32, (rb + 2, wp, 1), 0))
    v = jax.lax.broadcasted_iota(jnp.int32, (rb + 2, wp, 1), 1)
    keep = ((r_real >= 0) & (r_real < h_real)
            & (v >= 1) & (v <= w_real))
    y1 = jnp.where(keep, y1, 0.0).astype(out_dtype)

    # stage 2: conv2+bias+relu on the rb output rows, VMEM-resident input
    co = w2_ref.shape[-1]
    a2 = jnp.concatenate([y1[dy:dy + rb].reshape(rb * wp, cm)
                          for dy in range(3)], axis=-1)  # (rb*wp, 3Cm)
    acc2 = _dx_accumulate(a2, w2_ref, rb, wp, co)
    acc2 = jnp.maximum(acc2 + b2_ref[:].astype(jnp.float32).reshape(1, 1, co),
                       0.0)
    res = acc2.astype(out_dtype)
    out_ref[0] = res[:, :w_real, :]


def _pick_rb_pair(h: int, wp: int, c: int, cm: int, co: int, itemsize: int,
                  budget: int = 10 * 1024 * 1024) -> int | None:
    for rb in (16, 8, 4):
        if h % rb:
            continue
        slab = 2 * (rb + 4) * wp * c * itemsize
        a1 = (rb + 2) * wp * 3 * c * itemsize
        acc1 = 3 * (rb + 2) * wp * cm * 4
        y1 = (rb + 2) * wp * cm * itemsize
        a2 = rb * wp * 3 * cm * itemsize
        acc2 = 3 * rb * wp * co * 4
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
    return _pick_rb_pair(h, wp, _round_up(c, 128), c_mid,
                         _round_up(c_out, 128),
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
    # lane-align the DMA'd dims (see conv3x3_gemm); Cm is VMEM-internal
    # (never DMA'd) so it stays unpadded.
    cp = _round_up(c, 128)
    cop = _round_up(co, 128)
    rb = _pick_rb_pair(h, wp, cp, cm, cop, jnp.dtype(dt).itemsize)
    if rb is None:
        raise ValueError(f"conv3x3_pair_gemm: no row block fits for {x.shape}")

    xp = jnp.pad(x, ((0, 0), (2, 2), (2, wp - wd - 2), (0, cp - c)))
    # per-dx weight matrices: w1r[dx][dy*C+c, cm] = w1[dy, dx, c, cm]
    w1q = jnp.pad(w1.astype(dt), ((0, 0), (0, 0), (0, cp - c), (0, 0)))
    w2q = jnp.pad(w2.astype(dt), ((0, 0), (0, 0), (0, 0), (0, cop - co)))
    w1r = w1q.transpose(1, 0, 2, 3).reshape(3, 3 * cp, cm)
    w2r = w2q.transpose(1, 0, 2, 3).reshape(3, 3 * cm, cop)
    b1r = b1.astype(jnp.float32).reshape(1, cm)
    b2r = jnp.pad(b2.astype(jnp.float32), (0, cop - co)).reshape(1, cop)

    grid = (bsz, h // rb)
    flops = 2 * bsz * h * wd * 9 * (cp * cm + cm * cop)
    out = pl.pallas_call(
        functools.partial(_pair_kernel, rb, wp, wd, h, dt),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # xp stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w2
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b2
        ],
        out_specs=pl.BlockSpec((1, rb, wd, cop), lambda bi, hi: (bi, hi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, h, wd, cop), dt),
        scratch_shapes=[
            pltpu.VMEM((2, rb + 4, wp, cp), dt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(bsz * (h + 4) * wp * cp + bsz * h * wd * cop)
            * jnp.dtype(dt).itemsize,
            transcendentals=0),
        interpret=interpret,
    )(xp, w1r, b1r, w2r, b2r)
    return out if cop == co else out[..., :co]


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
    # Mosaic manual DMAs require the lane (minor) dim aligned to the 128
    # tile; zero-pad C/Co up to it — padded input lanes meet zero weight
    # rows (no contribution), padded output lanes are sliced off below,
    # and XLA fuses both the pad and the slice into the neighbours.
    cp = _round_up(c, 128)
    cop = _round_up(co, 128)
    rb = _pick_rb(h, wp, cp, cop, jnp.dtype(dt).itemsize)
    if rb is None:
        raise ValueError(f"conv3x3_gemm: no row block fits for {x.shape}")

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, wp - wd - 1), (0, cp - c)))
    # per-dx weight matrices: w2[dx][dy*C+c, co] = w[dy, dx, c, co]
    wq = jnp.pad(w.astype(dt), ((0, 0), (0, 0), (0, cp - c), (0, cop - co)))
    w2 = wq.transpose(1, 0, 2, 3).reshape(3, 3 * cp, cop)
    b2 = (jnp.zeros((1, cop), jnp.float32) if b is None
          else jnp.pad(b.astype(jnp.float32), (0, cop - co)).reshape(1, cop))

    grid = (bsz, h // rb)
    flops = 2 * bsz * h * wd * 9 * cp * cop
    out = pl.pallas_call(
        functools.partial(_kernel, rb, wp, wd, relu, dt),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # xp stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w2
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b2
        ],
        out_specs=pl.BlockSpec((1, rb, wd, cop), lambda bi, hi: (bi, hi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, h, wd, cop), dt),
        scratch_shapes=[
            pltpu.VMEM((2, rb + 2, wp, cp), dt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(bsz * (h + 2) * wp * cp + bsz * h * wd * cop)
            * jnp.dtype(dt).itemsize,
            transcendentals=0),
        interpret=interpret,
    )(xp, w2, b2)
    return out if cop == co else out[..., :co]
