"""Fused 2x bilinear(align_corners=True) upsample as Pallas TPU kernels.

The UNet decoder upsample (ref: src/EGM-UNet.py:931 ``nn.Upsample(
scale_factor=2, align_corners=True)``) is bandwidth-bound, yet the XLA
interpolation-matrix formulation (ops/resize.py) schedules layout-change
copies of the full-resolution tensor around both einsums — the round-2
profile attributed ~21 ms/iter of EGM inference to these flips (PERF.md).

Chip-verified Mosaic constraints shape the design:

- minor-dim merges ``(.., n) -> lanes`` only lower when the resulting
  lane dim stays 128-aligned at every step — C=256 merges fine, C=32/64
  do not (and ``dot_general`` with a 3-D rhs fails identically: it
  reshapes internally);
- ``tpu.dynamic_rotate`` (pltpu.roll) and strided stores are 32-bit-only;
- strided stores additionally require the base memref's minor dim to be
  <= one 128-lane tile (C=256 rejected, C<=128 fine).

These constraints exactly partition the decoder stages, so there are two
implementations sharing the same host-precomputed weights:

- ``C % 128 == 0`` (up1/up2 at 512-class sizes): ONE kernel.  W axis:
  the even/odd output phases are 3-term blends of the slab and its two
  sublane rolls (``align_corners=True`` at scale 2 has non-periodic
  source positions but taps always at ``w-1, w, w+1`` for ``w = q//2``),
  interleaved by stacking on a new axis above the lanes and merging
  minor dims (legal here).  H axis: banded matmul against per-band
  ``(R, Hc)`` blocks of the ``(2H, H)`` interpolation matrix compacted
  on the host (each output band reads a <=2-chunk input-row window;
  second block zeroed when the window fits one chunk).
- ``C <= 128`` (up3/up4): TWO kernels.  The W kernel blends the phases
  and interleaves them with stride-2 sublane stores into an f32 VMEM
  scratch, storing the block contiguously in the input dtype; the H
  kernel runs the banded matmul on the XLA-side lane-merged
  ``(B, H, 2W*C)`` view (2W*C is a 128-multiple for every EGM stage).
  Costs one intermediate HBM round-trip; the flips it replaces cost
  more (PERF.md round 3).

Numerics match the XLA path's rounding profile: f32 blends, the W-stage
result cast to the input dtype, f32 matmul accumulation
(ops/resize.py _apply_separable has the same profile, axes in the other
order)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from egm_unet_tpu.ops.resize import _linear_matrix


@functools.lru_cache(maxsize=64)
def _w_weight_planes(w: int):
    """(2, 3, W) f32: even/odd phase weights for taps at column offsets
    0, -1, +1 relative to w = q//2."""
    a = _linear_matrix(w, 2 * w, True)  # (2W, W) row-stochastic, 2 taps/row
    planes = np.zeros((2, 3, w), np.float32)  # [parity, tap(0,-1,+1), w]
    for q in range(2 * w):
        base, par = divmod(q, 2)
        (idx,) = np.nonzero(a[q])
        for col in idx:
            tap = {0: 0, -1: 1, 1: 2}.get(int(col) - base)
            assert tap is not None, (q, col, base)
            planes[par, tap, base] += a[q, col]
    return planes


@functools.lru_cache(maxsize=64)
def _h_band_blocks(h: int, r: int, hc: int):
    """Per-band compacted H-interpolation blocks.

    Returns (h0[n_p] int32 chunk indices, s[n_p, 2, R, Hc] f32) such that
    out[p0:p0+R] = s[p,0] @ x[h0*Hc:(h0+1)*Hc] + s[p,1] @ x[h1*Hc:...],
    h1 = min(h0+1, n_h-1), with s[p,1] zeroed when the band's window fits
    one chunk (h1 would re-read chunk h0)."""
    a = _linear_matrix(h, 2 * h, True)  # (2H, H)
    n_h = -(-h // hc)
    n_p = -(-2 * h // r)
    h0 = np.zeros((n_p,), np.int32)
    s = np.zeros((n_p, 2, r, hc), np.float32)
    for p in range(n_p):
        rows = a[p * r: min((p + 1) * r, 2 * h)]
        cols = np.nonzero(rows.any(axis=0))[0]
        c0, c1 = cols[0] // hc, cols[-1] // hc
        assert c1 - c0 <= 1, "band window spans >2 chunks; raise hc"
        h0[p] = c0
        s[p, 0, : rows.shape[0]] = _chunk(rows, c0, hc, h)
        if c1 != c0:
            s[p, 1, : rows.shape[0]] = _chunk(rows, c1, hc, h)
    return h0, s


def _chunk(rows: np.ndarray, c: int, hc: int, h: int) -> np.ndarray:
    out = np.zeros((rows.shape[0], hc), np.float32)
    lo, hi = c * hc, min((c + 1) * hc, h)
    out[:, : hi - lo] = rows[:, lo:hi]
    return out


def _phase_blend(x_ref, we_ref, wo_ref, w: int):
    """(even, odd) f32 (Rb, W, C) phase blends of one slab block."""
    s = x_ref[0].astype(jnp.float32)  # rotate is 32-bit-only
    sm1 = pltpu.roll(s, 1, axis=1)  # x[w-1] (wrap killed by weights)
    sp1 = pltpu.roll(s, w - 1, axis=1)  # x[w+1]
    taps = (s, sm1, sp1)
    even = sum(we_ref[0, t] * taps[t] for t in range(3))
    odd = sum(wo_ref[0, t] * taps[t] for t in range(3))
    return even, odd


def _merged_kernel(h0_ref, xa_ref, xb_ref, s0_ref, s1_ref, we_ref, wo_ref,
                   out_ref, *, w: int, compute_dtype):
    hc, c = xa_ref.shape[1], xa_ref.shape[3]

    def wres(x_ref):
        even, odd = _phase_blend(x_ref, we_ref, wo_ref, w)
        z = jnp.concatenate([even[:, :, None, :], odd[:, :, None, :]], axis=2)
        return z.reshape(hc, 2 * w * c).astype(compute_dtype)

    acc = jax.lax.dot_general(
        s0_ref[0].astype(compute_dtype), wres(xa_ref),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    acc += jax.lax.dot_general(
        s1_ref[0].astype(compute_dtype), wres(xb_ref),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    out_ref[0] = acc.astype(out_ref.dtype)


def _w_kernel(x_ref, we_ref, wo_ref, out_ref, scratch_ref, *, w: int):
    even, odd = _phase_blend(x_ref, we_ref, wo_ref, w)
    # strided stores are 32-bit-only — interleave the phases in an f32
    # VMEM scratch, then store the block contiguously in the out dtype
    scratch_ref[:, pl.Slice(0, w, 2), :] = even
    scratch_ref[:, pl.Slice(1, w, 2), :] = odd
    out_ref[0] = scratch_ref[...].astype(out_ref.dtype)


def _h_kernel(h0_ref, xa_ref, xb_ref, s0_ref, s1_ref, out_ref, *,
              compute_dtype):
    acc = jax.lax.dot_general(
        s0_ref[0].astype(compute_dtype), xa_ref[0].astype(compute_dtype),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    acc += jax.lax.dot_general(
        s1_ref[0].astype(compute_dtype), xb_ref[0].astype(compute_dtype),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    out_ref[0] = acc.astype(out_ref.dtype)


def supported(x: jax.Array) -> bool:
    """Shapes the kernels handle: NHWC, H and W multiples of 8 (the
    512-class bench/serve sizes; odd 480-eval stages fall back to XLA),
    and a channel count on one of the two verified Mosaic paths."""
    if not (x.ndim == 4 and x.shape[1] % 8 == 0 and x.shape[2] % 8 == 0
            and x.shape[1] >= 8 and x.shape[2] >= 8):
        return False
    c = x.shape[3]
    return c % 128 == 0 or (c <= 128 and (2 * x.shape[2] * c) % 128 == 0)


def _h_grid_spec(b, h, w, c, trailing, r, hc, extra_specs=()):
    """Shared scalar-prefetch grid spec for the banded H matmul;
    ``trailing`` is the per-row block layout after the chunk dim — (W, C)
    for the fused kernel's 4-D input, (2W*C,) for the merged 3-D one.
    ``extra_specs``: BlockSpecs for trailing broadcast inputs (the fused
    kernel's W-phase weight planes)."""
    n_h = -(-h // hc)
    x_block = (1, hc) + trailing
    zeros = (0,) * len(trailing)
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, -(-2 * h // r)),
        in_specs=[
            pl.BlockSpec(x_block, lambda bb, p, h0r: (bb, h0r[p]) + zeros),
            pl.BlockSpec(x_block,
                         lambda bb, p, h0r:
                         (bb, jnp.minimum(h0r[p] + 1, n_h - 1)) + zeros),
            pl.BlockSpec((1, r, hc), lambda bb, p, h0r: (p, 0, 0)),
            pl.BlockSpec((1, r, hc), lambda bb, p, h0r: (p, 0, 0)),
            *extra_specs,
        ],
        out_specs=pl.BlockSpec((1, r, 2 * w * c),
                               lambda bb, p, h0r: (bb, p, 0)),
    )


def upsample2x_fused(x: jax.Array, *, band_rows: int = 64,
                     chunk_rows: int = 64, row_block: int = 64,
                     interpret: bool | None = None) -> jax.Array:
    """(B, H, W, C) -> (B, 2H, 2W, C), == upsample2x_bilinear_align_corners
    up to bf16 rounding."""
    if not supported(x):
        raise ValueError(f"unsupported shape {x.shape}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, w, c = x.shape
    compute = x.dtype if x.dtype in (jnp.bfloat16, jnp.float32) else jnp.float32

    planes = _w_weight_planes(w)  # (2, 3, W) f32
    we = jnp.asarray(np.broadcast_to(planes[0][:, :, None], (3, w, c)))[None]
    wo = jnp.asarray(np.broadcast_to(planes[1][:, :, None], (3, w, c)))[None]

    hc = min(h, chunk_rows)
    r = min(2 * h, band_rows)
    d = 2 * w * c
    h0_np, s_np = _h_band_blocks(h, r, hc)
    h0 = jnp.asarray(h0_np)
    s0 = jnp.asarray(s_np[:, 0])
    s1 = jnp.asarray(s_np[:, 1])

    if c % 128 == 0:
        # single fused kernel: in-kernel minor-dim merges are legal
        wspec = pl.BlockSpec((1, 3, w, c), lambda bb, p, h0r: (0, 0, 0, 0))
        out = pl.pallas_call(
            functools.partial(_merged_kernel, w=w, compute_dtype=compute),
            grid_spec=_h_grid_spec(b, h, w, c, (w, c), r, hc,
                                   extra_specs=(wspec, wspec)),
            out_shape=jax.ShapeDtypeStruct((b, 2 * h, d), x.dtype),
            interpret=interpret,
        )(h0, x, x, s0, s1, we, wo)
        return out.reshape(b, 2 * h, 2 * w, c)

    # VMEM budget for the W-kernel.  The frame holds ~5 f32 (rb, W, C)
    # intermediates (3 roll taps + 2 phase blends) plus scratch and the
    # double-buffered in/out blocks, and the lane dim C pads up to 128 —
    # so the per-row cost is ~20 * W * max(C,128) bytes.  Chip-calibrated:
    # rb=8 fits (W=256, C=32) inside the 16M scoped limit, rb>=32 does not.
    c_pad = max(c, 128)
    rb = min(h, row_block, max(8, (5 << 20) // (20 * w * c_pad) // 8 * 8))
    mid = pl.pallas_call(
        functools.partial(_w_kernel, w=w),
        grid=(b, -(-h // rb)),
        in_specs=[
            pl.BlockSpec((1, rb, w, c), lambda bb, rr: (bb, rr, 0, 0)),
            pl.BlockSpec((1, 3, w, c), lambda bb, rr: (0, 0, 0, 0)),
            pl.BlockSpec((1, 3, w, c), lambda bb, rr: (0, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, rb, 2 * w, c), lambda bb, rr: (bb, rr, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, 2 * w, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((rb, 2 * w, c), jnp.float32)],
        interpret=interpret,
    )(x, we, wo)

    out = pl.pallas_call(
        functools.partial(_h_kernel, compute_dtype=compute),
        grid_spec=_h_grid_spec(b, h, w, c, (d,), r, hc),
        out_shape=jax.ShapeDtypeStruct((b, 2 * h, d), x.dtype),
        interpret=interpret,
    )(h0, mid.reshape(b, h, d), mid.reshape(b, h, d), s0, s1)
    return out.reshape(b, 2 * h, 2 * w, c)
