"""Fused decoder stage: upsample2x(bilinear, align_corners) + concat(skip) +
conv3x3 + bias + ReLU in one Pallas kernel.

The XLA form of the UNet decoder's Up stage (models/unet.py Up, ref:
src/EGM-UNet.py:927-949) materializes the 2x-upsampled tensor through two
dense interpolation matmuls whose intermediates land in conv-unfriendly
layouts — the profiled batch-128 inference spends ~24 ms/iter on layout
copies around them (PERF.md).  This kernel keeps the whole stage in VMEM:

    out = relu(conv3x3(concat([x2, up2x(x1)], -1), W) + b)

Per (batch, row-tile) grid program:
- DMA a (KR)-row slab of x1 (low res) and a (TH+2)-row slab of the
  pre-padded x2 (high res) from HBM;
- upsample rows with a per-tile (TH+2, KR) interpolation matrix (exact
  align_corners weights from ops/resize._linear_matrix) on the MXU, then
  columns with the (W+2, w) matrix;
- 3x3 conv as 9 shifted [TH, W, C] x [C, Cout] dot_generals accumulated in
  f32, plus bias and ReLU.

align_corners row sources are non-uniform, so each tile's x1 row window has
its own start offset — delivered via scalar prefetch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from egm_unet_tpu.ops.resize import _linear_matrix


def _row_tiles(h: int, H: int, th: int):
    """Per-tile x1 row-window starts + (TH+2, KR) row matrices, with zero
    rows for the conv's out-of-image padding."""
    a_full = _linear_matrix(h, H, align_corners=True)  # (H, h)
    n_t = H // th
    kr = min(th // 2 + 3, h)
    starts = np.zeros((n_t,), np.int32)
    mats = np.zeros((n_t, th + 2, kr), np.float32)
    for t in range(n_t):
        rows = range(t * th - 1, t * th + th + 1)
        in_rows = sorted({j for r in rows if 0 <= r < H
                          for j in np.nonzero(a_full[r])[0]})
        st = min(in_rows[0], h - kr)
        assert in_rows[-1] < st + kr, (t, in_rows, st, kr)
        starts[t] = st
        for i, r in enumerate(rows):
            if 0 <= r < H:
                mats[t, i, :] = a_full[r, st : st + kr]
    return starts, mats, kr


def _upconv_kernel(th: int, w_low: int, kr: int, cout: int, out_dtype,
                   starts_ref, x1_hbm, x2p_hbm, arows_ref, aw_ref, w_ref,
                   b_ref, out_ref, x1s, x2s, sems):
    W = out_ref.shape[2]
    b = pl.program_id(0)
    t = pl.program_id(1)
    nb = pl.num_programs(0)
    nt = pl.num_programs(1)

    # double-buffered DMA: prefetch tile k+1 while computing tile k
    def start(bi, ti, buf):
        pltpu.make_async_copy(x1_hbm.at[bi, pl.ds(starts_ref[ti], kr)],
                              x1s.at[buf], sems.at[0, buf]).start()
        pltpu.make_async_copy(x2p_hbm.at[bi, pl.ds(ti * th, th + 2)],
                              x2s.at[buf], sems.at[1, buf]).start()

    k = b * nt + t
    cur = jax.lax.rem(k, 2)

    @pl.when(k == 0)
    def _first():
        start(b, t, cur)

    @pl.when(k + 1 < nb * nt)
    def _prefetch():
        t2 = t + 1
        b2 = jnp.where(t2 == nt, b + 1, b)
        start(b2, jnp.where(t2 == nt, 0, t2), jax.lax.rem(k + 1, 2))

    pltpu.make_async_copy(x1_hbm.at[b, pl.ds(starts_ref[t], kr)],
                          x1s.at[cur], sems.at[0, cur]).wait()
    pltpu.make_async_copy(x2p_hbm.at[b, pl.ds(t * th, th + 2)],
                          x2s.at[cur], sems.at[1, cur]).wait()
    x1v = x1s[cur]
    x2v = x2s[cur]

    dt = x1v.dtype
    # rows: [TH+2, w, C1] = A_rows [TH+2, KR] @ x1 slab [KR, w*C1]
    c1n = x1v.shape[-1]
    a = arows_ref[0].astype(dt)
    up = jax.lax.dot_general(
        a, x1v.reshape(kr, w_low * c1n),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ).astype(dt).reshape(th + 2, w_low, c1n)
    # cols: AW [W+2, w] contracted with up's w axis -> [W+2, TH+2, C1]
    upc = jax.lax.dot_general(
        aw_ref[:].astype(dt), up,
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    ).astype(dt)
    upc = jnp.transpose(upc, (1, 0, 2))  # [TH+2, W+2, C1]

    # x2 slab width is padded to W+8 (DMA slice shapes must be 8-aligned in
    # the second-to-minor dim); drop the junk columns before the concat
    cat = jnp.concatenate([x2v[:, : W + 2, :], upc], axis=-1)  # [TH+2, W+2, C]

    acc = jnp.zeros((th, W, cout), jnp.float32)
    for di in range(3):
        for dj in range(3):
            tap = cat[di : di + th, dj : dj + W, :]
            acc = acc + jax.lax.dot_general(
                tap, w_ref[di, dj],
                (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    out = jnp.maximum(acc + b_ref[:].astype(jnp.float32), 0.0)
    out_ref[0] = out.astype(out_dtype)


def _pick_tile(H: int, W: int, c_tot: int, itemsize: int) -> int:
    """Largest power-of-two divisor of H with a ~<=2.5 MB concat slab."""
    budget = int(2.5 * 1024 * 1024)
    per_row = (W + 2) * c_tot * itemsize
    cap = max(budget // per_row - 2, 4)
    th = 1
    while th * 2 <= min(H, cap) and H % (th * 2) == 0:
        th *= 2
    return th


def up_concat_conv(x2: jax.Array, x1: jax.Array, kernel: jax.Array,
                   bias: jax.Array, interpret: bool | None = None) -> jax.Array:
    """relu(conv3x3_pad1(concat([x2, up2x_bilinear_align_corners(x1)], -1),
    kernel) + bias).  x1: [B, h, w, C1]; x2: [B, 2h, 2w, C2];
    kernel: [3, 3, C2+C1, Cout] (HWIO); bias: [Cout]."""
    b, h, w, c1 = x1.shape
    _, H, W, c2 = x2.shape
    assert H == 2 * h and W == 2 * w, "fused path requires exact 2x shapes"
    assert kernel.shape[:3] == (3, 3, c2 + c1), kernel.shape
    cout = kernel.shape[3]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # DMA copy shapes need a 128-multiple lane dim: pad both slabs' channels
    # and re-lay the conv kernel with zero rows at the padded positions
    c1p = c1 if interpret else -(-c1 // 128) * 128
    c2p = c2 if interpret else -(-c2 // 128) * 128
    if c1p != c1 or c2p != c2:
        x1 = jnp.pad(x1, ((0, 0), (0, 0), (0, 0), (0, c1p - c1)))
        x2 = jnp.pad(x2, ((0, 0), (0, 0), (0, 0), (0, c2p - c2)))
        kernel = jnp.concatenate([
            jnp.pad(kernel[:, :, :c2], ((0, 0), (0, 0), (0, c2p - c2), (0, 0))),
            jnp.pad(kernel[:, :, c2:], ((0, 0), (0, 0), (0, c1p - c1), (0, 0))),
        ], axis=2)
        c1, c2 = c1p, c2p

    th = _pick_tile(H, W, c2 + c1, x1.dtype.itemsize)
    starts, mats, kr = _row_tiles(h, H, th)

    aw = np.zeros((W + 2, w), np.float32)
    aw[1 : W + 1] = _linear_matrix(w, W, align_corners=True)
    x2p = jnp.pad(x2, ((0, 0), (1, 1), (1, 7), (0, 0)))  # width 8-aligned

    kernel = kernel.astype(x1.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, H // th),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # x1 (HBM; manual DMA)
            pl.BlockSpec(memory_space=pltpu.ANY),  # x2p
            pl.BlockSpec((1, th + 2, kr), lambda bi, ti, *_: (ti, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W + 2, w), lambda bi, ti, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, c2 + c1, cout), lambda bi, ti, *_: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cout,), lambda bi, ti, *_: (0,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, W, cout), lambda bi, ti, *_: (bi, ti, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, kr, w, c1), x1.dtype),
            pltpu.VMEM((2, th + 2, W + 8, c2), x2.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    kern = functools.partial(_upconv_kernel, th, w, kr, cout, x1.dtype)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, H, W, cout), x1.dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * H * W * 9 * (c2 + c1) * cout, transcendentals=0,
            bytes_accessed=b * (h * w * c1 + H * W * (c2 + cout))
            * x1.dtype.itemsize),
        interpret=interpret,
    )(jnp.asarray(starts), x1, x2p, jnp.asarray(mats), jnp.asarray(aw),
      kernel, bias.astype(x1.dtype))
