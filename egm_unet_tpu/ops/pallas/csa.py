"""Fused CSA attention kernel (Pallas/TPU).

CSA = ``softmax(q q^T * s) + softmax(k k^T * s)`` applied to v
(ref: clip/model.py:295-301).  The XLA einsum path materializes two [S, S]
score tensors and two softmaxes in HBM; this kernel keeps everything for one
(batch, head) in VMEM — both Gram matrices, both softmaxes, and the weighted
sum run back-to-back on MXU/VPU with a single HBM round trip.

At CLIP sizes (S <= 512 padded, d_head 64) a whole head fits comfortably in
VMEM (~1.3 MB fp32 for scores + tiles), so the grid is simply (B*H,) with no
inner tiling — the MXU sees two S x S x d matmuls per program.

Sequence padding: S is padded to the sublane multiple; padded *columns* are
masked to -inf before the softmaxes (they must receive zero weight); padded
rows produce garbage that callers slice off.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, valid_len: int):
    q = q_ref[0].astype(jnp.float32)  # [S, d]
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0]
    s = q.shape[0]

    s1 = jnp.dot(q, q.T, preferred_element_type=jnp.float32) * scale
    s2 = jnp.dot(k, k.T, preferred_element_type=jnp.float32) * scale
    if valid_len < s:
        col = lax.broadcasted_iota(jnp.int32, (s, s), dimension=1)
        neg = jnp.float32(-1e30)
        s1 = jnp.where(col < valid_len, s1, neg)
        s2 = jnp.where(col < valid_len, s2, neg)
    w = jax.nn.softmax(s1, axis=-1) + jax.nn.softmax(s2, axis=-1)
    o_ref[0] = jnp.dot(w.astype(v.dtype), v,
                       preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def csa_attention(q: jax.Array, k: jax.Array, v: jax.Array, num_heads: int,
                  interpret: bool = False) -> jax.Array:
    """q/k/v: [B, S, D] post-projection; returns [B, S, D].

    Equivalent to ``multi_head_attention(..., csa=True)`` — asserted by
    tests/test_pallas.py against the einsum path.
    """
    b, s, d = q.shape
    hd = d // num_heads
    scale = hd**-0.5

    def heads(x):  # [B, S, D] -> [B*H, S, hd]
        return (x.reshape(b, s, num_heads, hd)
                .transpose(0, 2, 1, 3)
                .reshape(b * num_heads, s, hd))

    qh, kh, vh = heads(q), heads(k), heads(v)

    sublane = 16 if q.dtype == jnp.bfloat16 else 8
    s_pad = _round_up(s, sublane)
    hd_pad = _round_up(hd, 128)
    if s_pad != s or hd_pad != hd:
        pad = ((0, 0), (0, s_pad - s), (0, hd_pad - hd))
        qh, kh, vh = (jnp.pad(t, pad) for t in (qh, kh, vh))

    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, valid_len=s),
        grid=(b * num_heads,),
        in_specs=[pl.BlockSpec((1, s_pad, hd_pad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec((1, s_pad, hd_pad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * num_heads, s_pad, hd_pad), v.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(1.5 * (3 * s_pad * hd_pad + 2 * s_pad * s_pad) * 4)),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * num_heads * (2 * s_pad * s_pad * hd_pad
                                       + s_pad * s_pad * hd_pad),
            bytes_accessed=4 * b * num_heads * s_pad * hd_pad * 4,
            transcendentals=2 * b * num_heads * s_pad * s_pad,
        ),
        interpret=interpret,
    )(qh, kh, vh)

    out = out[:, :s, :hd]
    return (out.reshape(b, num_heads, s, hd)
            .transpose(0, 2, 1, 3)
            .reshape(b, s, d))
