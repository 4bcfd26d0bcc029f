"""Fused CSA attention kernel (Pallas/TPU).

CSA = ``softmax(q q^T * s) + softmax(k k^T * s)`` applied to v
(ref: clip/model.py:295-301).  The XLA einsum path materializes two [S, S]
score tensors and two softmaxes in HBM; this kernel keeps everything for one
program in VMEM — the Gram matrices, softmaxes, and the weighted sum run
back-to-back on MXU/VPU with a single HBM round trip.

Head packing: CLIP heads are 64-wide, half the 128-lane tile.  Rather than
pad each head's lane dim to 128 (junk lanes double the HBM traffic and VMEM
slabs — the round-2 version), each program processes ``pack = 128 // hd``
heads side by side in one full 128-lane tile and separates them with lane
masks: ``G_p = (q ⊙ lane_mask_p) @ q^T`` contracts only head p's lanes, and
the output accumulates ``w_p @ (v ⊙ lane_mask_p)`` per head.  MXU work per
head is unchanged (a K=64 contraction runs at half rate whether padded or
masked), but every HBM byte moved is now real data and the grid has half
the per-program overhead.

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


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, valid_len: int,
            hd: int, pack: int):
    q = q_ref[0].astype(jnp.float32)  # [S, pack*hd (lane-padded)]
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0]
    s, lanes = q.shape

    col_invalid = None
    if valid_len < s:
        col = lax.broadcasted_iota(jnp.int32, (s, s), dimension=1)
        col_invalid = col >= valid_len

    lane = lax.broadcasted_iota(jnp.int32, (s, lanes), dimension=1)
    out = jnp.zeros((s, lanes), jnp.float32)
    for p in range(pack):
        m = ((lane >= p * hd) & (lane < (p + 1) * hd))
        mf = m.astype(jnp.float32)
        s1 = jnp.dot(q * mf, q.T, preferred_element_type=jnp.float32) * scale
        s2 = jnp.dot(k * mf, k.T, preferred_element_type=jnp.float32) * scale
        if col_invalid is not None:
            neg = jnp.float32(-1e30)
            s1 = jnp.where(col_invalid, neg, s1)
            s2 = jnp.where(col_invalid, neg, s2)
        w = jax.nn.softmax(s1, axis=-1) + jax.nn.softmax(s2, axis=-1)
        vp = v * m.astype(v.dtype)
        out = out + jnp.dot(w.astype(v.dtype), vp,
                            preferred_element_type=jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def _csa_pallas(q: jax.Array, k: jax.Array, v: jax.Array, num_heads: int,
                interpret: bool = False) -> jax.Array:
    b, s, d = q.shape
    hd = d // num_heads
    scale = hd**-0.5

    # pack adjacent heads into one 128-lane tile (D is [H, hd]-contiguous,
    # so a plain reshape groups consecutive heads)
    pack = 1
    if hd < 128 and 128 % hd == 0:
        pack = min(128 // hd, num_heads)
        while num_heads % pack:
            pack //= 2
    groups = num_heads // pack

    def heads(x):  # [B, S, D] -> [B*groups, S, pack*hd]
        return (x.reshape(b, s, groups, pack * hd)
                .transpose(0, 2, 1, 3)
                .reshape(b * groups, s, pack * hd))

    qh, kh, vh = heads(q), heads(k), heads(v)

    sublane = 16 if q.dtype == jnp.bfloat16 else 8
    s_pad = _round_up(s, sublane)
    lane_pad = _round_up(pack * hd, 128)
    if s_pad != s or lane_pad != pack * hd:
        pad = ((0, 0), (0, s_pad - s), (0, lane_pad - pack * hd))
        qh, kh, vh = (jnp.pad(t, pad) for t in (qh, kh, vh))

    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, valid_len=s, hd=hd, pack=pack),
        grid=(b * groups,),
        in_specs=[pl.BlockSpec((1, s_pad, lane_pad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec((1, s_pad, lane_pad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * groups, s_pad, lane_pad), v.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(
                1.5 * (4 * s_pad * lane_pad + (2 + pack) * s_pad * s_pad) * 4)),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * groups * pack * 3 * s_pad * s_pad * lane_pad,
            bytes_accessed=4 * b * groups * s_pad * lane_pad * 4,
            transcendentals=2 * b * groups * pack * s_pad * s_pad,
        ),
        interpret=interpret,
    )(qh, kh, vh)

    out = out[:, :s, : pack * hd]
    return (out.reshape(b, groups, s, pack * hd)
            .transpose(0, 2, 1, 3)
            .reshape(b, s, d))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def csa_attention(q: jax.Array, k: jax.Array, v: jax.Array, num_heads: int,
                  interpret: bool = False) -> jax.Array:
    """q/k/v: [B, S, D] post-projection; returns [B, S, D].

    Equivalent to ``multi_head_attention(..., csa=True)`` — asserted by
    tests/test_pallas.py against the einsum path.

    Differentiable: the forward runs the fused Pallas kernel; the backward
    is the VJP of the mathematically identical XLA einsum path (no
    hand-written Mosaic backward to maintain, and XLA's fused softmax-grad
    is already near roofline).  This keeps ``attn_impl='pallas'`` legal
    inside training steps — the CLIPSeg decoder fine-tune differentiates
    through the frozen CLIP tower's activations even with frozen weights.
    """
    return _csa_pallas(q, k, v, num_heads, interpret)


def _csa_fwd(q, k, v, num_heads, interpret):
    return _csa_pallas(q, k, v, num_heads, interpret), (q, k, v)


def _csa_bwd(num_heads, interpret, residuals, g):
    del interpret
    from egm_unet_tpu.ops.attention import multi_head_attention

    q, k, v = residuals
    _, vjp = jax.vjp(
        lambda qq, kk, vv: multi_head_attention(qq, kk, vv, num_heads,
                                                csa=True), q, k, v)
    return vjp(g)


csa_attention.defvjp(_csa_fwd, _csa_bwd)
