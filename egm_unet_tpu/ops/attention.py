"""Multi-head attention with optional CSA (Correlative Self-Attention).

CSA replaces ``softmax(q k^T)`` with ``softmax(q q^T * scale) +
softmax(k k^T * scale)`` (ref: clip/model.py:295-301,
models/clipseg.py:96-102).  Note the result is deliberately NOT
row-stochastic (two softmaxes summed) — SURVEY.md §7 warns not to "fix" it.

Layout: [B, S, D] activations, heads split internally.  At CLIP sizes
(S<=485, d=64, h=12) XLA fuses this into a handful of MXU calls; a Pallas
flash-style kernel for the two-softmax form lives in
``egm_unet_tpu.ops.pallas.csa`` and is used on TPU for the fused path.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _split_heads(x: jax.Array, num_heads: int) -> jax.Array:
    b, s, d = x.shape
    return x.reshape(b, s, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x: jax.Array) -> jax.Array:
    b, h, s, hd = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * hd)


def multi_head_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    num_heads: int,
    *,
    csa: bool = False,
    attn_bias: Optional[jax.Array] = None,
    mult_mask: Optional[tuple] = None,
    return_weights: bool = False,
):
    """Attention core on projected q/k/v of shape [B, S, D].

    ``attn_bias``: additive [S, S] mask (e.g. causal -inf upper triangle),
    applied to the logits (standard path) — the reference never combines CSA
    with a causal mask, and neither do we.

    ``mult_mask``: (mask_type, mask[B, S-1]) applied *multiplicatively to
    the post-softmax weights* — the CLIPSeg visual-prompt masking
    (ref: models/clipseg.py:111-119): 'cls_token' scales the CLS row's
    attention to patches; 'all' scales every query's attention to patches.
    """
    qh = _split_heads(q, num_heads)
    kh = _split_heads(k, num_heads)
    vh = _split_heads(v, num_heads)
    scale = (q.shape[-1] // num_heads) ** -0.5

    if csa:
        q_attn = jnp.einsum("bhsd,bhtd->bhst", qh, qh,
                            preferred_element_type=jnp.float32) * scale
        k_attn = jnp.einsum("bhsd,bhtd->bhst", kh, kh,
                            preferred_element_type=jnp.float32) * scale
        weights = jax.nn.softmax(q_attn, axis=-1) + jax.nn.softmax(k_attn, axis=-1)
    else:
        logits = jnp.einsum("bhsd,bhtd->bhst", qh, kh,
                            preferred_element_type=jnp.float32) * scale
        if attn_bias is not None:
            logits = logits + attn_bias
        weights = jax.nn.softmax(logits, axis=-1)

    if mult_mask is not None:
        mask_type, mask = mult_mask  # mask: [B, S-1] over patch tokens
        m = mask[:, None, :]  # [B, 1, S-1] broadcast over heads
        if mask_type == "cls_token":
            cls_row = weights[:, :, 0:1, 1:] * m[:, :, None, :]
            weights = weights.at[:, :, 0:1, 1:].set(cls_row)
        elif mask_type == "all":
            body = weights[:, :, 1:, 1:] * m[:, :, None, :]
            weights = weights.at[:, :, 1:, 1:].set(body)
        else:
            raise ValueError(f"unknown mult_mask type {mask_type!r}")

    out = jnp.einsum("bhst,bhtd->bhsd", weights.astype(v.dtype), vh,
                     preferred_element_type=jnp.float32).astype(v.dtype)
    out = _merge_heads(out)
    if return_weights:
        return out, weights
    return out
