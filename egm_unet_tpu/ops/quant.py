"""int8 inference quantization (serving-only, off-parity).

The v5e MXU runs int8 at 2x the bf16 rate, and int8 activations halve the
HBM traffic of the bandwidth-bound EGM stages — the only lever left toward
the 2000 img/s north star once bf16 is MXU-capped near ~1750 (PERF.md).

Scheme: weights are quantized per-output-channel symmetric (computed
in-graph from the folded f32/bf16 weights — they are jit constants after
the deployment weight cast, so XLA folds the quantization away at compile
time); activations are quantized per-tensor *dynamically* (one abs-max
reduce per conv input).  Accumulation is int32 (``preferred_element_type``),
dequantized straight into the bias add.  No calibration data needed.

This is intentionally OFF-parity: bench.py reports a separate metric line
plus a pixel mask-agreement statistic against the bf16 path rather than
claiming numerical equivalence.  The reference has no quantized path at all
(fp16 ``.half()`` only, ref: predict.py:35-44).

Activation: ``with ops.quant.quantized("int8"):`` around the *tracing* call
(a contextvar, thread-safe — no process-global env mutation), or the
``$EGM_QUANT=int8`` env var for CLI use.
"""

from __future__ import annotations

import contextlib
import contextvars
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

_QUANT_MODE: contextvars.ContextVar[Optional[str]] = contextvars.ContextVar(
    "egm_quant_mode", default=None)


def current_quant_mode() -> Optional[str]:
    """Active quantization mode at trace time: the ``quantized()`` context
    wins, else $EGM_QUANT, else None."""
    return _QUANT_MODE.get() or os.environ.get("EGM_QUANT") or None


@contextlib.contextmanager
def quantized(mode: str = "int8"):
    token = _QUANT_MODE.set(mode)
    try:
        yield
    finally:
        _QUANT_MODE.reset(token)


def quantize_weight_per_channel(w: jax.Array):
    """[kh, kw, ci, co] -> (int8 weights, f32 scale[co])."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=(0, 1, 2))
    scale = jnp.maximum(amax, 1e-8) / 127.0
    wq = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return wq, scale


def int8_conv(x: jax.Array, kernel: jax.Array, bias: Optional[jax.Array],
              stride=(1, 1), padding=((0, 0), (0, 0)), dilation=(1, 1),
              groups: int = 1) -> jax.Array:
    """Dynamically-quantized NHWC conv: int8 x int8 -> int32 accumulate,
    dequantize + bias in f32, returned in x.dtype."""
    wq, w_scale = quantize_weight_per_channel(kernel)
    xf = x.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    y = lax.conv_general_dilated(
        xq, wq,
        window_strides=tuple(stride),
        padding=tuple(padding),
        rhs_dilation=tuple(dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (sx * w_scale)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)
