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
              groups: int = 1, act_scale: Optional[jax.Array] = None) -> jax.Array:
    """Quantized NHWC conv: int8 x int8 -> int32 accumulate, dequantize +
    bias in f32, returned in x.dtype.

    ``act_scale=None`` quantizes the activation *dynamically* (an abs-max
    reduce per input — an extra full HBM pass that measured SLOWER than bf16
    end to end on v5e: 367 vs 475 img/s).  With a *static* calibrated scale
    the round/clip/convert fuses into the producer's output fusion, so
    activations stream HBM at int8 — half the bf16 traffic; that is the
    serving configuration (see calibrate_quant_scales)."""
    wq, w_scale = quantize_weight_per_channel(kernel)
    xf = x.astype(jnp.float32)
    if act_scale is None:
        sx = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-8) / 127.0
    else:
        sx = jnp.maximum(act_scale.astype(jnp.float32), 1e-8)
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


def calibrate_quant_scales(model, variables, sample_batches, train: bool = False):
    """One-shot activation-range calibration.

    Runs the model in ``quantized('calibrate')`` mode over ``sample_batches``
    (full-precision forwards; each quantized Conv sows its input abs-max into
    the ``quant_stats`` collection) and returns a ``quant_scales`` collection
    tree to merge into ``variables`` for static-scale int8 serving:

        scales = calibrate_quant_scales(model, variables, [x1, x2])
        out = model.apply({**variables, "quant_scales": scales}, x,
                          train=False)   # inside quantized("int8")
    """
    import numpy as np

    agg = None
    with quantized("calibrate"):
        for x in sample_batches:
            _, aux = model.apply(variables, x, train=train,
                                 mutable=["quant_stats"])
            stats = aux["quant_stats"]
            flat = {tuple(k): float(np.asarray(v[0] if isinstance(v, tuple)
                                               else v))
                    for k, v in _flatten(stats).items()}
            if agg is None:
                agg = flat
            else:
                agg = {k: max(agg[k], v) for k, v in flat.items()}

    scales = {}
    for path, absmax in agg.items():
        node = scales
        for key in path[:-1]:
            node = node.setdefault(key, {})
        # path leaf is 'act_absmax'; store as 'act_scale'
        node["act_scale"] = jnp.asarray(max(absmax, 1e-8) / 127.0, jnp.float32)
    return scales


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out
