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

Modes:

- ``"int8"``   — int8 MXU convs, bf16 tensors *between* ops (measured -5%
  vs bf16 on v5e: the model is activation-bandwidth-bound and the MXU time
  int8 halves was not the bottleneck, PERF.md round 3).
- ``"int8df"`` — int8 **dataflow**: every full-size stage tensor is stored
  in HBM as int8/uint8 (``qstore`` sites: ConvBNReLU/BasicConv outputs, the
  MCA combine, the EGRFB edge/residual/enhancer maps, the encoder pools).
  ``requant_store`` quantizes at a calibrated static scale, forces the
  8-bit tensor to be the materialized value with ``optimization_barrier``,
  and dequantizes inline in each consumer's fusion — halving exactly the
  window-tap-amplified HBM reads the profile blames for the gap to the
  roofline floor.  Convs still run bf16 (MXU was never the bottleneck).
- ``"int8full"`` — int8df storage + the int8 MXU convs on top.
- ``"calibrate"`` — full-precision forward that records per-site abs-max
  into the ``quant_stats`` collection (see calibrate_quant_scales).
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

# Shipping selective-site configuration for int8df serving — the measured
# best of the round-4 campaign (runs/r04/int8df_*.log, PERF.md round 4):
#   base (mca:,egrfb:)  532.0 img/s     +pools  533.1  <- ship
#   +decoder sites      520.1           +decoder+UP_SPLIT  438.1
#   +encoder conv outs  493.9           (bf16 headline: 519.2)
# Only sites that ALREADY materialize (the barriered MCA/EGRFB chains, the
# encoder pools) pay; forcing new materializations inherits the barrier-all
# penalty (all-sites measured -7%).  Serving entry points default
# $EGM_QSTORE_SITES to this via ``apply_ship_sites_default()``.
SHIP_QSTORE_SITES = "mca:,egrfb:,:pool"
SHIP_UP_SPLIT = "0"


def apply_ship_sites_default() -> None:
    """Default the int8df env knobs to the shipping selective-site config.

    Called by serving entry points (bench.py, cli/serve.py) before tracing
    an int8df/int8full graph; explicit env settings always win."""
    os.environ.setdefault("EGM_QSTORE_SITES", SHIP_QSTORE_SITES)
    os.environ.setdefault("EGM_UP_SPLIT", SHIP_UP_SPLIT)


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


def requant_store(x: jax.Array, scale: jax.Array, signed: bool = False
                  ) -> jax.Array:
    """Quantize ``x`` to 8-bit storage at a static ``scale``, force the
    8-bit tensor to be the materialized HBM value, and dequantize inline.

    The ``optimization_barrier`` on the quantized tensor is the load-bearing
    part: without it XLA tends to place the round/clip/convert chain inside
    the *consumer* conv's operand fusion, which still reads the producer's
    bf16 output from HBM per window tap (exactly what the plain ``int8``
    mode measured, PERF.md round 3).  With the barrier, the producer fusion
    roots at the 8-bit tensor — that is what gets stored — and every
    consumer fuses the (elementwise, cheap) dequantize into its own reads.

    Post-ReLU tensors use uint8 over [0, absmax] (one extra bit); signed
    sites use symmetric int8.  Round-trip error is bounded by scale/2.
    """
    s = jnp.maximum(scale.astype(jnp.float32), 1e-12)
    xf = x.astype(jnp.float32) / s
    if signed:
        q = jnp.clip(jnp.round(xf), -127, 127).astype(jnp.int8)
    else:
        q = jnp.clip(jnp.round(xf), 0, 255).astype(jnp.uint8)
    q = jax.lax.optimization_barrier(q)
    return (q.astype(jnp.float32) * s).astype(x.dtype)


def qstore(module, x: jax.Array, name: str, signed: bool = False) -> jax.Array:
    """Storage-quantization site hook, callable from any flax module.

    - ``calibrate`` mode: sows this site's abs-max into ``quant_stats``
      (leaf ``{name}_absmax`` for signed sites, ``{name}_absmaxu`` for
      unsigned ones — calibrate_quant_scales turns either into
      ``{name}_scale`` with the matching divisor).
    - ``int8df`` / ``int8full`` mode with a calibrated ``{name}_scale``
      present in the ``quant_scales`` collection: requant_store.
    - otherwise: identity (returns ``x`` itself, so callers can detect an
      inactive site with ``is``).
    """
    mode = current_quant_mode()
    if mode == "calibrate":
        leaf = f"{name}_absmax" if signed else f"{name}_absmaxu"
        module.sow("quant_stats", leaf,
                   jnp.max(jnp.abs(x.astype(jnp.float32))),
                   reduce_fn=jnp.maximum,
                   init_fn=lambda: jnp.asarray(0.0, jnp.float32))
        return x
    if mode in ("int8df", "int8full") and module.has_variable(
            "quant_scales", f"{name}_scale"):
        # $EGM_QSTORE_SITES selects which storage sites are active (comma
        # list of substrings matched against '<module path>:<name>', or
        # 'all').  Measured on v5e (PERF.md round 3): quantizing EVERY site
        # inherits the barrier-all penalty — forcing materialization where
        # XLA previously fused the producer away costs more than the 8-bit
        # halving saves.  The paying sites are the ones that materialize
        # anyway: the MCA combine / EGRFB gate chains (barriered by
        # default) and the encoder pools.
        import os

        spec = os.environ.get("EGM_QSTORE_SITES", "all")
        path = "/".join(module.scope.path) + ":" + name
        if spec != "all" and not any(
                s and s in path for s in spec.split(",")):
            return x
        s = module.get_variable("quant_scales", f"{name}_scale")
        return requant_store(x, s, signed=signed)
    return x


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
        # leaf '<tag>_absmax' (signed int8) -> '<tag>_scale' at absmax/127;
        # '<tag>_absmaxu' (unsigned uint8 qstore sites) -> absmax/255
        leaf = path[-1]
        if leaf.endswith("_absmaxu"):
            key, div = leaf[: -len("_absmaxu")] + "_scale", 255.0
        else:
            key, div = leaf[: -len("_absmax")] + "_scale", 127.0
        node[key] = jnp.asarray(max(absmax, 1e-8) / div, jnp.float32)
    return scales


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out
