"""Image resize as separable interpolation matrices (MXU-friendly).

Rather than gather-based sampling, resizes are expressed as two small dense
matmuls ``out = A_h @ x @ A_w^T`` — on TPU these ride the MXU and fuse with
surrounding ops, and the interpolation matrices are trace-time constants.

Parity targets (these rounding conventions move mIoU by tenths of points,
see SURVEY.md §7 "hard parts"):

- ``align_corners=True`` bilinear == ``nn.Upsample(mode='bilinear',
  align_corners=True)`` used by the UNet decoder (ref: src/EGM-UNet.py:931).
- ``align_corners=False`` bilinear == ``F.interpolate(mode='bilinear')`` /
  cv2 INTER_LINEAR used when resizing logits (ref: eval_CLIPseg.py:885-888,
  predict.py:79).
- ``resize_nearest(mode='torch')`` == ``F.interpolate(mode='nearest')``;
  ``mode='pil'`` == PIL ``Image.NEAREST`` used for mask resizing in the
  paired transforms (ref: transforms.py:30-42).
- bicubic == ``F.interpolate(mode='bicubic', align_corners=False)`` with
  PyTorch's a=-0.75 kernel, used for positional-embedding rescaling
  (ref: clip/model.py:263-281, models/clipseg.py:181-186).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=256)
def _linear_matrix(n_in: int, n_out: int, align_corners: bool) -> np.ndarray:
    """(n_out, n_in) row-stochastic linear-interpolation matrix."""
    a = np.zeros((n_out, n_in), dtype=np.float32)
    if n_out == 1:
        # align_corners=True maps the single output to source 0; the
        # half-pixel convention maps it to the (clamped) center.
        src = np.array([0.0 if align_corners else max(0.0, 0.5 * n_in - 0.5)])
    elif align_corners:
        src = np.arange(n_out) * (n_in - 1) / (n_out - 1)
    else:
        src = np.clip((np.arange(n_out) + 0.5) * n_in / n_out - 0.5, 0.0, n_in - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, n_in - 1)
    frac = (src - lo).astype(np.float32)
    rows = np.arange(n_out)
    a[rows, lo] += 1.0 - frac
    a[rows, hi] += frac
    return a


def _cubic_weight(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Keys cubic kernel with PyTorch/OpenCV's a=-0.75."""
    t = np.abs(t)
    w = np.where(
        t <= 1.0,
        (a + 2.0) * t**3 - (a + 3.0) * t**2 + 1.0,
        np.where(t < 2.0, a * t**3 - 5.0 * a * t**2 + 8.0 * a * t - 4.0 * a, 0.0),
    )
    return w.astype(np.float32)


@functools.lru_cache(maxsize=64)
def _cubic_matrix(n_in: int, n_out: int, align_corners: bool) -> np.ndarray:
    a = np.zeros((n_out, n_in), dtype=np.float32)
    if n_out == 1:
        src = np.array([0.0 if align_corners else max(0.0, 0.5 * n_in - 0.5)])
    elif align_corners:
        src = np.arange(n_out) * (n_in - 1) / (n_out - 1)
    else:
        src = (np.arange(n_out) + 0.5) * n_in / n_out - 0.5
    base = np.floor(src).astype(np.int64)
    frac = src - base
    rows = np.arange(n_out)
    for k in range(-1, 3):
        idx = np.clip(base + k, 0, n_in - 1)  # border replicate, as torch
        a[rows, idx] += _cubic_weight(frac - k)
    return a


@functools.lru_cache(maxsize=256)
def _nearest_matrix(n_in: int, n_out: int, mode: str) -> np.ndarray:
    a = np.zeros((n_out, n_in), dtype=np.float32)
    if mode == "torch":  # floor(i * n_in / n_out)
        idx = np.floor(np.arange(n_out) * n_in / n_out).astype(np.int64)
    elif mode == "pil":  # PIL NEAREST: floor((i + 0.5) * n_in / n_out)
        idx = np.floor((np.arange(n_out) + 0.5) * n_in / n_out).astype(np.int64)
    else:
        raise ValueError(f"unknown nearest mode {mode!r}")
    idx = np.clip(idx, 0, n_in - 1)
    a[np.arange(n_out), idx] = 1.0
    return a


@functools.lru_cache(maxsize=256)
def _linear_taps(n_in: int, n_out: int, align_corners: bool):
    """(lo_idx, hi_idx, frac) per output position — same mapping as
    _linear_matrix, expressed as two gather taps."""
    if n_out == 1:
        src = np.array([0.0 if align_corners else max(0.0, 0.5 * n_in - 0.5)])
    elif align_corners:
        src = np.arange(n_out) * (n_in - 1) / (n_out - 1)
    else:
        src = np.clip((np.arange(n_out) + 0.5) * n_in / n_out - 0.5, 0.0, n_in - 1)
    lo = np.floor(src).astype(np.int32)
    hi = np.minimum(lo + 1, n_in - 1).astype(np.int32)
    return lo, hi, (src - lo).astype(np.float32)


def _linear_axis(x: jax.Array, axis: int, n_out: int, align_corners: bool) -> jax.Array:
    """Linear resample one axis via two gathers (profiling showed the
    matmul formulation forced full-res layout-change copies on TPU — ~30%
    of EGM inference time — while gathers stay in the NHWC layout)."""
    n_in = x.shape[axis]
    lo, hi, frac = _linear_taps(n_in, n_out, align_corners)
    shape = [1] * x.ndim
    shape[axis] = n_out
    f = jnp.asarray(frac, x.dtype if jnp.issubdtype(x.dtype, jnp.floating)
                    else jnp.float32).reshape(shape)
    x_lo = jnp.take(x, jnp.asarray(lo), axis=axis)
    x_hi = jnp.take(x, jnp.asarray(hi), axis=axis)
    return x_lo * (1 - f) + x_hi * f


def _nearest_axis(x: jax.Array, axis: int, n_out: int, mode: str) -> jax.Array:
    n_in = x.shape[axis]
    a = _nearest_matrix(n_in, n_out, mode)
    idx = np.argmax(a, axis=1).astype(np.int32)
    return jnp.take(x, jnp.asarray(idx), axis=axis)


def _spatial_axes(ndim: int):
    if ndim == 4:
        return 1, 2
    if ndim == 3:
        return 0, 1
    if ndim == 2:
        return 0, 1
    raise ValueError(f"rank {ndim} not supported")


def _apply_separable(x: jax.Array, ah: np.ndarray, aw: np.ndarray) -> jax.Array:
    """Matrix-based separable resample (kept for bicubic, where 4-tap
    gathers would not beat two small matmuls).

    ``$EGM_RESIZE_ACC=native`` drops the f32 ``preferred_element_type`` so a
    bf16 resize emits bf16 matmul outputs directly (saves the convert fusion
    around each decoder resize; the MXU still accumulates in f32 internally)."""
    import os

    dtype = x.dtype
    compute = dtype if dtype in (jnp.float32, jnp.bfloat16, jnp.float16) else jnp.float32
    xf = x.astype(compute)
    ah_j = jnp.asarray(ah, compute)
    aw_j = jnp.asarray(aw, compute)
    kw = ({} if os.environ.get("EGM_RESIZE_ACC") == "native"
          else dict(preferred_element_type=jnp.float32))
    if x.ndim == 4:  # NHWC
        y = jnp.einsum("ph,bhwc->bpwc", ah_j, xf, **kw).astype(compute)
        y = jnp.einsum("qw,bpwc->bpqc", aw_j, y, **kw)
    elif x.ndim == 3:  # HWC
        y = jnp.einsum("ph,hwc->pwc", ah_j, xf, **kw).astype(compute)
        y = jnp.einsum("qw,pwc->pqc", aw_j, y, **kw)
    elif x.ndim == 2:  # HW
        y = jnp.einsum("ph,hw->pw", ah_j, xf, **kw).astype(compute)
        y = jnp.einsum("qw,pw->pq", aw_j, y, **kw)
    else:
        raise ValueError(f"rank {x.ndim} not supported")
    return y.astype(dtype)


def resize_bilinear(x: jax.Array, out_hw, align_corners: bool = False,
                    impl: str = "matmul") -> jax.Array:
    """``impl='matmul'`` (default): separable interpolation-matrix matmuls —
    measured faster on TPU than the two-tap gather form (``impl='gather'``),
    which we benchmarked at +8 ms/iter on the EGM decoder despite avoiding
    layout-change copies."""
    h_out, w_out = int(out_hw[0]), int(out_hw[1])
    if impl == "gather":
        ax_h, ax_w = _spatial_axes(x.ndim)
        y = _linear_axis(x, ax_h, h_out, align_corners)
        return _linear_axis(y, ax_w, w_out, align_corners)
    h_in, w_in = (x.shape[1], x.shape[2]) if x.ndim == 4 else (x.shape[0], x.shape[1])
    return _apply_separable(
        x, _linear_matrix(h_in, h_out, align_corners),
        _linear_matrix(w_in, w_out, align_corners))


def resize_bicubic(x: jax.Array, out_hw, align_corners: bool = False) -> jax.Array:
    h_out, w_out = int(out_hw[0]), int(out_hw[1])
    h_in, w_in = (x.shape[1], x.shape[2]) if x.ndim == 4 else (x.shape[0], x.shape[1])
    return _apply_separable(
        x, _cubic_matrix(h_in, h_out, align_corners), _cubic_matrix(w_in, w_out, align_corners)
    )


def resize_nearest(x: jax.Array, out_hw, mode: str = "torch") -> jax.Array:
    h_out, w_out = int(out_hw[0]), int(out_hw[1])
    ax_h, ax_w = _spatial_axes(x.ndim)
    y = _nearest_axis(x, ax_h, h_out, mode)
    return _nearest_axis(y, ax_w, w_out, mode)


def upsample2x_bilinear_align_corners(x: jax.Array,
                                      impl: str | None = None) -> jax.Array:
    """The UNet decoder's Upsample(scale_factor=2, align_corners=True).

    ``impl``: 'matmul' | 'gather' | 'pallas' (default from
    $EGM_UPSAMPLE_IMPL, else 'matmul').  The matmul form does H_in dense
    MACs per output element vs the gather form's 2 taps; 'pallas' streams
    each item through VMEM once (ops/pallas/resize2x.py), eliminating the
    layout-change copies XLA schedules around the einsums — which wins
    depends on the surrounding layout regime (PERF.md); keep all
    measurable."""
    import os

    impl = impl or os.environ.get("EGM_UPSAMPLE_IMPL", "matmul")
    if impl in ("pallas", "pallas-all"):
        from egm_unet_tpu.ops.pallas.resize2x import supported, upsample2x_fused

        # 'pallas' = only the single fused kernel (C%128==0 stages); the
        # C<=128 two-kernel variant costs an extra HBM round-trip and
        # measured -12% end to end ('pallas-all' keeps it reachable)
        if supported(x) and (impl == "pallas-all" or x.shape[3] % 128 == 0):
            return upsample2x_fused(x)
        impl = "matmul"  # odd 480-class stage sizes fall back
    y = resize_bilinear(x, (2 * x.shape[1], 2 * x.shape[2]),
                        align_corners=True, impl=impl)
    return _maybe_layout_constraint(y)


def _maybe_layout_constraint(y: jax.Array) -> jax.Array:
    """Opt-in XLA layout pin on the decoder resize output.

    ``$EGM_UP_LAYOUT="1,2,0,3"`` (a major_to_minor permutation) constrains
    the resize-matmul output to that device layout via
    ``jax.experimental.layout.with_layout_constraint``, so the layout flip
    XLA otherwise schedules between the einsum (W-minor fusion layout) and
    the consumer conv (C-minor) can fuse into the matmul epilogue instead of
    running as a standalone ~2 ms copy (PERF.md round-2 profile: ~21 ms/iter
    of decoder resize layout flips at batch 128).  Measurement hook only —
    unset = XLA's own choice."""
    import os

    spec = os.environ.get("EGM_UP_LAYOUT")
    if not spec:
        return y
    order = tuple(int(t) for t in spec.split(","))
    if len(order) != y.ndim:  # e.g. rank-3 eval-path resizes: leave alone
        return y
    from jax.experimental import layout

    return layout.with_layout_constraint(
        y, layout.Layout(major_to_minor=order))
