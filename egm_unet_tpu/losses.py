"""Training losses with exact numeric parity to the reference.

The total criterion (ref: train_utils/train_and_eval.py:7-19) is, per output
head:

    CE(x, t, weight, ignore=255) + dice_loss + 1.0*laplace_loss(x)
    + lap_loss(x, t) + sobel_loss(x, t)

Quirks reproduced on purpose (SURVEY.md §7 "hard parts"):

- ``sobel_loss`` is called with arguments swapped relative to its signature
  (logits land in ``y_true``; ref: train_and_eval.py:13) — we keep the call
  semantics, not the misleading names.
- ``lap_loss`` / ``sobel_loss`` narrow the *target* to the first batch
  element only and broadcast it against every prediction in the batch
  (ref: dice_coefficient_loss.py:81,97).
- ``dice_coeff`` replaces a zero denominator with ``2*inter``
  (ref: dice_coefficient_loss.py:36-37).
- class weights [1.0, 2.0] iff num_classes == 2 (ref: train_and_eval.py:50-53).

Layout: logits are NHWC ``[B, H, W, C]``; targets are ``[B, H, W]`` int32.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from egm_unet_tpu.ops.stencil import LAPLACE4, LAPLACE8, SOBEL_X, SOBEL_Y, stencil2d

IGNORE_INDEX = 255


def cross_entropy(
    logits: jax.Array,
    target: jax.Array,
    weight: Optional[jax.Array] = None,
    ignore_index: int = IGNORE_INDEX,
) -> jax.Array:
    """Weighted CE with ignore_index, matching ``F.cross_entropy``.

    torch's weighted mean divides by the sum of the per-pixel class weights
    of the non-ignored pixels, not the pixel count.
    """
    num_classes = logits.shape[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    valid = target != ignore_index
    t_safe = jnp.where(valid, target, 0).astype(jnp.int32)
    # class selection via one-hot (iota-compare) instead of take_along_axis /
    # integer indexing: per-pixel gathers and their scatter transpose were
    # ~15% of the whole train step on TPU (tools/profile_train.py)
    onehot = jax.nn.one_hot(t_safe, num_classes, dtype=jnp.float32)
    nll = -jnp.sum(logp * onehot, axis=-1)
    if weight is None:
        w = jnp.ones((num_classes,), jnp.float32)
    else:
        w = weight.astype(jnp.float32)
    pix_w = jnp.where(valid, jnp.sum(w * onehot, axis=-1), 0.0)
    return jnp.sum(nll * pix_w) / jnp.maximum(jnp.sum(pix_w), 1e-12)


def build_target(target: jax.Array, num_classes: int = 2, ignore_index: int = -100) -> jax.Array:
    """One-hot target with ignored positions stamped to ``ignore_index`` in
    every channel (ref: dice_coefficient_loss.py:7-19).  Returns NHWC."""
    if ignore_index >= 0:
        ignore_mask = target == ignore_index
        cleaned = jnp.where(ignore_mask, 0, target)
        onehot = jax.nn.one_hot(cleaned, num_classes, dtype=jnp.float32)
        onehot = jnp.where(ignore_mask[..., None], float(ignore_index), onehot)
    else:
        onehot = jax.nn.one_hot(target, num_classes, dtype=jnp.float32)
    return onehot


def dice_coeff(
    x: jax.Array, target: jax.Array, ignore_index: int = -100, epsilon: float = 1e-6
) -> jax.Array:
    """Per-sample ROI-masked dice, averaged over batch.

    ``x``/``target``: ``[B, ...]`` floats (one channel's probabilities and
    one-hot targets).  Vectorized equivalent of the reference's python loop
    (ref: dice_coefficient_loss.py:22-41).
    """
    b = x.shape[0]
    xf = x.astype(jnp.float32).reshape(b, -1)
    tf = target.astype(jnp.float32).reshape(b, -1)
    if ignore_index >= 0:
        roi = (tf != float(ignore_index)).astype(jnp.float32)
    else:
        roi = jnp.ones_like(tf)
    inter = jnp.sum(xf * tf * roi, axis=1)
    sets_sum = jnp.sum(xf * roi, axis=1) + jnp.sum(tf * roi, axis=1)
    sets_sum = jnp.where(sets_sum == 0.0, 2.0 * inter, sets_sum)
    d = (2.0 * inter + epsilon) / (sets_sum + epsilon)
    return jnp.mean(d)


def multiclass_dice_coeff(
    x: jax.Array, target: jax.Array, ignore_index: int = -100, epsilon: float = 1e-6
) -> jax.Array:
    """Channel mean of ``dice_coeff``; channels are the trailing axis (NHWC)."""
    num_ch = x.shape[-1]
    total = 0.0
    for c in range(num_ch):
        total = total + dice_coeff(x[..., c], target[..., c], ignore_index, epsilon)
    return total / num_ch


def dice_loss(
    logits: jax.Array, target_onehot: jax.Array, multiclass: bool = False, ignore_index: int = -100
) -> jax.Array:
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    fn = multiclass_dice_coeff if multiclass else dice_coeff
    return 1.0 - fn(probs, target_onehot, ignore_index=ignore_index)


def laplace_loss(logits: jax.Array) -> jax.Array:
    """mean |Laplacian4(channel-0 logits)| — smoothness prior
    (ref: dice_coefficient_loss.py:59-69)."""
    ch0 = logits[..., 0].astype(jnp.float32)  # [B, H, W]
    return jnp.mean(jnp.abs(stencil2d(ch0, LAPLACE4)))


def lap_loss(logits: jax.Array, target: jax.Array) -> jax.Array:
    """mean |Lap8(pred ch0) - Lap8(target[0])|, target first-sample broadcast
    (ref: dice_coefficient_loss.py:71-91)."""
    pred = logits[..., 0].astype(jnp.float32)  # [B, H, W]
    truth = target[:1].astype(jnp.float32)  # [1, H, W] — first element only
    pred_d2 = stencil2d(pred, LAPLACE8)
    truth_d2 = stencil2d(truth, LAPLACE8)
    return jnp.mean(jnp.abs(pred_d2 - truth_d2))


def sobel_loss(logits: jax.Array, target: jax.Array) -> jax.Array:
    """Sobel edge-response L1 between logits ch0 and the first target
    (ref: dice_coefficient_loss.py:94-108; call site swaps the args —
    we take (logits, target) like the call site does)."""
    pred = logits[..., 0].astype(jnp.float32)
    truth = target[:1].astype(jnp.float32)
    dxp, dyp = stencil2d(pred, SOBEL_X), stencil2d(pred, SOBEL_Y)
    dxt, dyt = stencil2d(truth, SOBEL_X), stencil2d(truth, SOBEL_Y)
    return jnp.mean(jnp.abs(dxt - dxp) + jnp.abs(dyt - dyp))


def criterion(
    outputs: dict,
    target: jax.Array,
    loss_weight: Optional[jax.Array] = None,
    num_classes: int = 2,
    dice: bool = True,
    ignore_index: int = IGNORE_INDEX,
) -> jax.Array:
    """Total training loss over the model's output heads
    (ref: train_utils/train_and_eval.py:7-19)."""
    losses = {}
    for name, x in outputs.items():
        loss = cross_entropy(x, target, loss_weight, ignore_index)
        if dice:
            dice_target = build_target(target, num_classes, ignore_index)
            loss = (
                loss
                + dice_loss(x, dice_target, multiclass=True, ignore_index=ignore_index)
                + 1.0 * laplace_loss(x)
                + lap_loss(x, target)
                + sobel_loss(x, target)
            )
        losses[name] = loss
    if len(losses) == 1:
        return losses["out"]
    return losses["out"] + 0.5 * losses["aux"]


def default_loss_weight(num_classes: int) -> Optional[jax.Array]:
    """Class weights [1, 2] iff binary (ref: train_and_eval.py:50-53)."""
    if num_classes == 2:
        return jnp.array([1.0, 2.0], jnp.float32)
    return None
