"""On-device evaluation metrics (confusion matrix, dice coefficient).

Functional rewrites of the reference's stateful meters
(ref: train_utils/distributed_utils.py:76-167): state is a plain pytree that
the caller threads through jit'ed update steps, and cross-device reduction is
a ``jax.lax.psum`` (or a host-side sum over mesh shards) instead of
``dist.all_reduce``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from egm_unet_tpu.losses import build_target, multiclass_dice_coeff


def confmat_init(num_classes: int) -> jax.Array:
    return jnp.zeros((num_classes, num_classes), jnp.int64)


def confmat_update(mat: jax.Array, target: jax.Array, pred: jax.Array) -> jax.Array:
    """Bincount update ``n*a[k] + b[k]`` (ref: distributed_utils.py:85-95).

    ``target``/``pred`` are any-shape int arrays; out-of-range targets
    (e.g. the 255 ignore fill) are dropped.
    """
    n = mat.shape[0]
    t = target.reshape(-1).astype(jnp.int32)
    p = pred.reshape(-1).astype(jnp.int32)
    k = (t >= 0) & (t < n)
    inds = jnp.where(k, n * t + p, n * n)  # invalid rows -> overflow bucket
    counts = jnp.bincount(inds, length=n * n + 1)[: n * n]
    return mat + counts.reshape(n, n).astype(mat.dtype)


def confmat_compute(mat: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(global acc, per-class acc, per-class IoU)
    (ref: distributed_utils.py:97-105)."""
    h = mat.astype(jnp.float64)
    acc_global = jnp.diag(h).sum() / jnp.maximum(h.sum(), 1e-12)
    acc = jnp.diag(h) / jnp.maximum(h.sum(axis=1), 1e-12)
    iu = jnp.diag(h) / jnp.maximum(h.sum(axis=1) + h.sum(axis=0) - jnp.diag(h), 1e-12)
    return acc_global, acc, iu


def confmat_str(mat) -> str:
    """Render the block the reference prints into record/*.txt
    (ref: distributed_utils.py:115-125)."""
    import numpy as np

    acc_global, acc, iu = (np.asarray(v) for v in confmat_compute(jnp.asarray(mat)))
    return (
        "global correct: {:.1f}\n"
        "average row correct: {}\n"
        "IoU: {}\n"
        "mean IoU: {:.1f}"
    ).format(
        acc_global * 100,
        [f"{i:.1f}" for i in (acc * 100).tolist()],
        [f"{i:.1f}" for i in (iu * 100).tolist()],
        float(iu.mean()) * 100,
    )


@dataclass(frozen=True)
class DiceState:
    cumulative: jax.Array  # f32 scalar
    count: jax.Array  # i32 scalar

    @property
    def value(self) -> jax.Array:
        return jnp.where(self.count == 0, 0.0, self.cumulative / jnp.maximum(self.count, 1))


jax.tree_util.register_pytree_node(
    DiceState,
    lambda s: ((s.cumulative, s.count), None),
    lambda _, kids: DiceState(*kids),
)


def dice_init() -> DiceState:
    return DiceState(jnp.zeros((), jnp.float32), jnp.zeros((), jnp.int32))


def dice_update(
    state: DiceState, logits: jax.Array, target: jax.Array, ignore_index: int = 255
) -> DiceState:
    """Mean foreground dice of the argmax prediction, skipping the background
    channel (ref: distributed_utils.py:128-151 — ``pred[:, 1:]``)."""
    num_classes = logits.shape[-1]
    pred = jax.nn.one_hot(jnp.argmax(logits, axis=-1), num_classes, dtype=jnp.float32)
    tgt = build_target(target, num_classes, ignore_index)
    d = multiclass_dice_coeff(pred[..., 1:], tgt[..., 1:], ignore_index=ignore_index)
    return DiceState(state.cumulative + d, state.count + 1)
