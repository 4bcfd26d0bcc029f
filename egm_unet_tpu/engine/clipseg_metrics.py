"""Fixed-interval evaluation metrics for CLIPSeg / PhraseCut.

The reference yaml names ``metrics.FixedIntervalMetrics`` with columns
pc_miou_0.3 / pc_fgiou_0.3 / pc_fgiou_0.5 / pc_ap
(ref: experiments/phrasecut.yaml test_configuration) — the upstream module
is missing; this is a native, vectorized implementation: one jitted sweep
over a fixed threshold grid accumulating binary confusion counts, from which
fgIoU@t, binary mIoU@t and average precision fall out.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp

DEFAULT_GRID = jnp.linspace(0.0, 1.0, 21)


@functools.partial(jax.jit, static_argnames=())
def threshold_counts(probs: jax.Array, segs: jax.Array,
                     grid: jax.Array = DEFAULT_GRID) -> Dict[str, jax.Array]:
    """[T]-shaped tp/fp/fn/tn over the threshold grid for one batch.
    probs: sigmoid outputs in [0,1]; segs: {0,1} targets."""
    gt = (segs > 0.5).reshape(-1)

    def one(t):
        pred = (probs.reshape(-1) >= t)
        tp = jnp.sum(pred & gt)
        fp = jnp.sum(pred & ~gt)
        fn = jnp.sum(~pred & gt)
        tn = jnp.sum(~pred & ~gt)
        return jnp.stack([tp, fp, fn, tn])

    counts = jax.vmap(one)(grid)
    return {"tp": counts[:, 0], "fp": counts[:, 1],
            "fn": counts[:, 2], "tn": counts[:, 3]}


def accumulate(total, batch):
    if total is None:
        return batch
    return {k: total[k] + batch[k] for k in total}


def fixed_interval_metrics(total: Dict[str, jax.Array],
                           grid: jax.Array = DEFAULT_GRID) -> Dict[str, float]:
    tp = total["tp"].astype(jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    fp, fn, tn = (total[k].astype(tp.dtype) for k in ("fp", "fn", "tn"))

    fg_iou = tp / jnp.maximum(tp + fp + fn, 1)
    bg_iou = tn / jnp.maximum(tn + fp + fn, 1)
    miou = 0.5 * (fg_iou + bg_iou)
    precision = tp / jnp.maximum(tp + fp, 1)
    recall = tp / jnp.maximum(tp + fn, 1)

    # AP: precision-recall curve over the threshold sweep with the standard
    # interpolation — precision envelope (max precision at recall >= r) and
    # a recall-0 anchor so a constant-recall curve still integrates.
    order = jnp.argsort(recall)
    r, p = recall[order], precision[order]
    p_env = jnp.flip(jax.lax.cummax(jnp.flip(p)))
    r_prev = jnp.concatenate([jnp.zeros((1,), r.dtype), r[:-1]])
    ap = jnp.sum((r - r_prev) * p_env)

    def at(metric, t):
        idx = int(jnp.argmin(jnp.abs(grid - t)))
        return float(metric[idx])

    return {
        "fgiou_0.3": at(fg_iou, 0.3),
        "fgiou_0.5": at(fg_iou, 0.5),
        "miou_0.3": at(miou, 0.3),
        "ap": float(ap),
        "best_fgiou": float(fg_iou.max()),
        "best_threshold": float(grid[int(jnp.argmax(fg_iou))]),
    }
