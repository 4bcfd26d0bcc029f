"""Logit-fusion ensemble: ``fused = clip_logits + alpha * unet_logits`` with
val-searched alpha (ref: eval_CLIPseg.py:656-723, best_alpha.txt contract).

The reference's alpha search is a Python loop of 100 alphas x N images x a
global confusion matrix.  TPU-native version: per-image *sufficient
statistics* are accumulated once, and the 100-alpha sweep is a single
vmap'ed confusion-matrix evaluation — O(100 N) tiny device ops collapse into
one jitted program.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from egm_unet_tpu import metrics as M


def fuse_logits(clip_logits: jax.Array, unet_logits: jax.Array, alpha) -> jax.Array:
    """ref: eval_CLIPseg.py fusion: argmax(clip + alpha*unet)."""
    return clip_logits + jnp.asarray(alpha, clip_logits.dtype) * unet_logits


@functools.partial(jax.jit, static_argnames=("num_classes",))
def fused_confmats(clip_logits, unet_logits, labels, alphas, num_classes: int = 2):
    """[A, C, C] confusion matrices for every alpha over one batch.

    clip/unet logits: [B, H, W, C] (already resized to label size);
    labels: [B, H, W] int (255 = ignore); alphas: [A]."""

    def one_alpha(alpha):
        pred = jnp.argmax(fuse_logits(clip_logits, unet_logits, alpha), axis=-1)
        return M.confmat_update(M.confmat_init(num_classes), labels, pred)

    return jax.vmap(one_alpha)(alphas)


def search_best_alpha(
    pairs,  # iterable of (clip_logits, unet_logits, labels) device batches
    num_classes: int = 2,
    alpha_range: Tuple[float, float] = (0.1, 10.0),
    num_alphas: int = 100,
):
    """Global mIoU over the whole val set for each alpha; returns
    (best_alpha, best_miou, per_alpha_miou).  Matches the reference's grid
    (linspace 0.1..10, 100 points, ref: eval_CLIPseg.py:676)."""
    alphas = jnp.linspace(alpha_range[0], alpha_range[1], num_alphas)
    total = jnp.zeros((num_alphas, num_classes, num_classes), jnp.int64)
    for clip_logits, unet_logits, labels in pairs:
        total = total + fused_confmats(clip_logits, unet_logits, labels,
                                       alphas, num_classes)

    def miou(mat):
        _, _, iu = M.confmat_compute(mat)
        return jnp.nanmean(iu)

    mious = jax.vmap(miou)(total)
    best = int(jnp.argmax(mious))
    return float(alphas[best]), float(mious[best]), mious


def save_alpha(alpha: float, path: str = "best_alpha.txt"):
    """ref: eval_CLIPseg.py:789-793 / best_alpha.txt:1."""
    with open(path, "w") as f:
        f.write(f"{alpha}\n")


def load_alpha(path: str = "best_alpha.txt", default: float = 0.5) -> float:
    """ref: predict_CLIPseg.py:394-399 (default 0.5 when absent)."""
    import os

    if not os.path.exists(path):
        return default
    with open(path) as f:
        return float(f.read().strip())
