"""Long-CLIP contrastive fine-tuning loss (ref: clip/model.py:572-614).

The reference computes, per rank: CSA image features + long/short text
features, L2-normalized; a *local-batch* PCA-32 reconstruction of the image
features as the "short" image proxy; grad-preserving
``torch.distributed.nn.all_gather`` of all four feature sets; and two
symmetric InfoNCE losses with label smoothing 0.1 against targets offset by
``rank * bs``.

TPU-native: the loss body is written for ``jax.shard_map`` over the mesh's
``data`` axis — ``jax.lax.all_gather`` is natively differentiable, replacing
torch.distributed.nn, and the rank offset is ``jax.lax.axis_index``.  A
single-device path (world = 1) falls out of the same code by running it
without an axis name.
"""

from __future__ import annotations

import math

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.training import train_state


def pca_reconstruct(x: jax.Array, dim: int) -> jax.Array:
    """SVD-based project-to-dim-and-back (ref: clip/model.py:519-536)."""
    if x.shape[0] < 2:
        # PCA over a single (per-shard) sample: the centered matrix is
        # exactly zero, so the reconstruction is the identity — but SVD of
        # a zero matrix has NaN gradients (the torch reference shares the
        # hazard, clip/model.py:527).  Return the identical forward value
        # with a well-defined gradient instead.
        return x
    mean = jnp.mean(x, axis=0)
    xc = (x - mean[None]).astype(jnp.float32)
    _, _, vt = jnp.linalg.svd(xc, full_matrices=False)
    pc = vt.T[:, :dim]
    return (xc @ pc) @ pc.T + mean[None]


def cross_entropy_smoothed(logits: jax.Array, targets: jax.Array,
                           label_smoothing: float = 0.1) -> jax.Array:
    """torch F.cross_entropy(label_smoothing=...) semantics."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    n = logits.shape[-1]
    nll = -jnp.take_along_axis(logp, targets[:, None], axis=1)[:, 0]
    smooth = -jnp.mean(logp, axis=-1)
    return jnp.mean((1.0 - label_smoothing) * nll + label_smoothing * smooth)


def _normalize(x):
    return x / jnp.linalg.norm(x, axis=1, keepdims=True)


def longclip_contrastive_loss(
    image_features: jax.Array,   # [b, d] local shard, un-normalized
    text_features_long: jax.Array,
    text_features_short: jax.Array,
    logit_scale: jax.Array,      # scalar, log-space
    axis_name: Optional[str] = None,
    pca_dim: int = 32,
    label_smoothing: float = 0.1,
):
    """Returns (loss_itcl, loss_itcs).  Call inside shard_map(axis_name=...)
    for multi-chip; with axis_name=None it is the single-process case."""
    img_long = _normalize(image_features.astype(jnp.float32))
    txt_long = _normalize(text_features_long.astype(jnp.float32))
    txt_short = _normalize(text_features_short.astype(jnp.float32))
    img_short = pca_reconstruct(img_long, pca_dim)  # PCA over the LOCAL batch

    if axis_name is not None:
        gather = lambda t: jax.lax.all_gather(t, axis_name).reshape(
            -1, t.shape[-1])  # differentiable
        rank = jax.lax.axis_index(axis_name)
    else:
        gather = lambda t: t
        rank = 0

    img_all_long = gather(img_long)
    img_all_short = gather(img_short)
    txt_all_long = gather(txt_long)
    txt_all_short = gather(txt_short)

    scale = jnp.exp(logit_scale)
    sim_i2tl = scale * img_long @ txt_all_long.T
    sim_tl2i = scale * (img_all_long @ txt_long.T).T
    sim_i2ts = scale * img_short @ txt_all_short.T
    sim_ts2i = scale * (img_all_short @ txt_short.T).T

    bs = image_features.shape[0]
    targets = rank * bs + jnp.arange(bs)

    loss_itcl = (cross_entropy_smoothed(sim_i2tl, targets, label_smoothing)
                 + cross_entropy_smoothed(sim_tl2i, targets, label_smoothing)) / 2
    loss_itcs = (cross_entropy_smoothed(sim_i2ts, targets, label_smoothing)
                 + cross_entropy_smoothed(sim_ts2i, targets, label_smoothing)) / 2
    return loss_itcl, loss_itcs


def make_longclip_loss_fn(model, mesh=None, ratio_short: float = 0.1):
    """loss(params, image, text_long, text_short) -> scalar.

    Total = loss_itcl + ratio_short * loss_itcs (Long-CLIP's training
    objective weighting).  With a mesh, features are computed under jit/GSPMD
    and the contrastive core runs in shard_map over 'data'.
    """

    def features(params, image, text_long, text_short):
        img = model.apply({"params": params}, image, method=model.encode_image)
        tl = model.apply({"params": params}, text_long, method=model.encode_text)
        ts = model.apply({"params": params}, text_short, method=model.encode_text)
        return img, tl, ts, params["logit_scale"]

    if mesh is None:
        def loss_fn(params, image, text_long, text_short):
            img, tl, ts, scale = features(params, image, text_long, text_short)
            l_long, l_short = longclip_contrastive_loss(img, tl, ts, scale)
            return l_long + ratio_short * l_short

        return loss_fn

    from jax.sharding import PartitionSpec as P

    def loss_fn(params, image, text_long, text_short):
        img, tl, ts, scale = features(params, image, text_long, text_short)

        def core(img_s, tl_s, ts_s):
            l_long, l_short = longclip_contrastive_loss(
                img_s, tl_s, ts_s, scale, axis_name="data")
            total = l_long + ratio_short * l_short
            return jax.lax.pmean(total, "data")

        sharded = jax.shard_map(
            core, mesh=mesh,
            in_specs=(P("data"), P("data"), P("data")),
            out_specs=P(),
        )
        return sharded(img, tl, ts)

    return loss_fn


# --------------------------------------------------------------- train loop

MAX_LOGIT_SCALE = math.log(100.0)  # upstream CLIP's post-step clamp


class LongClipTrainState(train_state.TrainState):
    lr_fn: Callable = struct.field(pytree_node=False, default=None)


def _trainable_mask(params):
    """Long-CLIP freezes the stretched ``positional_embedding`` and trains
    ``positional_embedding_res`` (plus everything else) —
    ref: clip/clip.py:250-251 (requires_grad False / True)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: not (
            len(path) == 1
            and getattr(path[0], "key", None) == "positional_embedding"),
        params)


def create_longclip_state(model, params, lr: float = 1e-6,
                          weight_decay: float = 1e-2,
                          warmup_steps: int = 200, total_steps: int = 10000):
    """AdamW + linear-warmup cosine decay over the trainable subset.

    The reference repo ships only the loss forward (clip/model.py:572-614);
    the optimizer recipe follows upstream Long-CLIP's fine-tune (AdamW,
    low lr, cosine decay) with every knob exposed.
    """
    # optax requires decay_steps > warmup_steps (the cosine tail must be
    # non-empty); short smoke runs with total <= warmup would raise
    # "positive decay_steps, got decay_steps=0" — clamp the warmup instead
    # of failing (the schedule degrades to pure warmup + a 1-step tail).
    warmup_steps = min(warmup_steps, max(0, total_steps - 1))
    sched = optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=lr, warmup_steps=warmup_steps,
        decay_steps=max(total_steps, warmup_steps + 1), end_value=lr * 1e-2)
    # multi_transform (not bare optax.masked): frozen leaves must get a
    # set_to_zero update — masked alone would pass their raw gradients
    # through as parameter updates
    labels = jax.tree_util.tree_map(
        lambda t: "train" if t else "freeze", _trainable_mask(params))
    tx = optax.multi_transform(
        {"train": optax.adamw(sched, weight_decay=weight_decay),
         "freeze": optax.set_to_zero()}, labels)
    return LongClipTrainState.create(apply_fn=model.apply, params=params,
                                     tx=tx, lr_fn=sched)


def make_longclip_train_step(model, mesh=None, ratio_short: float = 0.1):
    """step(state, image, text_long, text_short) -> (state, aux).

    Full fine-tune step: contrastive loss (all_gather'ed under shard_map when
    a mesh is given), AdamW update on the trainable mask, then the upstream
    logit-scale clamp at ln(100) (CLIP caps the temperature after each step).
    Jit this (optionally under ``jax.set_mesh``) for TPU execution.
    """
    loss_fn = make_longclip_loss_fn(model, mesh=mesh, ratio_short=ratio_short)

    def step(state, image, text_long, text_short):
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, image, text_long, text_short)
        state = state.apply_gradients(grads=grads)
        params = dict(state.params)
        params["logit_scale"] = jnp.minimum(params["logit_scale"],
                                            MAX_LOGIT_SCALE)
        state = state.replace(params=params)
        return state, {"loss": loss, "lr": state.lr_fn(state.step)}

    return step
