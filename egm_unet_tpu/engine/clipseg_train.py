"""CLIPSeg training loop on PhraseCut — the upstream CLIPSeg contract the
reference's vestigial config layer documents (ref: experiments/phrasecut.yaml:
AdamW lr 1e-3, cosine T_max 20000 eta_min 1e-4, batch 64, image 352,
BCE-with-logits, prompt mode shuffle+, negative_prob 0.2; decoder-only
training — the CLIP tower is frozen, ref: models/clipseg.py:155-156).

TPU-native: one jit'ed sharded train step (batch over the mesh's ``data``
axis); text conditioning is precomputed per batch through the frozen tower
inside the same program; only decoder params get optimizer state
(``optax.masked``).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.training import train_state


def bce_with_logits(logits: jax.Array, target: jax.Array) -> jax.Array:
    """mean binary_cross_entropy_with_logits (the yaml's loss)."""
    logits = logits.astype(jnp.float32)
    target = target.astype(jnp.float32)
    return jnp.mean(
        jnp.maximum(logits, 0) - logits * target + jnp.log1p(jnp.exp(-jnp.abs(logits))))


def cosine_schedule(lr: float = 1e-3, t_max: int = 20000, eta_min: float = 1e-4):
    """torch CosineAnnealingLR formula (the yaml's scheduler)."""

    def f(step):
        step = jnp.minimum(jnp.asarray(step, jnp.float32), t_max)
        return eta_min + (lr - eta_min) * 0.5 * (1 + jnp.cos(jnp.pi * step / t_max))

    return f


class ClipSegTrainState(train_state.TrainState):
    lr_fn: Callable = struct.field(pytree_node=False, default=None)


def _decoder_mask(params) -> Any:
    """True for trainable (non-CLIP-tower) params."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: not (path and getattr(path[0], "key", None) == "clip"), params)


def create_clipseg_state(model, rng, image_shape,
                         lr: float = 1e-3, t_max: int = 20000,
                         eta_min: float = 1e-4, weight_decay: float = 1e-2):
    # init with TOKEN conditioning so the frozen text tower's params
    # materialize too (linen only creates params on the traced path)
    tokens0 = jnp.zeros((image_shape[0], model.clip_cfg.context_length), jnp.int32)
    variables = model.init(rng, jnp.zeros(image_shape, jnp.float32), tokens0)
    sched = cosine_schedule(lr, t_max, eta_min)
    tx = optax.masked(
        optax.adamw(sched, weight_decay=weight_decay),
        _decoder_mask(variables["params"]))
    return ClipSegTrainState.create(
        apply_fn=model.apply, params=variables["params"], tx=tx, lr_fn=sched)


def make_clipseg_train_step(model):
    """step(state, images, segs, tokens) -> (state, aux).  ``tokens`` are
    pre-tokenized [B, ctx] Long-CLIP prompts; encoding runs through the
    frozen tower (stop_gradient'ed inside the model)."""

    def step(state, images, segs, tokens):
        def loss_fn(params):
            (logits,) = model.apply({"params": params}, images, tokens)
            return bce_with_logits(logits[..., 0], segs)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        state = state.apply_gradients(grads=grads)
        return state, {"loss": loss, "lr": state.lr_fn(state.step)}

    return step


def clipseg_foreground_iou(logits: jax.Array, segs: jax.Array,
                           threshold: float = 0.5) -> jax.Array:
    """fgIoU at a sigmoid threshold (the yaml's pc_fgiou metrics)."""
    pred = jax.nn.sigmoid(logits.astype(jnp.float32)) > threshold
    gt = segs > 0.5
    inter = jnp.sum(pred & gt)
    union = jnp.sum(pred | gt)
    return jnp.where(union == 0, 1.0, inter / jnp.maximum(union, 1))
