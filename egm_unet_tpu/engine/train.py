"""jit'ed train/eval steps, data-parallel over a device mesh.

TPU-native distribution model (replaces the reference's torch.distributed
NCCL utilities, ref: train_utils/distributed_utils.py:315-338): the step is a
single jit'ed program; the batch is sharded over the mesh's ``data`` axis
with ``NamedSharding`` and params are replicated.  XLA/GSPMD inserts the
gradient all-reduces over ICI, and — because BatchNorm's batch mean runs over
the globally-sharded batch axis — BN is *synchronized* across replicas by
construction (the single-device reference never had to choose; SURVEY.md §7
flags this as a parity decision, and sync-BN matches the reference's
one-device bs=8 statistics semantics at global batch 8).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from egm_unet_tpu import losses as L
from egm_unet_tpu import metrics as M


def _device_normalize(images, normalize, input_dtype):
    """uint8-wire path: (x/255 - mean)/std in f32 on device — bit-identical
    to the host ``transforms.normalize`` it replaces, but the tunnel ships
    1 byte/px instead of 2-4 (the H2D copy is the train-loop bottleneck on
    a remote TPU; PERF.md round 3)."""
    mean, std = normalize
    x = images.astype(jnp.float32) / 255.0
    x = (x - jnp.asarray(mean)) / jnp.asarray(std)
    return x.astype(input_dtype) if input_dtype is not None else x


def make_train_step(num_classes: int = 2, dice: bool = True,
                    ignore_index: int = 255, normalize=None,
                    input_dtype=None):
    """Returns step(state, images, targets) -> (state, aux dict).

    ``normalize=(mean, std)``: images arrive as raw uint8 and are
    normalized on device (see _device_normalize)."""
    loss_weight = L.default_loss_weight(num_classes)

    def train_step(state, images, targets):
        if normalize is not None:
            images = _device_normalize(images, normalize, input_dtype)

        def loss_fn(params):
            outputs, updates = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                images,
                train=True,
                mutable=["batch_stats"],
            )
            loss = L.criterion(outputs, targets, loss_weight, num_classes,
                               dice=dice, ignore_index=ignore_index)
            return loss, updates["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads=grads, batch_stats=new_stats)
        aux = {"loss": loss, "lr": state.lr_fn(state.step)}
        return state, aux

    return train_step


def make_train_step_accum(accum: int, num_classes: int = 2, dice: bool = True,
                          ignore_index: int = 255, normalize=None,
                          input_dtype=None):
    """Gradient-accumulation step: ``(state, images[B], targets[B])`` with B
    split into ``accum`` sequential microbatches of B/accum inside one jit —
    grads are averaged across microbatches and applied in ONE optimizer
    update, so the *optimizer* sees the full batch while the *activations*
    (and the backward working set) only ever hold one microbatch.

    This is the bs-128-at-480px enabler on a 16 GB chip: the monolithic
    bs-128 backward OOMs on decoder/EGRFB activation temps even with
    per-conv remat (runs/r03_master/train_bs128_short.log), and the
    per-conv-remat program is itself too large for the remote compiler at
    12 unrolled steps.  2 x bs-64 microbatches with stage remat fit easily
    and compile fast.

    Semantics vs a monolithic batch (documented, inherent to accumulation):
    - BatchNorm statistics are computed per microbatch (each forward sees
      B/accum samples) and the running stats thread through the scan — the
      same thing a sequential torch grad-accumulation loop does.
    - The reference's ``lap_loss`` first-sample quirk (ref:
      dice_coefficient_loss.py:81, kept for parity in losses.py) samples the
      first element of *each microbatch*, and the per-microbatch mean losses
      are averaged with equal weight (exact for B % accum == 0, which is
      enforced).
    """
    loss_weight = L.default_loss_weight(num_classes)

    def train_step(state, images, targets):
        if normalize is not None:
            images = _device_normalize(images, normalize, input_dtype)
        batch = images.shape[0]
        if batch % accum:
            raise ValueError(f"batch {batch} not divisible by accum {accum}")
        mb = batch // accum
        im = images.reshape(accum, mb, *images.shape[1:])
        tg = targets.reshape(accum, mb, *targets.shape[1:])

        def micro(carry, xt):
            stats, gsum, lsum = carry
            x, t = xt

            def loss_fn(params):
                outputs, updates = state.apply_fn(
                    {"params": params, "batch_stats": stats},
                    x, train=True, mutable=["batch_stats"])
                loss = L.criterion(outputs, t, loss_weight, num_classes,
                                   dice=dice, ignore_index=ignore_index)
                return loss, updates["batch_stats"]

            (loss, new_stats), g = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            gsum = jax.tree_util.tree_map(jnp.add, gsum, g)
            return (new_stats, gsum, lsum + loss), ()

        zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        carry0 = (state.batch_stats, zeros, jnp.zeros((), jnp.float32))
        (new_stats, gsum, lsum), _ = jax.lax.scan(micro, carry0, (im, tg))
        grads = jax.tree_util.tree_map(lambda a: a / accum, gsum)
        state = state.apply_gradients(grads=grads, batch_stats=new_stats)
        aux = {"loss": lsum / accum, "lr": state.lr_fn(state.step)}
        return state, aux

    return train_step


def make_train_multistep(num_classes: int = 2, dice: bool = True,
                         ignore_index: int = 255, normalize=None,
                         input_dtype=None, accum: int = 1):
    """K train steps per dispatch: ``(state, images[K,B,...],
    targets[K,B,...]) -> (state, aux-of-[K])`` via ``lax.scan``.

    On a tunneled/remote TPU every program launch costs a host round-trip
    (~0.7 s measured on the axon tunnel — 2.5x the bs-8 compute step), so
    the single-step loop is latency-bound no matter how batches are
    prefetched.  Scanning K steps inside one jitted program amortizes the
    launch to 1/K per step; the scan carries the full train state (params,
    opt state, BN stats) exactly as the Python loop would.  This replaces
    the per-step `loss.backward()` launch loop of the reference
    (ref: train_utils/train_and_eval.py:43-75) with a dispatch shape
    designed for a remote accelerator.  ``accum > 1`` makes the inner step a
    gradient-accumulation step (make_train_step_accum)."""
    if accum > 1:
        step = make_train_step_accum(accum, num_classes, dice, ignore_index,
                                     normalize, input_dtype)
    else:
        step = make_train_step(num_classes, dice, ignore_index, normalize,
                               input_dtype)

    def multi_step(state, images, targets):
        def body(st, xt):
            return step(st, xt[0], xt[1])

        return jax.lax.scan(body, state, (images, targets))

    return multi_step


def make_eval_step(num_classes: int = 2, ignore_index: int = 255,
                   normalize=None, input_dtype=None):
    """Returns step(state, images, targets, confmat, dice) -> (confmat, dice).

    Metric accumulation happens on device (ref: train_and_eval.py:22-40).
    ``normalize``: see make_train_step.
    """

    def eval_step(state, images, targets, confmat, dice_state):
        if normalize is not None:
            images = _device_normalize(images, normalize, input_dtype)
        outputs = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            images,
            train=False,
        )
        logits = outputs["out"]
        pred = jnp.argmax(logits, axis=-1)
        confmat = M.confmat_update(confmat, targets, pred)
        dice_state = M.dice_update(dice_state, logits, targets, ignore_index)
        return confmat, dice_state

    return eval_step


@functools.partial(jax.jit, static_argnames=("num_classes", "ignore_index"))
def eval_step(state, images, targets, confmat, dice_state,
              num_classes: int = 2, ignore_index: int = 255):
    return make_eval_step(num_classes, ignore_index)(
        state, images, targets, confmat, dice_state)


def jit_sharded(fn, mesh, *, donate_state: bool = True):
    """jit ``fn(state, images, targets, ...)`` with batch sharded over the
    mesh's ``data`` axis and everything else replicated."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P("data"))

    def shard_args(state, images, targets, *rest):
        state = jax.device_put(state, repl)
        images = jax.device_put(images, batch_sh)
        targets = jax.device_put(targets, batch_sh)
        rest = tuple(jax.device_put(r, repl) for r in rest)
        return (state, images, targets, *rest)

    jitted = jax.jit(fn, donate_argnums=(0,) if donate_state else ())
    return jitted, shard_args
