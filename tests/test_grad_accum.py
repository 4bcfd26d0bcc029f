"""Gradient accumulation (engine.make_train_step_accum): the scan over
microbatches must equal a hand-rolled sequential loop — per-microbatch BN
stat threading, grad averaging, one optimizer update.  This is the bs-128
training enabler on a 16 GB chip (monolithic bs-128 backward OOMs even with
per-conv remat; PERF.md round 3).  The reference trains monolithic bs 8 only
(ref: train.py:115-118); accumulation is a beyond-reference extension with
documented semantics (BN sees the microbatch)."""

import jax
import jax.numpy as jnp
import numpy as np

from egm_unet_tpu import losses as L
from egm_unet_tpu.engine import (create_train_state, make_train_multistep,
                                 make_train_step_accum,
                                 warmup_poly_schedule)
from egm_unet_tpu.models import create_model


def _data(batch=4, size=32, seed=0):
    rng = np.random.default_rng(seed)
    images = jnp.asarray(rng.standard_normal((batch, size, size, 3)),
                         jnp.float32)
    targets = jnp.asarray(rng.integers(0, 2, (batch, size, size)), jnp.int32)
    return images, targets


def _state(model):
    sched = warmup_poly_schedule(0.02, num_step=4, epochs=2)
    return create_train_state(model, jax.random.key(0), (1, 32, 32, 3), sched)


def _manual_accum_reference(state, images, targets, accum, num_classes=2):
    """Sequential Python-loop reference for the scan implementation."""
    mb = images.shape[0] // accum
    loss_weight = L.default_loss_weight(num_classes)
    stats = state.batch_stats
    gsum = jax.tree_util.tree_map(jnp.zeros_like, state.params)
    lsum = jnp.zeros((), jnp.float32)
    for i in range(accum):
        x = images[i * mb:(i + 1) * mb]
        t = targets[i * mb:(i + 1) * mb]

        def loss_fn(params, stats=stats, x=x, t=t):
            outputs, updates = state.apply_fn(
                {"params": params, "batch_stats": stats},
                x, train=True, mutable=["batch_stats"])
            loss = L.criterion(outputs, t, loss_weight, num_classes)
            return loss, updates["batch_stats"]

        (loss, stats), g = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        gsum = jax.tree_util.tree_map(jnp.add, gsum, g)
        lsum = lsum + loss
    grads = jax.tree_util.tree_map(lambda a: a / accum, gsum)
    new_state = state.apply_gradients(grads=grads, batch_stats=stats)
    return new_state, lsum / accum


def test_accum_matches_sequential_loop():
    model = create_model("egm_unet", base_c=8)
    state = _state(model)
    images, targets = _data()

    step = make_train_step_accum(2, num_classes=2)
    new_state, aux = jax.jit(step)(state, images, targets)
    ref_state, ref_loss = _manual_accum_reference(state, images, targets, 2)

    np.testing.assert_allclose(float(aux["loss"]), float(ref_loss),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(new_state.params),
                    jax.tree_util.tree_leaves(ref_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(new_state.batch_stats),
                    jax.tree_util.tree_leaves(ref_state.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    assert int(new_state.step) == 1  # ONE optimizer update for the whole batch


def test_accum_batch_not_divisible_raises():
    model = create_model("unet", base_c=8)
    state = _state(model)
    images, targets = _data(batch=3)
    step = make_train_step_accum(2, num_classes=2)
    try:
        step(state, images, targets)
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "divisible" in str(e) or "accum" in str(e)


def test_multistep_with_accum_runs_and_decreases_loss():
    """K dispatch steps x accum microbatches compose (the bs-128 recipe is
    --steps-per-dispatch K --grad-accum 2 --remat)."""
    model = create_model("unet", base_c=8)
    state = _state(model)
    rng = np.random.default_rng(1)
    k = 3
    images = jnp.asarray(rng.standard_normal((k, 4, 32, 32, 3)), jnp.float32)
    # a learnable constant target pattern
    targets = jnp.asarray(
        np.tile((np.arange(32)[:, None] + np.arange(32)[None, :]) % 2,
                (k, 4, 1, 1)), jnp.int32)
    mstep = jax.jit(make_train_multistep(num_classes=2, accum=2))
    state, aux = mstep(state, images, targets)
    losses = np.asarray(aux["loss"])
    assert losses.shape == (k,)
    assert np.all(np.isfinite(losses))
    assert int(state.step) == k
    state, aux2 = mstep(state, images, targets)
    assert float(np.asarray(aux2["loss"])[-1]) < float(losses[0])
