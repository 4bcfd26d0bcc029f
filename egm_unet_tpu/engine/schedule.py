"""LR schedule: 1-epoch linear warmup from factor 1e-3, then poly decay
``(1 - progress)^0.9`` — exact formula of the reference
(ref: train_utils/train_and_eval.py:78-100), stepped per iteration."""

from __future__ import annotations

import jax.numpy as jnp


def warmup_poly_schedule(
    base_lr: float,
    num_step: int,
    epochs: int,
    warmup: bool = True,
    warmup_epochs: int = 1,
    warmup_factor: float = 1e-3,
    power: float = 0.9,
):
    assert num_step > 0 and epochs > 0
    if not warmup:
        warmup_epochs = 0
    warmup_steps = warmup_epochs * num_step
    total_decay = (epochs - warmup_epochs) * num_step

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if warmup and warmup_steps > 0:
            alpha = step / warmup_steps
            wf = warmup_factor * (1 - alpha) + alpha
        else:
            wf = jnp.asarray(1.0)
        decay = jnp.maximum(1.0 - (step - warmup_steps) / total_decay, 0.0) ** power
        factor = jnp.where((step <= warmup_steps) & warmup, wf, decay)
        return base_lr * factor

    return schedule
