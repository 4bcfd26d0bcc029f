"""Train state: params + BN batch_stats + torch-semantics SGD.

The reference optimizes with SGD(lr=0.02, momentum=0.9, weight_decay=1e-4)
(ref: train.py:115-118).  torch applies weight decay to the gradient *before*
the momentum buffer, so the optax chain is
``add_decayed_weights -> trace(momentum) -> scale_by_lr``.
"""

from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.training import train_state


class TrainState(train_state.TrainState):
    batch_stats: Any = None
    lr_fn: Callable = struct.field(pytree_node=False, default=None)


def sgd_torch(lr_schedule, momentum: float = 0.9, weight_decay: float = 1e-4):
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.trace(decay=momentum, nesterov=False),
        optax.scale_by_learning_rate(lr_schedule),
    )


def create_train_state(
    model: nn.Module,
    rng: jax.Array,
    input_shape,
    lr_schedule,
    momentum: float = 0.9,
    weight_decay: float = 1e-4,
    tx=None,
) -> TrainState:
    variables = model.init(rng, jnp.zeros(input_shape, model.dtype), train=True)
    if tx is None:
        tx = sgd_torch(lr_schedule, momentum, weight_decay)
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=tx,
        lr_fn=lr_schedule,
    )
