"""Mesh construction and sharding helpers.

Axes convention: ``data`` (batch / data parallelism, rides ICI) and
``model`` (reserved for tensor-parallel shardings of the CLIP encoder at
larger scales).  The reference is data-parallel only (SURVEY.md §2 header),
so ``model`` defaults to size 1.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model == len(devices), (
        f"mesh {n_data}x{n_model} != {len(devices)} devices")
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays):
    sh = batch_sharding(mesh)
    out = tuple(jax.device_put(a, sh) for a in arrays)
    return out[0] if len(out) == 1 else out


def shard_superbatch(mesh: Mesh, *arrays):
    """Place (K, B, ...) multi-step stacks with the batch (second) axis on
    the data mesh axis — the scan axis K stays unsharded on every device."""
    sh = NamedSharding(mesh, P(None, "data"))
    out = tuple(jax.device_put(a, sh) for a in arrays)
    return out[0] if len(out) == 1 else out
