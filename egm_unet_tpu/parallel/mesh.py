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


def get_mesh_sp(
    n_data: Optional[int] = None,
    n_spatial: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """(data, spatial) mesh for the segmentation CNNs.

    ``spatial`` shards the image *height* dimension across chips: XLA/GSPMD
    partitions every conv / pool / resize along H and inserts the halo
    exchanges (neighbor ``ppermute`` rows for the 3x3/dilated windows) over
    ICI automatically.  This is the UNet scaling mode the reference cannot
    express at all (it is single-GPU NCHW full-image, SURVEY.md §2.12): it
    makes images whose *activations* exceed one chip's HBM trainable — at
    480-512 px one v5e holds the whole image easily, but at 2k-4k px
    (satellite / full-scene tactile-paving maps) the encoder's stage-1
    activations alone outgrow 16 GB and H-sharding is the only axis left
    after batch=1.  Kept separate from ``get_mesh``'s (data, model) axes:
    SP composes with DP for the CNNs while ``model`` is the CLIP-tower TP
    axis, and the shard_map'ed contrastive loss names only 'data'.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_spatial
    assert n_data * n_spatial == len(devices), (
        f"mesh {n_data}x{n_spatial} != {len(devices)} devices")
    arr = np.asarray(devices).reshape(n_data, n_spatial)
    return Mesh(arr, axis_names=("data", "spatial"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC batch (or NHW target): batch over 'data', H over 'spatial'."""
    return NamedSharding(mesh, P("data", "spatial"))


def shard_batch_spatial(mesh: Mesh, *arrays):
    """Place NHWC images / NHW targets with batch on 'data' and the height
    axis split over 'spatial' (GSPMD handles the conv halos from there)."""
    sh = spatial_sharding(mesh)
    out = tuple(jax.device_put(a, sh) for a in arrays)
    return out[0] if len(out) == 1 else out


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


def shard_superbatch_spatial(mesh: Mesh, *arrays):
    """(K, B, H, ...) multi-step stacks on a (data, spatial) mesh: batch on
    'data', image height on 'spatial', scan axis K replicated."""
    sh = NamedSharding(mesh, P(None, "data", "spatial"))
    out = tuple(jax.device_put(a, sh) for a in arrays)
    return out[0] if len(out) == 1 else out
