"""Tensor-parallel sharding rules for the CLIP towers.

The segmentation CNNs are data-parallel (like the reference); the CLIP
transformer towers are where tensor parallelism pays at scale.  Megatron-
style layout over the mesh's ``model`` axis:

- attention ``in_proj`` kernel [d, 3d]: shard the fused qkv *output* dim ->
  heads split across chips (column parallel);
- ``out_proj`` kernel [d, d]: shard the *input* dim (row parallel; GSPMD
  inserts the psum);
- MLP ``c_fc`` [d, 4d] column / ``c_proj`` [4d, d] row parallel.

Everything else (embeddings, LN, convs) stays replicated.  Apply with
``shard_clip_params`` — returns the params placed with NamedShardings; jit
then propagates the layout and inserts ICI collectives.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _spec_for(path) -> P:
    keys = [getattr(p, "key", str(p)) for p in path]
    name = keys[-1]
    parent = keys[-2] if len(keys) >= 2 else ""
    if parent in ("in_proj", "c_fc"):
        return P(None, "model") if name == "kernel" else P("model")
    if parent in ("out_proj", "c_proj"):
        return P("model", None) if name == "kernel" else P()
    return P()


def clip_param_specs(params) -> Any:
    """Pytree of PartitionSpecs matching ``params`` (CLIP tree or any tree
    containing resblocks with in_proj/out_proj/c_fc/c_proj)."""
    return jax.tree_util.tree_map_with_path(lambda path, _: _spec_for(path), params)


def shard_clip_params(params, mesh: Mesh):
    specs = clip_param_specs(params)
    return jax.tree_util.tree_map(
        lambda p, s: jax.device_put(p, NamedSharding(mesh, s)), params, specs)
