"""Device-mesh and sharding utilities (the TPU-native replacement for the
reference's torch.distributed/NCCL layer, SURVEY.md §2.12/§5.8)."""

from egm_unet_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    get_mesh,
    get_mesh_sp,
    replicated,
    shard_batch,
    shard_batch_spatial,
    spatial_sharding,
)
