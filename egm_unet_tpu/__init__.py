"""egm_unet_tpu — a TPU-native (JAX/XLA/Pallas) segmentation framework.

A from-scratch rebuild of the capabilities of feiyeha/EGM-Unet (tactile-paving
semantic segmentation with the EGM-UNet family, a text-prompted CLIPSeg path
with CSA attention and Long-CLIP conditioning, and a logit-fusion ensemble),
designed TPU-first:

- NHWC layouts, bfloat16 compute, static shapes, XLA-fused conv blocks.
- Data parallelism via ``jax.sharding.Mesh`` + jit'ed sharded train steps
  (the reference's torch.distributed/NCCL hooks become XLA collectives).
- Pallas kernels for the hot attention ops (CSA) on real TPUs.
- Functional train/eval engine with optax, orbax checkpoints, on-device
  confusion-matrix metrics.

The reference repo is cited throughout docstrings as ``ref: <file:line>`` so
behavioral parity can be audited; no reference code is copied.
"""

__version__ = "0.1.0"

from egm_unet_tpu.utils.cache import enable_persistent_cache  # noqa: F401

# Persistent compile cache for every CLI / test / bench process (jax 0.9.0
# ignores JAX_COMPILATION_CACHE_DIR; see utils/cache.py for the root cause).
enable_persistent_cache()

from egm_unet_tpu import losses, metrics  # noqa: F401
