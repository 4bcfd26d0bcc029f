"""Device-resident dataset cache — zero steady-state host->device traffic.

The tunneled backend's transfer staging leaks host RSS 1:1 with wire bytes
(tools/leak_probe.py, PERF.md round 5), so a 200-epoch run pays ~0.9 GB of
unreclaimable host memory per epoch just shipping the same 876 images again
and again.  For datasets that fit HBM (TP-Dataset: 876 x 480^2 x 3 uint8
~= 0.6 GB) the TPU-native fix is to upload the raw sources ONCE and keep
every per-step operation on device: each training step transfers only a
[batch] int32 index vector (~512 bytes); one jitted program gathers the
batch rows, rescales to float, and runs the fused paired augmentation
(data/device_aug.py) that mirrors the reference's host-side PIL pipeline
(ref: transforms.py + train.py presets).

Padding semantics match the host collate exactly (ref: my_dataset.py
collate_fn cat_list fill: image 0, target 255): a sentinel index < 0 yields
a zero image and an all-255 (loss-ignored) mask, so the final partial batch
keeps the compiled batch shape without perturbing the loss or the
steps-per-epoch the LR schedule was built from.
"""

from __future__ import annotations

import functools
from typing import Iterator, Tuple

import numpy as np


def build_cache_arrays(dataset, src_size: int,
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """Materialize the whole dataset as fixed-shape uint8 host arrays.

    ``dataset`` must yield RAW uint8 (image, target) pairs — construct it
    with ``transforms=None`` (both DriveDataset and SyntheticTPDataset do
    this).  Each sample is short-side resized to ``src_size`` (PIL bilinear
    / nearest via data/transforms.py) and corner-padded onto a square canvas
    — the same canvas the --device-aug RawSource uses, so the on-device
    augmentation sees identical sources either way.
    """
    from egm_unet_tpu.data.transforms import resize_short_side

    n = len(dataset)
    imgs = np.zeros((n, src_size, src_size, 3), np.uint8)
    masks = np.zeros((n, src_size, src_size), np.uint8)
    saved_tf = getattr(dataset, "transforms", None)
    dataset.transforms = None  # raw uint8 sources, not augmented crops
    try:
        for i in range(n):
            image, target = dataset[i]
            image = np.asarray(image)
            target = np.asarray(target)
            image, target = resize_short_side(image, target, src_size)
            h = min(image.shape[0], src_size)
            w = min(image.shape[1], src_size)
            imgs[i, :h, :w] = image[:h, :w]
            masks[i, :h, :w] = target[:h, :w]
    finally:
        dataset.transforms = saved_tf
    return imgs, masks


class DeviceDatasetCache:
    """Upload once; per-epoch iteration gathers + augments on device.

    The jitted batch program is a pure function of (cache arrays, key,
    indices) — the cache arrays are passed as arguments (NOT closed over) so
    they live once in HBM instead of being baked into the executable as
    constants.
    """

    def __init__(self, dataset, src_size: int, mean, std, crop_size: int,
                 min_size: int, max_size: int, out_dtype=None):
        import jax
        import jax.numpy as jnp

        from egm_unet_tpu.data.device_aug import augment_batch

        imgs, masks = build_cache_arrays(dataset, src_size)
        self.n = len(dataset)
        self.hbm_bytes = imgs.nbytes + masks.nbytes
        self.imgs = jax.device_put(imgs)
        self.masks = jax.device_put(masks)
        mean = jnp.asarray(mean)
        std = jnp.asarray(std)
        out_dtype = out_dtype or jnp.float32

        @functools.partial(jax.jit, donate_argnums=())
        def batch_fn(cache_imgs, cache_masks, key, idx):
            valid = idx >= 0
            safe = jnp.maximum(idx, 0)
            im = cache_imgs[safe].astype(jnp.float32) / 255.0
            tg = cache_masks[safe].astype(jnp.int32)
            im, tg = augment_batch(key, im, tg, mean, std,
                                   crop_size=crop_size, min_size=min_size,
                                   max_size=max_size)
            # sentinel rows reproduce collate_pad: image 0, mask 255
            im = jnp.where(valid[:, None, None, None], im, 0.0)
            tg = jnp.where(valid[:, None, None], tg, 255)
            return im.astype(out_dtype), tg

        self._batch_fn = batch_fn
        self._split = jax.jit(
            functools.partial(jax.random.split, num=2))

    def epoch_iter(self, key, batch_size: int, *, shuffle: bool = True,
                   rng: np.random.Generator | None = None,
                   ) -> Iterator[Tuple[object, object]]:
        """Yield device-resident (images, masks) batches covering the epoch.

        ceil(n / batch_size) batches — the same count as the host
        BatchLoader(drop_last=False) the LR schedule was sized from; the
        last batch is sentinel-padded to the compiled shape.
        """
        order = (rng or np.random.default_rng()).permutation(self.n) \
            if shuffle else np.arange(self.n)
        for i0 in range(0, self.n, batch_size):
            idx = order[i0:i0 + batch_size].astype(np.int32)
            if idx.shape[0] < batch_size:
                idx = np.concatenate(
                    [idx, np.full(batch_size - idx.shape[0], -1, np.int32)])
            key, k = self._split(key)
            yield self._batch_fn(self.imgs, self.masks, k, idx)
