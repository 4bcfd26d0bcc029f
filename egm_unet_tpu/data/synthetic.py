"""Synthetic tactile-paving-like data for smoke tests and benchmarks.

The real TP-Dataset is distributed out-of-band (ref: dataset/readme.txt is a
Baidu-pan pointer), so the framework ships a deterministic generator with the
same interface: RGB street-like noise with bright-yellow striped bands as
"tactile paving" foreground.
"""

from __future__ import annotations

import numpy as np


def synthetic_tp_sample(index: int, h: int = 565, w: int = 752):
    rng = np.random.default_rng(1000 + index)
    img = (rng.normal(0.45, 0.15, (h, w, 3)).clip(0, 1) * 255).astype(np.uint8)
    mask = np.zeros((h, w), np.uint8)
    # a slanted band of "paving" with stripes
    cx = rng.integers(w // 4, 3 * w // 4)
    width = rng.integers(w // 10, w // 5)
    slope = rng.uniform(-0.3, 0.3)
    ys = np.arange(h)[:, None]
    xs = np.arange(w)[None, :]
    center = cx + slope * ys
    band = np.abs(xs - center) < width / 2
    stripes = ((xs - center + 1000 * 8) % 8) < 5
    fg = band & stripes
    img[fg] = (np.array([220, 190, 60]) + rng.normal(0, 12, (int(fg.sum()), 3))).clip(
        0, 255).astype(np.uint8)
    mask[band] = 1
    return img, mask


class SyntheticTPDataset:
    """Duck-typed like DriveDataset.

    ``cache=True`` keeps the raw (pre-transform) uint8 samples in memory
    after first generation — for multi-epoch training runs the ~20 ms/image
    procedural generation would otherwise dominate the host-side loader
    (876 images ≈ 18 s/epoch); stochastic transforms still re-run per epoch.
    """

    def __init__(self, n: int = 32, transforms=None, h: int = 565, w: int = 752,
                 cache: bool = False):
        self.n, self.transforms, self.h, self.w = n, transforms, h, w
        self.names = [f"synth{i:04d}" for i in range(n)]
        self._cache = {} if cache else None

    def __len__(self):
        return self.n

    def __getitem__(self, idx: int):
        if self._cache is not None and idx in self._cache:
            img, mask = self._cache[idx]
        else:
            img, mask = synthetic_tp_sample(idx, self.h, self.w)
            if self._cache is not None:
                self._cache[idx] = (img, mask)
        if self.transforms is not None:
            return self.transforms(img, mask)
        return img, mask


def synthetic_tp_batch(batch: int, size: int = 480, seed: int = 0,
                       mean=None, std=None):
    """Directly produce a normalized, static-shape training batch."""
    from egm_unet_tpu.data.transforms import TP_MEAN, TP_STD, normalize

    mean = TP_MEAN if mean is None else mean
    std = TP_STD if std is None else std
    imgs = np.zeros((batch, size, size, 3), np.float32)
    tgts = np.zeros((batch, size, size), np.int32)
    for i in range(batch):
        img, mask = synthetic_tp_sample(seed * 1009 + i, size, size)
        imgs[i] = normalize(img, mean, std)
        tgts[i] = mask
    return imgs, tgts
