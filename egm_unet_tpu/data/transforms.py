"""Paired image/mask transforms (host-side numpy, PIL only for file IO
resampling parity).

Semantics mirror the reference's paired transforms (ref: transforms.py:10-104
and presets train.py:14-54):

- train: RandomResize(short side in [0.5, 1.2]*565) -> flips p=0.5 ->
  RandomCrop(480, image pad 0 / target pad 0) -> normalize.
- eval: Resize(short side 565) -> normalize.
- normalization stats: TP-Dataset mean (0.709, 0.381, 0.224) /
  std (0.127, 0.079, 0.043) (ref: train.py:83-84, produced by
  compute_mean_std.py).

TPU note: outputs have static shapes (train crops are always 480x480; eval
images are padded to shape buckets with image fill 0 / target fill 255 — the
255 ignore fill exactly reproduces the reference's ``cat_list`` batch padding
(ref: my_dataset.py:118-132) and is masked out of every loss/metric).
"""

from __future__ import annotations

import numpy as np

TP_MEAN = np.array([0.709, 0.381, 0.224], np.float32)
TP_STD = np.array([0.127, 0.079, 0.043], np.float32)
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)
# OpenAI CLIP stats (ref: clip/clip.py:35-42)
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def _pil_resize(arr: np.ndarray, size_hw, nearest: bool) -> np.ndarray:
    from PIL import Image

    img = Image.fromarray(arr)
    res = img.resize((size_hw[1], size_hw[0]),
                     Image.NEAREST if nearest else Image.BILINEAR)
    return np.asarray(res)


def resize_short_side(image: np.ndarray, target: np.ndarray | None, size: int):
    """torchvision F.resize(size): short side -> size, keep aspect."""
    h, w = image.shape[:2]
    if h < w:
        nh, nw = size, max(1, int(round(size * w / h)))
    else:
        nh, nw = max(1, int(round(size * h / w))), size
    image = _pil_resize(image, (nh, nw), nearest=False)
    if target is not None:
        target = _pil_resize(target, (nh, nw), nearest=True)
    return image, target


def hflip(image, target):
    return image[:, ::-1], target[:, ::-1]


def vflip(image, target):
    return image[::-1], target[::-1]


def pad_if_smaller(arr: np.ndarray, size: int, fill=0) -> np.ndarray:
    """Pad bottom/right to at least size (ref: transforms.py:10-17)."""
    h, w = arr.shape[:2]
    ph, pw = max(size - h, 0), max(size - w, 0)
    if ph == 0 and pw == 0:
        return arr
    pad = [(0, ph), (0, pw)] + [(0, 0)] * (arr.ndim - 2)
    return np.pad(arr, pad, constant_values=fill)


def random_crop(image, target, size: int, rng: np.random.Generator):
    image = pad_if_smaller(image, size, fill=0)
    target = pad_if_smaller(target, size, fill=0)
    h, w = image.shape[:2]
    top = int(rng.integers(0, h - size + 1))
    left = int(rng.integers(0, w - size + 1))
    return (image[top:top + size, left:left + size],
            target[top:top + size, left:left + size])


def center_crop(image, target, size: int):
    """Paired center crop, torchvision F.center_crop semantics: pad with 0 if
    smaller (symmetrically), then crop the centered size x size window
    (ref: transforms.py:80-87)."""
    def _one(arr):
        h, w = arr.shape[:2]
        ph, pw = max(size - h, 0), max(size - w, 0)
        if ph or pw:
            pad = [(ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2)]
            pad += [(0, 0)] * (arr.ndim - 2)
            arr = np.pad(arr, pad, constant_values=0)
            h, w = arr.shape[:2]
        # torchvision: crop_top = int(round((h - size) / 2.0)) (banker's)
        top, left = int(round((h - size) / 2.0)), int(round((w - size) / 2.0))
        return arr[top:top + size, left:left + size]

    return _one(image), _one(target)


def normalize(image_u8: np.ndarray, mean=TP_MEAN, std=TP_STD) -> np.ndarray:
    x = image_u8.astype(np.float32) / 255.0
    return (x - mean) / std


class TrainTransform:
    """ref presets: train.py:14-32."""

    def __init__(self, base_size=565, crop_size=480, hflip_prob=0.5,
                 vflip_prob=0.5, mean=TP_MEAN, std=TP_STD, seed=0,
                 wire_uint8=False):
        self.min_size = int(0.5 * base_size)
        self.max_size = int(1.2 * base_size)
        self.crop_size = crop_size
        self.hflip_prob = hflip_prob
        self.vflip_prob = vflip_prob
        self.mean, self.std = mean, std
        self.rng = np.random.default_rng(seed)
        # emit raw uint8 crops and let the train step normalize on device
        # (engine._device_normalize) — 1 byte/px over the tunnel instead of 4
        self.wire_uint8 = wire_uint8

    def __call__(self, image: np.ndarray, target: np.ndarray):
        size = int(self.rng.integers(self.min_size, self.max_size + 1))
        image, target = resize_short_side(image, target, size)
        if self.rng.random() < self.hflip_prob:
            image, target = hflip(image, target)
        if self.rng.random() < self.vflip_prob:
            image, target = vflip(image, target)
        image, target = random_crop(image, target, self.crop_size, self.rng)
        if self.wire_uint8:
            return image, target.astype(np.int32)
        return normalize(image, self.mean, self.std), target.astype(np.int32)


class EvalTransform:
    """ref presets: train.py:35-44 (Resize short side 565)."""

    def __init__(self, base_size=565, mean=TP_MEAN, std=TP_STD,
                 wire_uint8=False):
        self.base_size = base_size
        self.mean, self.std = mean, std
        self.wire_uint8 = wire_uint8  # see TrainTransform

    def __call__(self, image: np.ndarray, target: np.ndarray | None):
        image, target = resize_short_side(image, target, self.base_size)
        if not self.wire_uint8:
            image = normalize(image, self.mean, self.std)
        return image, None if target is None else target.astype(np.int32)
