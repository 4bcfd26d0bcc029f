"""Per-channel mean/std over a dataset's ROI (ref: compute_mean_std.py:6-29
— this is how the TP stats (0.709, 0.381, 0.224)/(0.127, 0.079, 0.043) were
produced).  ROI = pixels where the mask is nonzero when masks exist, else the
whole image."""

from __future__ import annotations

import argparse
import os

import numpy as np


def compute_mean_std(img_dir: str, mask_dir: str | None = None, names=None):
    from PIL import Image

    if names is None:
        names = sorted(os.path.splitext(f)[0] for f in os.listdir(img_dir)
                       if f.lower().endswith((".jpg", ".png", ".jpeg")))
    total = np.zeros(3)
    total_sq = np.zeros(3)
    count = 0
    for name in names:
        for ext in (".jpg", ".png", ".jpeg"):
            path = os.path.join(img_dir, name + ext)
            if os.path.exists(path):
                break
        else:
            continue
        img = np.asarray(Image.open(path).convert("RGB")).astype(np.float64) / 255.0
        if mask_dir:
            mpath = os.path.join(mask_dir, name + ".png")
            if os.path.exists(mpath):
                roi = np.asarray(Image.open(mpath).convert("L")) > 0
            else:
                roi = np.ones(img.shape[:2], bool)
        else:
            roi = np.ones(img.shape[:2], bool)
        pix = img[roi]
        total += pix.sum(0)
        total_sq += (pix**2).sum(0)
        count += pix.shape[0]
    mean = total / max(count, 1)
    std = np.sqrt(total_sq / max(count, 1) - mean**2)
    return mean, std


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--img-dir", default="dataset/TP-Dataset/JPEGImages")
    p.add_argument("--mask-dir", default=None)
    args = p.parse_args(argv)
    mean, std = compute_mean_std(args.img_dir, args.mask_dir)
    print(f"mean: {tuple(round(float(m), 3) for m in mean)}")
    print(f"std:  {tuple(round(float(s), 3) for s in std)}")


if __name__ == "__main__":
    main()
