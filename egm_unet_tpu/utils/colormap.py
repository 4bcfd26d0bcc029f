"""Color maps and palette-PNG mask rendering.

The reference ships a Pascal-VOC palette as palette.json (§2.20) and a
binary {0: 0, 1: 255} map in the fusion scripts (ref: eval_CLIPseg.py
color_map).  The VOC palette is procedural (bit-reversal code), so we
generate it instead of shipping the JSON.
"""

from __future__ import annotations

import numpy as np

BINARY_COLOR_MAP = {0: 0, 1: 255}  # background black, tactile paving white


def pascal_voc_palette(n: int = 256) -> np.ndarray:
    """[n, 3] uint8 Pascal-VOC label palette (standard bit-reversal)."""
    palette = np.zeros((n, 3), np.uint8)
    for label in range(n):
        lab = label
        for shift in range(8):
            palette[label, 0] |= ((lab >> 0) & 1) << (7 - shift)
            palette[label, 1] |= ((lab >> 1) & 1) << (7 - shift)
            palette[label, 2] |= ((lab >> 2) & 1) << (7 - shift)
            lab >>= 3
    return palette


def save_mask_png(mask: np.ndarray, path: str, binary: bool = True):
    """Save an int label mask; binary mode writes {0,255} grayscale
    (ref: predict.py:81-91), else a VOC-palettized PNG."""
    from PIL import Image

    if binary:
        out = np.zeros_like(mask, np.uint8)
        out[mask == 1] = 255
        Image.fromarray(out).convert("L").save(path)
    else:
        img = Image.fromarray(mask.astype(np.uint8), mode="P")
        img.putpalette(pascal_voc_palette().flatten().tolist())
        img.save(path)
