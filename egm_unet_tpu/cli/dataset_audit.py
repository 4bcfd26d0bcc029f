"""Dataset audit tool (ref: js.py:32-111): walk a folder of masks, histogram
grayscale pixel values per file, flag files containing 255, report unreadable
files."""

from __future__ import annotations

import argparse
import os
from collections import Counter

import numpy as np


def analyze_pixel_values(folder: str):
    files_with_255 = []
    unreadable = []
    global_hist: Counter = Counter()
    n_files = 0
    from PIL import Image

    for root, _, files in os.walk(folder):
        for fname in sorted(files):
            if not fname.lower().endswith((".png", ".jpg", ".jpeg", ".bmp")):
                continue
            path = os.path.join(root, fname)
            try:
                arr = np.asarray(Image.open(path).convert("L"))
            except Exception as e:  # noqa: BLE001 — mirror the ref's tolerance
                unreadable.append((path, str(e)))
                continue
            n_files += 1
            vals, counts = np.unique(arr, return_counts=True)
            for v, c in zip(vals.tolist(), counts.tolist()):
                global_hist[v] += c
            if 255 in vals:
                files_with_255.append(path)
    return {"n_files": n_files, "histogram": dict(sorted(global_hist.items())),
            "files_with_255": files_with_255, "unreadable": unreadable}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("folder")
    p.add_argument("--top", type=int, default=20)
    args = p.parse_args(argv)
    rep = analyze_pixel_values(args.folder)
    print(f"files analyzed: {rep['n_files']}")
    print(f"files containing 255: {len(rep['files_with_255'])}")
    for path in rep["files_with_255"][:10]:
        print(f"  {path}")
    print("pixel-value histogram (top values):")
    for v, c in list(rep["histogram"].items())[: args.top]:
        print(f"  {v}: {c}")
    if rep["unreadable"]:
        print(f"unreadable files: {len(rep['unreadable'])}")
        for path, err in rep["unreadable"]:
            print(f"  {path}: {err}")


if __name__ == "__main__":
    main()
